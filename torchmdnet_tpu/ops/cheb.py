"""Chebyshev tabulation of smooth 1-D edge-filter families.

TensorNet's per-edge weights are a fixed family of smooth scalar→vector
functions ``w(d) = C(d) · MLP(rbf(d)) ∈ R^{3F}`` of the edge distance alone
(reference ``tensornet.py:739-743``).  Evaluating the 3-layer silu MLP on
every (atom, slot) edge is the FLOP-heaviest part of an interaction layer;
on TPU the idiomatic alternative is classical force-field tabulation done
spectrally: sample the filter at ``T`` Chebyshev nodes once per step (T
rows — negligible), fit Chebyshev coefficients with one tiny matmul, and
evaluate per edge as ``φ_T(d) @ M`` — a pure FMA recurrence plus a single
``[T, 3F]`` matmul.  For the smooth silu/rbf chains used here, T=128 is
accurate to ~3e-6 relative (T=96 → ~2e-4; see docs/PERF.md).

Everything is plain jnp and therefore differentiable to any order — both
w.r.t. ``d`` (forces: the basis recurrence is polynomial, no arccos
singularities at d=0 or d=cutoff) and w.r.t. the MLP parameters (training:
gradients flow through the node samples).
"""

import math

import jax.numpy as jnp


def cheb_nodes(T: int, lo: float, hi: float, dtype=jnp.float32):
    """Chebyshev (first-kind) nodes mapped to [lo, hi], node order k=0..T-1."""
    k = jnp.arange(T, dtype=dtype)
    x = jnp.cos(math.pi * (k + 0.5) / T)
    return (x + 1.0) * 0.5 * (hi - lo) + lo


def cheb_fit_matrix(T: int, dtype=jnp.float32):
    """P [T, T] with ``coeffs = P @ f(cheb_nodes)`` (discrete cosine fit)."""
    k = jnp.arange(T, dtype=dtype)
    j = jnp.arange(T, dtype=dtype)[:, None]
    P = (2.0 / T) * jnp.cos(math.pi * j * (k + 0.5) / T)
    return P.at[0].mul(0.5)


def cheb_basis(d: jnp.ndarray, T: int, lo: float, hi: float) -> jnp.ndarray:
    """[T, ...] Chebyshev basis at ``d`` (clamped to [lo, hi]) via the
    T_{j+1} = 2x·T_j − T_{j-1} recurrence — FMA-only, so autodiff through it
    is polynomial everywhere (no arccos NaNs at the interval ends).

    Always computed in f32: the degree-T recurrence loses ~T·ε, which is
    catastrophic in bf16.
    """
    x = jnp.clip(2.0 * (d.astype(jnp.float32) - lo) / (hi - lo) - 1.0,
                 -1.0, 1.0)
    if T == 1:
        return jnp.ones((1,) + x.shape, x.dtype)
    polys = [jnp.ones_like(x), x]
    for _ in range(T - 2):
        polys.append(2.0 * x * polys[-1] - polys[-2])
    # Stack on the LEADING axis: stacking T slices on the minor (lane) axis
    # lowers to a strided concatenate (~20 ms at dhfr scale); leading-axis
    # stack is contiguous block writes, and dot_general contracts over the
    # major dim natively.
    return jnp.stack(polys, axis=0)


def cheb_eval(coeffs: jnp.ndarray, d: jnp.ndarray, lo: float, hi: float,
              zero_above_hi: bool = True, precision=None) -> jnp.ndarray:
    """Evaluate the fitted family at ``d``: [...,] → [..., C] (f32).

    ``zero_above_hi`` hard-zeroes d ≥ hi (matching the strict cosine-cutoff
    window) so skin-cached MD edges beyond the true cutoff contribute
    exactly zero rather than the clamped boundary value.
    """
    T = coeffs.shape[0]
    basis = cheb_basis(d, T, lo, hi)  # [T, ...]
    out = jnp.einsum("t...,tc->...c", basis, coeffs.astype(basis.dtype),
                     precision=precision)
    if zero_above_hi:
        out = jnp.where((d < hi)[..., None], out, 0.0)
    return out
