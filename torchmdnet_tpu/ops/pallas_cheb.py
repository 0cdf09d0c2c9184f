"""Pallas TPU evaluation of Chebyshev-tabulated edge filters.

``cheb_filter(coeffs, d, fmask, lo, hi)`` evaluates a tabulated smooth
filter family ``G(d) = Σ_j coeffs[j]·T_j(x(d))`` on every edge slot and
multiplies by a zero-derivative float mask (pad/validity ∧ d<hi window):
the per-edge replacement for TensorNet's three-layer edge MLP
(see ops/cheb.py for the fit; reference ``tensornet.py:739-743``).

Design notes (all measured, docs/PERF.md):

* The naive jnp recurrence builds the [*, T] basis as a T-way stack —
  a strided concatenate or a spilling 128-FMA chain, which ate the entire
  FLOP saving.  Here the basis is the closed form ``cos(j·θ)``,
  ``θ = arccos(x)``: one vectorized transcendental + one MXU matmul.
* Mosaic has no ``acos`` lowering, so θ is computed by XLA *outside* the
  kernel and passed in.  Autodiff never sees the arccos: the op carries an
  analytic custom VJP — the x-derivative of a Chebyshev series is another
  Chebyshev series (``cheb_deriv_coeffs``), so the backward is a recursive
  ``cheb_filter`` call (differentiable to any order) plus a basis-projection
  kernel for the coefficient gradient.
* θ-form and recurrence-form basis agree to f32 rounding; the jnp fallback
  (CPU tests / non-f32) uses the recurrence.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 16


def _prec():
    from torchmdnet_tpu.ops.config import get_matmul_precision

    return get_matmul_precision()


def _kernel_prec():
    p = _prec()
    if p == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return p


def cheb_deriv_coeffs(coeffs: jnp.ndarray) -> jnp.ndarray:
    """[T, C] series → [T, C] series of d/dx (degree drops by one).

    Standard recurrence c'_j = c'_{j+2} + 2(j+1)·c_{j+1} (c'_0 halved),
    unrolled in python (T is static and small).  Linear in ``coeffs`` —
    differentiable for training.
    """
    T = coeffs.shape[0]
    zero = jnp.zeros_like(coeffs[0])
    dc = [zero for _ in range(T)]
    if T >= 2:
        dc[T - 2] = 2.0 * (T - 1) * coeffs[T - 1]
    for j in range(T - 3, -1, -1):
        dc[j] = dc[j + 2] + 2.0 * (j + 1) * coeffs[j + 1]
    dc[0] = dc[0] * 0.5
    return jnp.stack(dc, axis=0)


def _theta(d, lo, hi):
    x = jnp.clip(2.0 * (d.astype(jnp.float32) - lo) / (hi - lo) - 1.0,
                 -1.0, 1.0)
    return jnp.arccos(x)


def _basis(th_ref, k, T):
    # θ enters as a dense [TILE_N, K] block — an [E, 1] input array would
    # be lane-padded 1 → 128 by the (8,128) tiling (a 128× HBM blow-up,
    # 1.5 GB per call at the 25k MD config).  The [TILE_N, K, T] broadcast
    # happens in-kernel (vector layout, no padding) and the leading-axis
    # collapse to [E, T] is a legal sublane-side reshape.
    th3 = th_ref[:][..., None]  # [tn, k, 1]
    j = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, k, T), 2
    ).astype(jnp.float32)
    return jnp.cos(th3 * j).reshape(TILE_N * k, T)


def _filter_kernel(th_ref, fm_ref, coeffs_ref, out_ref, *, k, T, f3):
    basis = _basis(th_ref, k, T)
    attr = jax.lax.dot_general(
        basis, coeffs_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_prec(),
    )
    out_ref[:] = attr.reshape(TILE_N, k, f3) * fm_ref[:][..., None]


def _filter_dot_kernel(th_ref, fm_ref, coeffs_ref, ct_ref, out_ref, *,
                       k, T, f3):
    basis = _basis(th_ref, k, T)
    g = jax.lax.dot_general(
        basis, coeffs_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_prec(),
    ).reshape(TILE_N, k, f3)
    out_ref[:] = jnp.sum(g * ct_ref[:], axis=-1) * fm_ref[:]


def _project_kernel(th_ref, ctw_ref, out_ref, *, k, T, f3):
    e = TILE_N * k
    basis = _basis(th_ref, k, T)
    acc = jax.lax.dot_general(
        basis, ctw_ref[:].reshape(e, f3), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_prec(),
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _use_pallas(d):
    return (
        jax.default_backend() == "tpu"
        and d.ndim == 2
        and d.shape[0] % TILE_N == 0
    )


def _cparams(k, f3):
    """Mosaic's default scoped-VMEM stack is 16 MB; the [TILE_N, K, 3F]
    intermediates (attr/basis/cos temporaries) pass it once K exceeds the
    design K≈128 (grouped neighbor layouts run K' ≈ 3K) — raise the limit
    (v5e has 128 MB VMEM/core)."""
    if TILE_N * k * (f3 + 128) * 4 * 3 <= 15 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _filter_impl(coeffs, d, fmask, lo, hi, interpret):
    n, k = d.shape
    T, f3 = coeffs.shape
    th = _theta(d, lo, hi)  # [N, K]
    fm = fmask.astype(jnp.float32)
    if _use_pallas(d) or interpret:
        kernel = functools.partial(_filter_kernel, k=k, T=T, f3=f3)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n // TILE_N,),
            in_specs=[
                pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                vmem,
            ],
            out_specs=pl.BlockSpec((TILE_N, k, f3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k, f3), jnp.float32),
            compiler_params=_cparams(k, f3),
            interpret=interpret,
        )(th, fm, coeffs.astype(jnp.float32))
    # jnp fallback: same θ-form math (CPU tests, odd shapes)
    j = jnp.arange(T, dtype=jnp.float32)
    basis = jnp.cos(th[..., None] * j)  # [N, K, T]
    attr = jnp.einsum("nkt,tc->nkc", basis, coeffs.astype(jnp.float32),
                      precision=_prec())
    return attr * fm[..., None]


def _project_impl(d, ctw, T, lo, hi, interpret):
    n, k, f3 = ctw.shape
    th = _theta(d, lo, hi)
    if _use_pallas(d) or interpret:
        kernel = functools.partial(_project_kernel, k=k, T=T, f3=f3)
        return pl.pallas_call(
            kernel,
            grid=(n // TILE_N,),
            in_specs=[
                pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, k, f3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, f3), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, f3), jnp.float32),
            compiler_params=_cparams(k, f3),
            interpret=interpret,
        )(th, ctw.astype(jnp.float32))
    j = jnp.arange(T, dtype=jnp.float32)
    basis = jnp.cos(th[..., None] * j)
    return jnp.einsum("nkt,nkc->tc", basis, ctw.astype(jnp.float32),
                      precision=_prec())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def cheb_filter(coeffs, d, fmask, lo: float, hi: float,
                interpret: bool = False):
    """``fmask · Σ_j coeffs[j]·T_j(x(d))`` → [N, K, C] (f32).

    ``fmask`` [N, K] float: pad/validity mask × (d < hi) window — must be
    zero wherever the filter should not contribute (its derivative is
    treated as zero).  ``coeffs`` [T, C] from ``ops.cheb.cheb_fit_matrix``.
    """
    return _filter_impl(coeffs, d, fmask, lo, hi, interpret)


def _cf_fwd(coeffs, d, fmask, lo, hi, interpret):
    return cheb_filter(coeffs, d, fmask, lo, hi, interpret), (
        coeffs, d, fmask
    )


def _cf_bwd(lo, hi, interpret, res, ct):
    coeffs, d, fmask = res
    # ∂d: G'(d) = (2/(hi-lo))·Σ_j (D coeffs)[j]·T_j(x) — evaluated by the
    # fused filter-dot kernel (materializing G' as [N,K,3F] and reducing
    # costs ~37 ms/step at the 25k MD config; the fused kernel writes only
    # [N,K]).  Differentiable: cheb_filter_dot carries its own VJP.
    dser = cheb_deriv_coeffs(coeffs)
    dd = cheb_filter_dot(dser, d, fmask, ct, lo, hi, interpret)
    dd = (dd * (2.0 / (hi - lo))).astype(d.dtype)
    # ∂coeffs: basisᵀ · (ct·fmask), projected over all edges.
    dcoeffs = cheb_project(d, ct * fmask[..., None], coeffs.shape[0],
                           lo, hi, interpret).astype(coeffs.dtype)
    return dcoeffs, dd, None


cheb_filter.defvjp(_cf_fwd, _cf_bwd)


def _filter_dot_impl(coeffs, d, fmask, ct, lo, hi, interpret):
    n, k = d.shape
    T, f3 = coeffs.shape
    th = _theta(d, lo, hi)
    fm = fmask.astype(jnp.float32)
    if _use_pallas(d) or interpret:
        kernel = functools.partial(_filter_dot_kernel, k=k, T=T, f3=f3)
        return pl.pallas_call(
            kernel,
            grid=(n // TILE_N,),
            in_specs=[
                pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, k, f3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
            compiler_params=_cparams(k, f3),
            interpret=interpret,
        )(th, fm, coeffs.astype(jnp.float32), ct.astype(jnp.float32))
    j = jnp.arange(T, dtype=jnp.float32)
    basis = jnp.cos(th[..., None] * j)
    g = jnp.einsum("nkt,tc->nkc", basis, coeffs.astype(jnp.float32),
                   precision=_prec())
    return jnp.sum(g * ct.astype(jnp.float32), axis=-1) * fm


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def cheb_filter_dot(coeffs, d, fmask, ct, lo: float, hi: float,
                    interpret: bool = False):
    """``out[n,k] = fmask·Σ_c (Σ_j coeffs[j]·T_j(x(d)))[c] · ct[n,k,c]`` —
    the filter evaluation contracted with a cotangent, fused so the
    [N,K,C] filter value never hits HBM (the d-gradient hot path)."""
    return _filter_dot_impl(coeffs, d, fmask, ct, lo, hi, interpret)


def _cfd_fwd(coeffs, d, fmask, ct, lo, hi, interpret):
    return cheb_filter_dot(coeffs, d, fmask, ct, lo, hi, interpret), (
        coeffs, d, fmask, ct
    )


def _cfd_bwd(lo, hi, interpret, res, cot):
    coeffs, d, fmask, ct = res
    # linear in ct: ∂ct = cot ⊗ G(d)·fmask
    dct = cot[..., None] * cheb_filter(coeffs, d, fmask, lo, hi, interpret)
    dct = dct.astype(ct.dtype)
    # ∂d: contraction with the next-derivative series — recursive.
    dser = cheb_deriv_coeffs(coeffs)
    dd = cheb_filter_dot(dser, d, fmask, cot[..., None] * ct, lo, hi,
                         interpret)
    dd = (dd * (2.0 / (hi - lo))).astype(d.dtype)
    dcoeffs = cheb_project(
        d, (cot * fmask)[..., None] * ct, coeffs.shape[0], lo, hi, interpret
    ).astype(coeffs.dtype)
    return dcoeffs, dd, None, dct


cheb_filter_dot.defvjp(_cfd_fwd, _cfd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def cheb_project(d, ctw, T: int, lo: float, hi: float,
                 interpret: bool = False):
    """Adjoint of :func:`cheb_filter` w.r.t. the coefficients:
    ``out[j, c] = Σ_{n,k} T_j(x(d[n,k])) · ctw[n,k,c]`` → [T, C]."""
    return _project_impl(d, ctw, T, lo, hi, interpret)


def _cp_fwd(d, ctw, T, lo, hi, interpret):
    return cheb_project(d, ctw, T, lo, hi, interpret), d


def _cp_bwd(T, lo, hi, interpret, d, ct):
    # linear in ctw; its cotangent is the filter evaluation with ct as the
    # coefficient table.  d is treated as non-differentiable here (the
    # projection appears only in parameter-gradient branches).
    ones = jnp.ones(d.shape, jnp.float32)
    dctw = cheb_filter(ct, d, ones, lo, hi, interpret)
    return None, dctw


cheb_project.defvjp(_cp_fwd, _cp_bwd)
