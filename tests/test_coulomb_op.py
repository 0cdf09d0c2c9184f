"""Fused Coulomb pair-energy op (ops/coulomb.py) vs a default-AD oracle.

The op's contract: symmetric edge set, G a function of d alone — then the
hand-derived gather-only VJP must match XLA's default (scatter) transpose
exactly, including under PBC, and remain differentiable at second order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.ops.coulomb import _g_kernel, coulomb_cutoff_energy
from torchmdnet_tpu.ops.neighbors import (
    _expand_box,
    brute_neighbor_matrix,
    wrap_deltas,
)

RC, EPS, FACTOR = 5.0, 78.3, 7.199822


def _naive(pos, a, b, idx, mask, box, batch):
    delta = pos[:, None, :] - pos[idx]
    if box is not None:
        bb = _expand_box(box, batch)
        delta = wrap_deltas(delta, bb[:, None, :, :])
    d2 = jnp.sum(delta * delta, axis=-1)
    valid = mask & (d2 > 0)
    d = jnp.sqrt(jnp.where(valid, d2, 1.0))
    g = jnp.where(valid, _g_kernel(d, RC, EPS, FACTOR), 0.0)
    pd = jnp.sum(a[:, None, :] * b[idx], axis=-1)
    return jnp.sum(g * pd, axis=1)


@pytest.mark.parametrize("periodic", [False, True])
def test_coulomb_energy_and_grads_match_oracle(periodic):
    rng = np.random.RandomState(0)
    n, c = 40, 6
    L = 12.0
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)
    box = jnp.asarray(np.diag([L, L, L]).astype(np.float32)) if periodic else None
    nbr = brute_neighbor_matrix(pos, batch, k_max=n, cutoff_upper=RC,
                                loop=False, box=box)
    assert not bool(nbr.overflow)
    a = jnp.asarray(rng.randn(n, c).astype(np.float32))
    b = jnp.asarray(rng.randn(n, c).astype(np.float32))
    ct = jnp.asarray(rng.randn(n).astype(np.float32))

    e_fast = coulomb_cutoff_energy(pos, a, b, nbr.idx, nbr.mask,
                                   RC, EPS, FACTOR, box, batch)
    e_ref = _naive(pos, a, b, nbr.idx, nbr.mask, box, batch)
    np.testing.assert_allclose(np.asarray(e_fast), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)

    def loss_fast(p, aa, bb):
        return jnp.sum(coulomb_cutoff_energy(
            p, aa, bb, nbr.idx, nbr.mask, RC, EPS, FACTOR, box, batch) * ct)

    def loss_ref(p, aa, bb):
        return jnp.sum(_naive(p, aa, bb, nbr.idx, nbr.mask, box, batch) * ct)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(pos, a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(pos, a, b)
    for f, r, name in zip(gf, gr, ("pos", "a", "b")):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

    # second order (force training through the Coulomb head)
    def meta(fn):
        def m(p, aa, bb):
            g = jax.grad(fn, argnums=0)(p, aa, bb)
            return jnp.sum(g ** 2)
        return m

    mf = jax.grad(meta(loss_fast), argnums=(0, 1, 2))(pos, a, b)
    mr = jax.grad(meta(loss_ref), argnums=(0, 1, 2))(pos, a, b)
    for f, r, name in zip(mf, mr, ("pos", "a", "b")):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_coulomb_first_order_is_scatter_free():
    rng = np.random.RandomState(1)
    n, c = 24, 4
    pos = jnp.asarray(rng.uniform(0, 10, (n, 3)).astype(np.float32))
    nbr = brute_neighbor_matrix(pos, k_max=n, cutoff_upper=RC, loop=False)
    a = jnp.asarray(rng.randn(n, c).astype(np.float32))
    b = jnp.asarray(rng.randn(n, c).astype(np.float32))

    def loss(p, aa, bb):
        return jnp.sum(coulomb_cutoff_energy(
            p, aa, bb, nbr.idx, nbr.mask, RC, EPS, FACTOR, None, None))

    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(pos, a, b))
    assert "scatter" not in jaxpr


@pytest.mark.parametrize("periodic", [False, True])
def test_weighted_coulomb_matches_general_op(periodic):
    """coulomb_cutoff_energy_w (a = w ⊙ b, the ScalarPlusWeightedCoulomb
    structure) vs the general op with a = w*b: values and (pos, w, b)
    gradients, incl. the collapsed pd2 = ct_j·pd pair-force identity."""
    from torchmdnet_tpu.ops.coulomb import coulomb_cutoff_energy_w

    rng = np.random.RandomState(3)
    n, c = 48, 6
    L = 12.0
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)
    box = (jnp.asarray(np.diag([L, L, L]).astype(np.float32))
           if periodic else None)
    nbr = brute_neighbor_matrix(pos, batch, k_max=n, cutoff_upper=RC,
                                loop=False, box=box)
    assert not bool(nbr.overflow)
    w = jnp.asarray(rng.rand(c).astype(np.float32) + 0.2)
    b = jnp.asarray(rng.randn(n, c).astype(np.float32))
    ct = jnp.asarray(rng.randn(n).astype(np.float32))

    e_w = coulomb_cutoff_energy_w(pos, w, b, nbr.idx, nbr.mask,
                                  RC, EPS, FACTOR, box, batch)
    e_g = coulomb_cutoff_energy(pos, w[None, :] * b, b, nbr.idx, nbr.mask,
                                RC, EPS, FACTOR, box, batch)
    np.testing.assert_allclose(np.asarray(e_w), np.asarray(e_g),
                               rtol=1e-5, atol=1e-5)

    def loss_w(p, ww, bb):
        return jnp.sum(coulomb_cutoff_energy_w(
            p, ww, bb, nbr.idx, nbr.mask, RC, EPS, FACTOR, box, batch) * ct)

    def loss_g(p, ww, bb):
        return jnp.sum(coulomb_cutoff_energy(
            p, ww[None, :] * bb, bb, nbr.idx, nbr.mask, RC, EPS, FACTOR,
            box, batch) * ct)

    gw = jax.grad(loss_w, argnums=(0, 1, 2))(pos, w, b)
    gg = jax.grad(loss_g, argnums=(0, 1, 2))(pos, w, b)
    for f, r, name in zip(gw, gg, ("pos", "w", "b")):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
