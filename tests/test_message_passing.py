"""Unit tests for the packed neighbor-sum ops against a naive dense
reference (gather + expand + VPU reduce) with default autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.ops.message_passing import (
    _expand_w9,
    packed_neighbor_sum,
    packed_neighbor_sum_sym,
    reverse_slots,
)
from torchmdnet_tpu.ops.neighbors import brute_neighbor_matrix


def _setup(seed=0, n=24, k=16, f=4, sym=False):
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 3.0)
    nbr = brute_neighbor_matrix(pos, k_max=k, cutoff_upper=4.0, loop=True)
    assert not bool(nbr.overflow)
    feats9 = jnp.asarray(rng.randn(n, 9 * f).astype(np.float32))
    if sym:
        # symmetric edge weights: a function of the pair distance
        d = jnp.linalg.norm(pos[:, None] - pos[nbr.idx], axis=-1)
        attr = jnp.sin(d[..., None] * jnp.arange(1, 3 * f + 1))
    else:
        attr = jnp.asarray(rng.randn(n, k, 3 * f).astype(np.float32))
    attr = attr * nbr.mask[..., None]
    return attr, feats9, nbr


def _naive(attr, feats9, idx, mask):
    w9 = _expand_w9(attr)
    xj = jnp.where(mask[..., None], feats9[idx], 0.0)
    return jnp.sum(w9 * xj, axis=1)


@pytest.mark.parametrize("op,sym", [(packed_neighbor_sum, False),
                                    (packed_neighbor_sum_sym, True)])
def test_pns_forward_and_grads(op, sym):
    attr, feats9, nbr = _setup(sym=sym)
    rs = nbr.rev_slot

    out = op(attr, feats9, nbr.idx, rs, nbr.mask)
    ref = _naive(attr, feats9, nbr.idx, nbr.mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(np.random.RandomState(1).randn(*out.shape)
                     .astype(np.float32))

    def loss_fast(a, x):
        return jnp.sum(op(a, x, nbr.idx, rs, nbr.mask) * ct)

    def loss_ref(a, x):
        return jnp.sum(_naive(a, x, nbr.idx, nbr.mask) * ct)

    ga, gx = jax.grad(loss_fast, argnums=(0, 1))(attr, feats9)
    ra, rx = jax.grad(loss_ref, argnums=(0, 1))(attr, feats9)
    # attr cotangent on padded slots: the naive path zeroes them through
    # the explicit mask; the packed op leaves them to the producer (attr
    # is contractually pre-masked), so compare on valid slots only.
    m3 = nbr.mask[..., None]
    np.testing.assert_allclose(np.asarray(ga * m3), np.asarray(ra * m3),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)

    # second order (force-training double backward)
    def meta(fn):
        def m(a, x):
            g = jax.grad(fn, argnums=1)(a, x)
            return jnp.sum(g ** 2)
        return m

    ma_f, mx_f = jax.grad(meta(loss_fast), argnums=(0, 1))(attr, feats9)
    ma_r, mx_r = jax.grad(meta(loss_ref), argnums=(0, 1))(attr, feats9)
    if sym:
        # The sym op's derivatives are exact only along edge-symmetric
        # attr directions (its contract: attr = f(distance)); arbitrary
        # per-slot perturbations are outside it.  Compare the symmetric
        # projection, which is all the model can ever produce.
        from torchmdnet_tpu.ops.message_passing import gather_rev

        def proj(g):
            return 0.5 * (g * m3 + gather_rev(g, nbr.idx, rs, nbr.mask))

        ma_f, ma_r = proj(ma_f), proj(ma_r)
    else:
        ma_f, ma_r = ma_f * m3, ma_r * m3
    np.testing.assert_allclose(np.asarray(ma_f), np.asarray(ma_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mx_f), np.asarray(mx_r),
                               rtol=1e-3, atol=1e-3)


def test_pns_chunked_matches_unchunked(monkeypatch):
    """Force the row-chunked path and compare against the naive result."""
    import torchmdnet_tpu.ops.message_passing as mp

    attr, feats9, nbr = _setup(n=30, k=16, f=4)
    monkeypatch.setattr(mp, "_VMEM_RESIDENT_BYTES", 0)
    monkeypatch.setattr(
        mp, "_row_chunks",
        lambda n, k, c9, budget_bytes=0, src_bytes=None: 7)
    out = mp.packed_neighbor_sum(attr, feats9, nbr.idx, nbr.rev_slot,
                                 nbr.mask)
    ref = _naive(attr, feats9, nbr.idx, nbr.mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g = jax.grad(lambda a, x: jnp.sum(
        mp.packed_neighbor_sum(a, x, nbr.idx, nbr.rev_slot, nbr.mask) ** 2
    ), argnums=1)(attr, feats9)
    gr = jax.grad(lambda a, x: jnp.sum(
        _naive(a, x, nbr.idx, nbr.mask) ** 2), argnums=1)(attr, feats9)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_pns_second_order_is_scatter_free():
    """Force training differentiates through the general op's backward;
    since round 2 that transpose decomposes onto gather-only primitives
    (``_pns_bwd_pair``) — no XLA scatter may appear at any order."""
    attr, feats9, nbr = _setup(sym=False)
    rs = nbr.rev_slot

    def force_like(a, x):
        g = jax.grad(
            lambda a_, x_: jnp.sum(
                packed_neighbor_sum(a_, x_, nbr.idx, rs, nbr.mask) ** 2
            ),
            argnums=1,
        )(a, x)
        return jnp.sum(g ** 2)

    for order, fn in (
        (1, jax.grad(force_like, argnums=(0, 1))),
        (0, force_like),
    ):
        jaxpr = jax.make_jaxpr(fn)(attr, feats9)
        text = str(jaxpr)
        assert "scatter" not in text, (
            f"scatter found in order-{order + 1} jaxpr"
        )
