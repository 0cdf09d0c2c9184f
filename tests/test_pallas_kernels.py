"""Pallas fused edge MLP vs the jnp reference chain (interpret mode on CPU)
and full-model equivalence with the flag on."""

import numpy as np

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.ops.pallas_kernels import edge_mlp_jnp, fused_edge_mlp


def test_kernel_matches_jnp():
    rng = np.random.RandomState(0)
    n, k, r, f = 16, 8, 8, 16
    x = jnp.asarray(rng.randn(n, k, r).astype(np.float32))
    cw = jnp.asarray(rng.rand(n, k).astype(np.float32))
    w1 = jnp.asarray(rng.randn(r, f).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(2 * f, 3 * f).astype(np.float32) * 0.3)
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    ref = edge_mlp_jnp(x, cw, w1, b1, w2, b2, w3, b3)
    out = fused_edge_mlp(x, cw, w1, b1, w2, b2, w3, b3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)

    # gradients flow through the recompute-vjp
    def loss(x_, w1_):
        return jnp.sum(fused_edge_mlp(x_, cw, w1_, b1, w2, b2, w3, b3, True))

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w1)

    def loss_ref(x_, w1_):
        return jnp.sum(edge_mlp_jnp(x_, cw, w1_, b1, w2, b2, w3, b3))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w1)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-5,
                               atol=1e-6)


def test_pre_kernel_matches_jnp():
    """fused_edge_mlp_pre (TensorNet2 2-layer variant) vs its jnp chain."""
    from torchmdnet_tpu.ops.pallas_kernels import (
        edge_mlp_pre_jnp, fused_edge_mlp_pre,
    )

    rng = np.random.RandomState(2)
    n, k, f = 16, 8, 16
    pre1 = jnp.asarray(rng.randn(n, k, f).astype(np.float32))
    cw = jnp.asarray(rng.rand(n, k).astype(np.float32))
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(2 * f, 3 * f).astype(np.float32) * 0.3)
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    ref = edge_mlp_pre_jnp(pre1, cw, w2, b2, w3, b3)
    out = fused_edge_mlp_pre(pre1, cw, w2, b2, w3, b3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)

    def loss(p_, w2_):
        return jnp.sum(fused_edge_mlp_pre(p_, cw, w2_, b2, w3, b3, True))

    def loss_ref(p_, w2_):
        return jnp.sum(edge_mlp_pre_jnp(p_, cw, w2_, b2, w3, b3))

    gp, gw = jax.grad(loss, argnums=(0, 1))(pre1, w2)
    gp_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(pre1, w2)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-5,
                               atol=1e-6)


def test_pick_tile_respects_vmem_budget():
    from torchmdnet_tpu.ops.pallas_kernels import _pick_tile

    assert _pick_tile(25088, 96, 384) == 16   # the proven 25k config
    assert _pick_tile(25088, 128, 384) == 8   # K=128 overflowed tile 16
    assert _pick_tile(25088, 384, 384) == 4   # floor
    # non-dividing n falls back until a divisor (or the jnp path)
    assert 25088 % _pick_tile(25088, 96, 384) == 0


def test_model_with_pallas_flag_matches():
    def args(flag):
        return dict(
            model="tensornet", embedding_dimension=16, num_layers=2,
            num_rbf=8, rbf_type="expnorm", trainable_rbf=False,
            activation="silu", cutoff_lower=0.0, cutoff_upper=5.0,
            max_z=20, max_num_neighbors=8, derivative=True,
            prior_model=None, output_model="Scalar", reduce_op="sum",
            precision=32, equivariance_invariance_group="O(3)",
            atom_filter=-1, pallas_edge_mlp=flag,
        )

    rng = np.random.RandomState(1)
    n = 16  # divisible by the kernel row tile → real kernel path
    z = jnp.asarray(rng.randint(1, 9, n).astype(np.int32))
    pos = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    batch = jnp.zeros(n, jnp.int32)

    pot0 = create_model(args(False))
    variables = pot0.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1)
    y0, f0 = pot0.apply(variables, z, pos, batch, num_mols=1)

    pot1 = create_model(args(True))
    # identical param tree (LinearParams mirrors Linear naming)
    y1, f1 = pot1.apply(variables, z, pos, batch, num_mols=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-4,
                               atol=1e-5)
