"""bf16-storage / f32-accumulate gather tier (TMDNET_MP_STORAGE=bf16).

The tier rounds the *gathered operands* of the message-passing reductions
(node features, backward cotangents, the reverse-fetched edge weights) to
bf16 while every reduction accumulates in f32 — halving the HBM gather
traffic that dominates the 25k MD step (docs/PERF.md).  These tests pin
the contract: identical output dtypes, force error at the bf16 level (vs
the ~2e-2 of the full-bf16 ``precision: 16`` tier), and exact passthrough
for f64 (gradcheck) inputs.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.models.model import create_model


def _toggle(mode):
    os.environ["TMDNET_MP_STORAGE"] = mode
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _restore_storage():
    yield
    os.environ.pop("TMDNET_MP_STORAGE", None)
    jax.clear_caches()


def _forces(model_name, n=96, seed=0):
    rng = np.random.RandomState(seed)
    L = (n / 0.05) ** (1.0 / 3.0)
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    z = rng.choice([1, 6, 7, 8], n).astype(np.int32)
    box = np.diag([L, L, L]).astype(np.float32)
    args = dict(
        model=model_name, embedding_dimension=32, num_layers=2, num_rbf=16,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=32, max_num_neighbors=48,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
    )
    if model_name == "tensornet2":
        args.update(q_dim=8)
    pot = create_model(args)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    batch = jnp.zeros((n,), jnp.int32)
    q = jnp.zeros((1,), jnp.float32) if model_name == "tensornet2" else None
    variables = pot.init(jax.random.PRNGKey(0), zj, pj, batch, num_mols=1,
                         box=bj, q=q)
    y, f = pot.apply(variables, zj, pj, batch, num_mols=1, box=bj, q=q)
    return np.asarray(y), np.asarray(f)


@pytest.mark.parametrize("model_name", ["tensornet", "tensornet2"])
def test_bf16_storage_force_error_small(model_name):
    _toggle("f32")
    y0, f0 = _forces(model_name)
    _toggle("bf16")
    y1, f1 = _forces(model_name)
    assert f1.dtype == np.float32
    scale = np.abs(f0).max() + 1e-12
    rel = np.abs(f1 - f0).max() / scale
    # bf16 mantissa is 8 bits (~4e-3 relative per rounding); accumulation
    # stays f32 so the end-to-end force error should remain at that level,
    # an order of magnitude under the full-bf16 tier's ~2e-2.
    assert rel < 8e-3, rel
    # and the tier must actually change something (it rounds the inputs)
    assert rel > 0.0


def test_f64_passthrough():
    """f64 inputs (gradcheck paths) must be untouched by the tier."""
    from torchmdnet_tpu.ops.message_passing import _gather_cast

    _toggle("bf16")
    with jax.enable_x64(True):
        x64 = jnp.ones((4, 4), jnp.float64)
        assert x64.dtype == jnp.float64  # x64 mode actually on
        assert _gather_cast(x64).dtype == jnp.float64
    x32 = jnp.ones((4, 4), jnp.float32)
    assert _gather_cast(x32).dtype == jnp.bfloat16
    _toggle("f32")
    assert _gather_cast(x32).dtype == jnp.float32


def test_grad_consistency_bf16_tier():
    """Force-training double backward still runs (and stays finite) under
    the tier — the custom VJP chain casts at every gather site."""
    from torchmdnet_tpu.ops.neighbors import brute_neighbor_matrix
    from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum

    _toggle("bf16")
    rng = np.random.RandomState(1)
    n, k, f = 32, 8, 8
    pos = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 5)
    nbr = brute_neighbor_matrix(pos, k_max=k, cutoff_upper=3.0)
    attr = jnp.asarray(rng.randn(n, k, 3 * f).astype(np.float32))
    attr = attr * nbr.mask[..., None]
    feats = jnp.asarray(rng.randn(n, 9 * f).astype(np.float32))

    def inner(a, x):
        return jnp.sum(
            packed_neighbor_sum(a, x, nbr.idx, nbr.rev_slot, nbr.mask) ** 2
        )

    def outer(a, x):
        ga, gx = jax.grad(inner, argnums=(0, 1))(a, x)
        return jnp.sum(ga * ga) + jnp.sum(gx * gx)

    gga, ggx = jax.grad(outer, argnums=(0, 1))(attr, feats)
    assert np.isfinite(np.asarray(gga)).all()
    assert np.isfinite(np.asarray(ggx)).all()
    assert gga.dtype == jnp.float32
