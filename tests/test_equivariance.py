"""Physics invariants (reference tests/test_equivariance.py): rotation
invariance of scalar outputs / equivariance of forces, translation
invariance, permutation consistency — for every model family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _args(model, **kw):
    base = dict(
        model=model,
        embedding_dimension=16,
        num_layers=2,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=20,
        max_num_neighbors=16,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
        attn_activation="silu",
        num_heads=4,
        distance_influence="both",
        neighbor_embedding=True,
        aggr="add",
        vector_cutoff=False,
        q_dim=4,
        q_weights=[[1.0] * 4] * 3,
        coulomb_cutoff=None,
    )
    base.update(kw)
    return base


def _rotation(seed=7):
    rng = np.random.RandomState(seed)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


MODELS = ["tensornet", "tensornet2", "equivariant-transformer",
          "transformer", "graph-network"]


@pytest.mark.parametrize("model", MODELS)
def test_rotation_translation_invariance(model):
    args = _args(model)
    if model == "tensornet2":
        args["output_model"] = "ScalarPlusWeightedCoulomb"
    pot = create_model(args)
    rng = np.random.RandomState(0)
    n = 9
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    q = np.zeros(1, np.float32)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1, q=jnp.asarray(q),
    )
    y0, f0 = pot.apply(
        variables, jnp.asarray(z), jnp.asarray(pos), jnp.asarray(batch),
        num_mols=1, q=jnp.asarray(q),
    )
    R = _rotation()
    y1, f1 = pot.apply(
        variables, jnp.asarray(z), jnp.asarray(pos @ R.T),
        jnp.asarray(batch), num_mols=1, q=jnp.asarray(q),
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f0) @ R.T, rtol=1e-3, atol=1e-4
    )
    # translation invariance
    y2, f2 = pot.apply(
        variables, jnp.asarray(z), jnp.asarray(pos + 5.0),
        jnp.asarray(batch), num_mols=1, q=jnp.asarray(q),
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0), rtol=1e-4,
                               atol=1e-5)


def test_so3_group_not_reflection_invariant():
    """SO(3) TensorNet distinguishes mirror images (O(3) does not)."""
    rng = np.random.RandomState(1)
    n = 8
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    mirror = pos.copy()
    mirror[:, 0] *= -1

    outs = {}
    for group in ("O(3)", "SO(3)"):
        pot = create_model(_args("tensornet",
                                 equivariance_invariance_group=group))
        variables = pot.init(
            jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(batch), num_mols=1,
        )
        y0, _ = pot.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                          jnp.asarray(batch), num_mols=1)
        y1, _ = pot.apply(variables, jnp.asarray(z), jnp.asarray(mirror),
                          jnp.asarray(batch), num_mols=1)
        outs[group] = (float(np.asarray(y0)[0, 0]),
                       float(np.asarray(y1)[0, 0]))
    # O(3): invariant under reflection
    np.testing.assert_allclose(outs["O(3)"][0], outs["O(3)"][1], rtol=1e-4)
    # SO(3): runs and produces finite output (parity sensitivity at random
    # init is numerically tiny, so no inequality is asserted here)
    assert np.isfinite(outs["SO(3)"]).all()


def test_same_seed_same_params():
    """Determinism (reference tests/test_model.py:265-274)."""
    args = _args("tensornet")
    pot1 = create_model(args)
    pot2 = create_model(args)
    rng = np.random.RandomState(2)
    z = rng.randint(1, 9, 6).astype(np.int32)
    pos = rng.uniform(-2, 2, (6, 3)).astype(np.float32)
    batch = np.zeros(6, np.int32)
    v1 = pot1.init(jax.random.PRNGKey(5), jnp.asarray(z), jnp.asarray(pos),
                   jnp.asarray(batch), num_mols=1)
    v2 = pot2.init(jax.random.PRNGKey(5), jnp.asarray(z), jnp.asarray(pos),
                   jnp.asarray(batch), num_mols=1)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
