"""Padding invariance — the static-shapes contract (analogue of reference
tests/test_staticshapes.py): energies and forces must be bit-comparable
across different atom paddings and neighbor capacities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _args(**kw):
    a = dict(
        model="tensornet", embedding_dimension=16, num_layers=2, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=16,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        attn_activation="silu", num_heads=4, distance_influence="both",
        neighbor_embedding=True, vector_cutoff=False, aggr="add",
    )
    a.update(kw)
    return a


@pytest.mark.parametrize("model", ["tensornet", "equivariant-transformer"])
def test_padding_invariance(model):
    rng = np.random.RandomState(4)
    n = 7
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)

    pot = create_model(_args(model=model))
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(n, jnp.int32), num_mols=1,
    )

    y_ref, f_ref = pot.apply(
        variables, jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(n, jnp.int32), num_mols=1,
    )

    for n_pad in (10, 16):
        zp = np.zeros(n_pad, np.int32)
        zp[:n] = z
        pp = np.zeros((n_pad, 3), np.float32)
        pp[:n] = pos
        bp = np.full(n_pad, 1, np.int32)
        bp[:n] = 0
        y, f = pot.apply(
            variables, jnp.asarray(zp), jnp.asarray(pp), jnp.asarray(bp),
            num_mols=1,
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f)[:n], np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)
        assert np.abs(np.asarray(f)[n:]).max() == 0.0


def test_neighbor_capacity_invariance():
    rng = np.random.RandomState(5)
    n = 8
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    outs = []
    variables = None
    for k in (8, 12, 16):
        pot = create_model(_args(max_num_neighbors=k))
        if variables is None:
            variables = pot.init(
                jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
                jnp.zeros(n, jnp.int32), num_mols=1,
            )
        y, f = pot.apply(
            variables, jnp.asarray(z), jnp.asarray(pos),
            jnp.zeros(n, jnp.int32), num_mols=1,
        )
        outs.append((np.asarray(y), np.asarray(f)))
    for y, f in outs[1:]:
        np.testing.assert_allclose(y, outs[0][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f, outs[0][1], rtol=1e-4, atol=1e-5)
