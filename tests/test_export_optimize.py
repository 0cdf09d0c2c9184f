"""jax.export round-trip + optimize() parity (reference test_export.py /
test_optimize.py analogues)."""

import numpy as np

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.optimize import optimize
from torchmdnet_tpu.utils.export import export_potential, load_exported

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _potential():
    return create_model(dict(
        model="tensornet", embedding_dimension=16, num_layers=1, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=8,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
    ))


def test_export_roundtrip(tmp_path):
    pot = _potential()
    rng = np.random.RandomState(0)
    n = 6
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1,
    )
    y0, f0 = pot.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                       jnp.asarray(batch), num_mols=1)

    path = str(tmp_path / "model.stablehlo")
    export_potential(pot, variables, z, batch, num_mols=1, path=path)
    fn = load_exported(path)
    y1, f1 = fn(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-4, atol=1e-5)

    step = optimize(pot, variables, z, batch, num_mols=1)
    y2, f2 = step(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0), rtol=1e-5, atol=1e-6)
