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


def test_optimize_cached_lists_match_direct():
    """optimize(rebuild_every>1): skin-cached lists give exact results
    while atoms move less than skin/2 between rebuilds."""
    import numpy as np

    from torchmdnet_tpu.optimize import optimize

    rng = np.random.RandomState(5)
    n = 10
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    # K must cover all n atoms + self even at cutoff+skin, or the cached
    # list drops real edges
    pot = create_model(dict(
        model="tensornet", embedding_dimension=16, num_layers=1, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20,
        max_num_neighbors=n + 1,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
    ))
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1,
    )
    step = optimize(pot, variables, z, batch, num_mols=1,
                    rebuild_every=4, skin=1.0)
    for i in range(6):
        p = pos + rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32)
        y_fast, f_fast = step(jnp.asarray(p))
        y_ref, f_ref = pot.apply(
            variables, jnp.asarray(z), jnp.asarray(p), jnp.asarray(batch),
            num_mols=1,
        )
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)
    assert not step.overflow()
