"""bf16 compute mode (precision=16): runs, finite, close to f32."""

import numpy as np

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def test_bf16_close_to_f32():
    def args(prec):
        return dict(
            model="tensornet", embedding_dimension=32, num_layers=2,
            num_rbf=8, rbf_type="expnorm", trainable_rbf=False,
            activation="silu", cutoff_lower=0.0, cutoff_upper=5.0,
            max_z=20, max_num_neighbors=16, derivative=True,
            prior_model=None, output_model="Scalar", reduce_op="sum",
            precision=prec, equivariance_invariance_group="O(3)",
            atom_filter=-1,
        )

    rng = np.random.RandomState(0)
    n = 10
    z = jnp.asarray(rng.randint(1, 9, n).astype(np.int32))
    pos = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    batch = jnp.zeros(n, jnp.int32)

    pot32 = create_model(args(32))
    variables = pot32.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1)
    y32, f32_ = pot32.apply(variables, z, pos, batch, num_mols=1)

    pot16 = create_model(args(16))
    y16, f16_ = pot16.apply(variables, z, pos, batch, num_mols=1)

    assert np.isfinite(np.asarray(y16)).all()
    assert np.asarray(y16).dtype == np.float32  # head stays f32
    # bf16 interior: loose agreement with f32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), rtol=0.05,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(f16_), np.asarray(f32_), rtol=0.3,
                               atol=0.05)
