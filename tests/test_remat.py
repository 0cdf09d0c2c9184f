"""remat=True (selective rematerialization with the saved neighbor-sum
policy) must be a pure memory/speed trade: identical energies, forces and
parameter gradients to remat=False."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.models.model import create_model

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _args(remat):
    return dict(
        model="tensornet", embedding_dimension=32, num_layers=2, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=16,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1, remat=remat,
    )


@pytest.mark.parametrize("group", ["O(3)", "SO(3)"])
def test_remat_identical(group):
    rng = np.random.RandomState(0)
    n = 12
    z = jnp.asarray(rng.randint(1, 9, n), jnp.int32)
    pos = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2)
    batch = jnp.asarray(np.zeros(n, np.int32))

    outs = []
    grads = []
    for remat in (False, True):
        a = _args(remat)
        a["equivariance_invariance_group"] = group
        pot = create_model(a)
        variables = pot.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1)

        y, f = jax.jit(lambda v, p: pot.apply(v, z, p, batch, num_mols=1))(
            variables, pos
        )
        outs.append((np.asarray(y), np.asarray(f)))

        # parameter gradient of a force-dependent loss (double backward
        # crosses the remat boundary twice)
        def loss(v, p):
            yy, ff = pot.apply(v, z, p, batch, num_mols=1)
            return jnp.sum(yy ** 2) + jnp.sum(ff ** 2)

        g = jax.jit(jax.grad(loss))(variables, pos)
        grads.append(jax.tree.map(np.asarray, g))

    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=0, atol=1e-6)
    flat0 = jax.tree.leaves(grads[0])
    flat1 = jax.tree.leaves(grads[1])
    for a0, a1 in zip(flat0, flat1):
        np.testing.assert_allclose(a0, a1, rtol=1e-5, atol=1e-5)
