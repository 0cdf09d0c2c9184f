"""Golden parity for the ET / GN / T model families vs the reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_oracle

reference_oracle.install()
from reference_oracle import make_reference_args  # noqa: E402

from torchmdnet.models.model import create_model as ref_create_model  # noqa: E402

from torchmdnet_tpu.models.model import create_model  # noqa: E402
from torchmdnet_tpu.utils.torch_ckpt import (  # noqa: E402
    apply_reference_compat,
    convert_state_dict,
)

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _batch(rng):
    n1, n2 = 9, 6
    z = np.concatenate([rng.randint(1, 10, n1), rng.randint(1, 10, n2)])
    pos = np.concatenate(
        [rng.uniform(-3, 3, (n1, 3)), rng.uniform(-3, 3, (n2, 3)) + 25.0]
    ).astype(np.float32)
    batch = np.array([0] * n1 + [1] * n2)
    return z, pos, batch


def _run_both(args, seed=0, atol_f=1e-4):
    rng = np.random.RandomState(seed)
    torch.manual_seed(seed)
    ref = ref_create_model(dict(args))
    ref.eval()
    z, pos, batch = _batch(rng)

    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, f_ref = ref(
        torch.tensor(z, dtype=torch.long), pos_t,
        torch.tensor(batch, dtype=torch.long),
    )
    y_ref, f_ref = y_ref.detach().numpy(), f_ref.detach().numpy()

    pot = create_model(dict(args))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd = apply_reference_compat(sd, args, {}, {})
    variables0 = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)), num_mols=2,
    )
    from flax.core import unfreeze

    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, unfreeze(variables0["params"]))
    )
    y, f = pot.apply(
        {"params": params}, jnp.asarray(z.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(batch.astype(np.int32)), num_mols=2,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-3, atol=atol_f)


@pytest.mark.parametrize("vector_cutoff", [False, True])
def test_et_parity(vector_cutoff):
    args = make_reference_args(
        model="equivariant-transformer",
        embedding_dimension=32,
        num_layers=3,
        num_rbf=16,
        num_heads=4,
        trainable_rbf=True,
        derivative=True,
        vector_cutoff=vector_cutoff,
    )
    _run_both(args, seed=2)


@pytest.mark.parametrize("distance_influence", ["both", "keys", "values", "none"])
def test_t_parity(distance_influence):
    args = make_reference_args(
        model="transformer",
        embedding_dimension=32,
        num_layers=2,
        num_rbf=16,
        num_heads=4,
        trainable_rbf=True,
        derivative=True,
        distance_influence=distance_influence,
    )
    _run_both(args, seed=3)


@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_gn_parity(aggr):
    args = make_reference_args(
        model="graph-network",
        embedding_dimension=32,
        num_layers=2,
        num_rbf=16,
        trainable_rbf=True,
        derivative=True,
        aggr=aggr,
    )
    _run_both(args, seed=4)
