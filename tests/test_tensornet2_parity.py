"""Golden parity for TensorNet2 (charge equilibration) and the
ScalarPlusWeightedCoulomb output module vs the reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_oracle

reference_oracle.install()
from reference_oracle import make_reference_args  # noqa: E402

from torchmdnet.models.model import create_model as ref_create_model  # noqa: E402
from torchmdnet.models.tensornet2 import TensorNet2 as RefTensorNet2  # noqa: E402

from torchmdnet_tpu.models.model import create_model  # noqa: E402
from torchmdnet_tpu.models.tensornet2 import TensorNet2  # noqa: E402
from torchmdnet_tpu.utils.torch_ckpt import (  # noqa: E402
    apply_reference_compat,
    convert_state_dict,
)


@pytest.mark.parametrize("output_charges", [False, True])
def test_tensornet2_representation_parity(output_charges):
    rng = np.random.RandomState(21)
    torch.manual_seed(4)
    kw = dict(
        hidden_channels=32, q_dim=4, num_layers=2, num_rbf=8,
        cutoff_upper=4.5, max_z=100, max_num_neighbors=32,
        output_charges=output_charges,
    )
    ref = RefTensorNet2(static_shapes=False, **kw)
    ref.eval()

    n1, n2 = 11, 6
    z = np.concatenate([rng.randint(1, 10, n1), rng.randint(1, 10, n2)])
    pos = np.concatenate(
        [rng.uniform(-3, 3, (n1, 3)), rng.uniform(-3, 3, (n2, 3)) + 25.0]
    ).astype(np.float32)
    batch = np.array([0] * n1 + [1] * n2)
    q = np.array([1.0, -1.0], np.float32)

    with torch.no_grad():
        x_ref, *_ = ref(
            torch.tensor(z, dtype=torch.long),
            torch.tensor(pos),
            torch.tensor(batch, dtype=torch.long),
            q=torch.tensor(q),
        )
    x_ref = x_ref.numpy()

    model = TensorNet2(**kw)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from flax.core import unfreeze

    variables0 = model.init(
        jax.random.PRNGKey(0), jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)),
        q=jnp.asarray(q), num_mols=2,
    )
    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, unfreeze(variables0["params"]))
    )
    x, v = model.apply(
        {"params": params}, jnp.asarray(z.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(batch.astype(np.int32)), q=jnp.asarray(q), num_mols=2,
    )
    assert v is None
    assert x.shape == x_ref.shape
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("coulomb_cutoff", [None, 6.0])
def test_tensornet2_coulomb_head_parity(coulomb_cutoff):
    """Full head: tensornet2 + ScalarPlusWeightedCoulomb, energies + forces."""
    rng = np.random.RandomState(33)
    torch.manual_seed(9)
    args = make_reference_args(
        model="tensornet2",
        embedding_dimension=32,
        num_layers=2,
        num_rbf=8,
        cutoff_upper=4.5,
        derivative=True,
        output_model="ScalarPlusWeightedCoulomb",
        q_dim=4,
        q_weights=[[1.0, 1.0, 0.5, 0.5]] * 3,
        coulomb_cutoff=coulomb_cutoff,
        coulomb_max_num_neighbors=32,
        output_mlp_num_layers=0,
    )
    ref = ref_create_model(dict(args))
    ref.eval()

    n1, n2 = 10, 7
    z = np.concatenate([rng.randint(1, 10, n1), rng.randint(1, 10, n2)])
    pos = np.concatenate(
        [rng.uniform(-3, 3, (n1, 3)), rng.uniform(-3, 3, (n2, 3)) + 25.0]
    ).astype(np.float32)
    batch = np.array([0] * n1 + [1] * n2)
    q = np.array([0.0, 1.0], np.float32)

    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, f_ref = ref(
        torch.tensor(z, dtype=torch.long), pos_t,
        torch.tensor(batch, dtype=torch.long), q=torch.tensor(q),
    )
    y_ref, f_ref = y_ref.detach().numpy(), f_ref.detach().numpy()

    pot = create_model(dict(args))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd = apply_reference_compat(sd, args, {}, {})
    variables0 = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)),
        q=jnp.asarray(q), num_mols=2,
    )
    from flax.core import unfreeze

    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, unfreeze(variables0["params"]))
    )
    y, f = pot.apply(
        {"params": params}, jnp.asarray(z.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(batch.astype(np.int32)), q=jnp.asarray(q), num_mols=2,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-4, atol=1e-4)
