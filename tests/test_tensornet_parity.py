"""Golden parity: flax TensorNet vs the reference torch implementation with
identical weights (the contract the reference itself tests at 1e-4,
tests/test_warp_ops.py:85-86)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_oracle

reference_oracle.install()

from torchmdnet.models.tensornet import TensorNet as RefTensorNet  # noqa: E402

from torchmdnet_tpu.models.tensornet import TensorNet  # noqa: E402
from torchmdnet_tpu.utils.torch_ckpt import convert_state_dict  # noqa: E402


def random_molecule(rng, n=12, spread=3.0):
    z = rng.randint(1, 10, n).astype(np.int32)
    pos = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    return z, pos


@pytest.mark.parametrize("group", ["O(3)", "SO(3)"])
@pytest.mark.parametrize("static_shapes", [False, True])
def test_tensornet_representation_parity(group, static_shapes):
    rng = np.random.RandomState(1234)
    hidden, num_rbf, layers = 32, 8, 2
    cutoff = 4.5

    torch.manual_seed(0)
    ref = RefTensorNet(
        hidden_channels=hidden,
        num_layers=layers,
        num_rbf=num_rbf,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=cutoff,
        max_num_neighbors=32,
        max_z=100,
        equivariance_invariance_group=group,
        static_shapes=static_shapes,
    )
    ref.eval()

    z_np, pos_np = random_molecule(rng, n=12)
    # two molecules packed
    z2, pos2 = random_molecule(rng, n=7)
    z_all = np.concatenate([z_np, z2])
    pos_all = np.concatenate([pos_np, pos2 + 20.0])
    batch_np = np.array([0] * 12 + [1] * 7, np.int64)

    with torch.no_grad():
        x_ref, *_ = ref(
            torch.tensor(z_all, dtype=torch.long),
            torch.tensor(pos_all),
            torch.tensor(batch_np),
        )
    x_ref = x_ref.numpy()

    model = TensorNet(
        hidden_channels=hidden,
        num_layers=layers,
        num_rbf=num_rbf,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=cutoff,
        max_num_neighbors=32,
        max_z=100,
        equivariance_invariance_group=group,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(z_all),
        jnp.asarray(pos_all),
        jnp.asarray(batch_np.astype(np.int32)),
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    )
    x, v = model.apply(
        {"params": params},
        jnp.asarray(z_all),
        jnp.asarray(pos_all),
        jnp.asarray(batch_np.astype(np.int32)),
    )
    assert v is None
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-4, atol=1e-5)


def test_tensornet_parity_with_padding_and_charge():
    """Ghost-atom padding must not change real-atom features; total charge
    enters via the (1 + 0.1 q) factors."""
    rng = np.random.RandomState(5)
    torch.manual_seed(3)
    ref = RefTensorNet(
        hidden_channels=16,
        num_layers=1,
        num_rbf=8,
        static_shapes=False,
        max_z=100,
        cutoff_upper=4.5,
    )
    ref.eval()
    z_np, pos_np = random_molecule(rng, n=9)
    batch_np = np.zeros(9, np.int64)
    q = np.array([1.0], np.float32)
    with torch.no_grad():
        x_ref, *_ = ref(
            torch.tensor(z_np, dtype=torch.long),
            torch.tensor(pos_np),
            torch.tensor(batch_np),
            q=torch.tensor(q),
        )
    x_ref = x_ref.numpy()

    model = TensorNet(
        hidden_channels=16, num_layers=1, num_rbf=8, max_z=100,
        cutoff_upper=4.5, max_num_neighbors=32,
    )
    # pad with 3 ghost atoms in segment 1 (num_mols = 1)
    n_pad = 12
    zp = np.zeros(n_pad, np.int32)
    zp[:9] = z_np
    pp = np.zeros((n_pad, 3), np.float32)
    pp[:9] = pos_np
    bp = np.full(n_pad, 1, np.int32)
    bp[:9] = 0
    amask = bp < 1

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(zp), jnp.asarray(pp), jnp.asarray(bp)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    )
    x, _ = model.apply(
        {"params": params},
        jnp.asarray(zp),
        jnp.asarray(pp),
        jnp.asarray(bp),
        q=jnp.asarray(q),
        atom_mask=jnp.asarray(amask),
    )
    np.testing.assert_allclose(np.asarray(x)[:9], x_ref, rtol=1e-4, atol=1e-5)
