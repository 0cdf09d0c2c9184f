"""Training-gradient parity vs torch autograd: identical weights + batch →
identical parameter gradients of the weighted (energy, force) loss.
Exercises the full reverse-over-reverse path (force-loss double backward —
the reference hand-writes bwd_bwd Warp kernels for this; here it is jax AD
through the custom scatter-free VJPs)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import reference_oracle

reference_oracle.install()
from reference_oracle import make_reference_args  # noqa: E402

from torchmdnet.models.model import create_model as ref_create_model  # noqa: E402

from torchmdnet_tpu.models.model import create_model  # noqa: E402
from torchmdnet_tpu.utils.torch_ckpt import (  # noqa: E402
    _torch_key_to_path,
    apply_reference_compat,
    convert_state_dict,
)

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def test_training_gradients_match_torch():
    args = make_reference_args(
        embedding_dimension=16, num_layers=2, num_rbf=8, derivative=True,
        cutoff_upper=5.0,
    )
    torch.manual_seed(3)
    ref = ref_create_model(dict(args))
    ref.train()

    rng = np.random.RandomState(9)
    n = 10
    z = rng.randint(1, 9, n).astype(np.int64)
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int64)
    y_target = rng.randn(1, 1).astype(np.float32)
    f_target = rng.randn(n, 3).astype(np.float32)
    y_w, f_w = 0.3, 0.7

    # torch side
    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, negdy_ref = ref(torch.tensor(z), pos_t, torch.tensor(batch))
    loss_t = y_w * torch.nn.functional.mse_loss(
        y_ref, torch.tensor(y_target)
    ) + f_w * torch.nn.functional.mse_loss(
        negdy_ref, torch.tensor(f_target)
    )
    loss_t.backward()
    torch_grads = {
        name: p.grad.detach().numpy()
        for name, p in ref.named_parameters()
        if p.grad is not None
    }

    # jax side with identical weights
    pot = create_model(dict(args))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd = apply_reference_compat(sd, args, {}, {})
    variables0 = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)), num_mols=1,
    )
    from flax.core import unfreeze

    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, unfreeze(variables0["params"]))
    )
    params = jax.tree.map(jnp.asarray, params)

    def loss_fn(p):
        y, negdy = pot.apply(
            {"params": p}, jnp.asarray(z.astype(np.int32)),
            jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)),
            num_mols=1,
        )
        return (
            y_w * jnp.mean((y - y_target) ** 2)
            + f_w * jnp.mean((negdy - f_target) ** 2)
        )

    grads = jax.grad(loss_fn)(params)
    flat = {}

    def flatten(node, prefix=()):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + (k,))
            else:
                flat[prefix + (k,)] = np.asarray(v)

    flatten(jax.device_get(grads))

    checked = 0
    for torch_name, tgrad in torch_grads.items():
        path = _torch_key_to_path(torch_name)
        leaf = path[-1]
        parent = path[:-1]
        if leaf == "weight":
            for cand, op in ((parent + ("kernel",), "T"),
                             (parent + ("embedding",), "id"),
                             (parent + ("scale",), "id")):
                if cand in flat:
                    ours = flat[cand].T if op == "T" else flat[cand]
                    break
            else:
                continue
        elif leaf == "bias":
            cand = parent + ("bias",)
            if cand not in flat:
                continue
            ours = flat[cand]
        else:
            continue
        np.testing.assert_allclose(
            ours, tgrad, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient mismatch for {torch_name}",
        )
        checked += 1
    assert checked >= 20, f"only {checked} parameter gradients compared"


def test_training_gradients_match_torch_tensornet2():
    """Same contract for TensorNet2 + ScalarPlusWeightedCoulomb: the force
    loss double-backward runs through packed_neighbor_sum_asym (recomputed
    reverse weights), whose second order must match torch autograd."""
    args = make_reference_args(
        model="tensornet2", embedding_dimension=16, num_layers=2,
        num_rbf=8, derivative=True, cutoff_upper=5.0, q_dim=4,
        output_model="ScalarPlusWeightedCoulomb",
        q_weights=[[1.0, 1.0, 0.5, 0.5]] * 3,
        coulomb_cutoff=6.0, coulomb_max_num_neighbors=16,
        output_mlp_num_layers=0,
    )
    torch.manual_seed(7)
    ref = ref_create_model(dict(args))
    ref.train()

    rng = np.random.RandomState(11)
    n = 10
    z = rng.randint(1, 9, n).astype(np.int64)
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int64)
    q = np.array([1.0], np.float32)
    y_target = rng.randn(1, 1).astype(np.float32)
    f_target = rng.randn(n, 3).astype(np.float32)
    y_w, f_w = 0.3, 0.7

    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, negdy_ref = ref(
        torch.tensor(z), pos_t, torch.tensor(batch), q=torch.tensor(q)
    )
    loss_t = y_w * torch.nn.functional.mse_loss(
        y_ref, torch.tensor(y_target)
    ) + f_w * torch.nn.functional.mse_loss(
        negdy_ref, torch.tensor(f_target)
    )
    loss_t.backward()
    torch_grads = {
        name: p.grad.detach().numpy()
        for name, p in ref.named_parameters()
        if p.grad is not None
    }

    pot = create_model(dict(args))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd = apply_reference_compat(sd, args, {}, {})
    variables0 = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)),
        q=jnp.asarray(q), num_mols=1,
    )
    from flax.core import unfreeze

    params = convert_state_dict(
        sd, jax.tree.map(np.asarray, unfreeze(variables0["params"]))
    )
    params = jax.tree.map(jnp.asarray, params)

    def loss_fn(p):
        y, negdy = pot.apply(
            {"params": p}, jnp.asarray(z.astype(np.int32)),
            jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)),
            q=jnp.asarray(q), num_mols=1,
        )
        return (
            y_w * jnp.mean((y - y_target) ** 2)
            + f_w * jnp.mean((negdy - f_target) ** 2)
        )

    grads = jax.grad(loss_fn)(params)
    flat = {}

    def flatten(node, prefix=()):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + (k,))
            else:
                flat[prefix + (k,)] = np.asarray(v)

    flatten(jax.device_get(grads))

    checked = 0
    for torch_name, tgrad in torch_grads.items():
        path = _torch_key_to_path(torch_name)
        leaf = path[-1]
        parent = path[:-1]
        if leaf == "weight":
            for cand, op in ((parent + ("kernel",), "T"),
                             (parent + ("embedding",), "id"),
                             (parent + ("scale",), "id")):
                if cand in flat:
                    ours = flat[cand].T if op == "T" else flat[cand]
                    break
            else:
                continue
        elif leaf == "bias":
            cand = parent + ("bias",)
            if cand not in flat:
                continue
            ours = flat[cand]
        else:
            continue
        np.testing.assert_allclose(
            ours, tgrad, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient mismatch for {torch_name}",
        )
        checked += 1
    assert checked >= 20, f"only {checked} parameter gradients compared"
