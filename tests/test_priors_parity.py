"""Prior parity vs the reference implementations (ZBL, D2, Coulomb,
Atomref pipeline) — full-head comparisons with identical weights
(reference tests/test_priors.py, test_prior_d2.py)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_oracle

reference_oracle.install()
from reference_oracle import make_reference_args  # noqa: E402

from torchmdnet.models.model import create_model as ref_create_model  # noqa: E402
from torchmdnet.priors import ZBL as RefZBL  # noqa: E402
from torchmdnet.priors import D2 as RefD2  # noqa: E402
from torchmdnet.priors import Coulomb as RefCoulomb  # noqa: E402

from torchmdnet_tpu.models.model import create_model  # noqa: E402
from torchmdnet_tpu.priors import D2, ZBL, Coulomb  # noqa: E402
from torchmdnet_tpu.utils.torch_ckpt import (  # noqa: E402
    apply_reference_compat,
    convert_state_dict,
)

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite

EV_SCALES = dict(distance_scale=1e-10, energy_scale=1.602176634e-19)


def _batch(rng, sizes=(8, 6)):
    z, pos, batch = [], [], []
    for m, n in enumerate(sizes):
        z.append(rng.randint(1, 10, n))
        pos.append(rng.uniform(-3, 3, (n, 3)) + 20.0 * m)
        batch.append(np.full(n, m))
    return (np.concatenate(z).astype(np.int64),
            np.concatenate(pos).astype(np.float32),
            np.concatenate(batch).astype(np.int64))


def _post_reduce_pair(ours, ref, extra_np=None, extra_jnp=None):
    rng = np.random.RandomState(7)
    z, pos, batch = _batch(rng)
    y0 = np.zeros((2, 1), np.float32)
    y_ref = ref.post_reduce(
        torch.tensor(y0), torch.tensor(z), torch.tensor(pos),
        torch.tensor(batch), None, extra_np,
    ).detach().numpy()
    y_our = ours.post_reduce(
        jnp.asarray(y0), jnp.asarray(z.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(batch.astype(np.int32)), None, extra_jnp, 2,
    )
    np.testing.assert_allclose(np.asarray(y_our), y_ref, rtol=1e-4,
                               atol=1e-6)


def test_zbl_parity():
    atomic_number = list(range(100))
    ref = RefZBL(cutoff_distance=4.0, max_num_neighbors=32,
                 atomic_number=atomic_number, **EV_SCALES)
    ours = ZBL(cutoff_distance=4.0, max_num_neighbors=32,
               atomic_number=tuple(atomic_number), **EV_SCALES)
    _post_reduce_pair(ours, ref)


def test_d2_parity():
    atomic_number = list(range(100))
    ref = RefD2(cutoff_distance=10.0, max_num_neighbors=64,
                atomic_number=atomic_number, **EV_SCALES)
    ours = D2(cutoff_distance=10.0, max_num_neighbors=64,
              atomic_number=tuple(atomic_number), **EV_SCALES)
    _post_reduce_pair(ours, ref)


def test_coulomb_parity():
    rng = np.random.RandomState(3)
    z, pos, batch = _batch(rng)
    pq = rng.randn(len(z)).astype(np.float32)
    ref = RefCoulomb(lower_switch_distance=0.05e0, upper_switch_distance=0.2,
                     max_num_neighbors=32, **EV_SCALES)
    ours = Coulomb(lower_switch_distance=0.05, upper_switch_distance=0.2,
                   max_num_neighbors=32, **EV_SCALES)
    _post_reduce_pair(
        ours, ref,
        extra_np={"partial_charges": torch.tensor(pq)},
        extra_jnp={"partial_charges": jnp.asarray(pq)},
    )


def test_full_head_with_zbl_prior():
    """TensorNet + ZBL through both frameworks with identical weights."""
    args = make_reference_args(
        embedding_dimension=16, num_layers=1, num_rbf=8, derivative=True,
        prior_model="ZBL",
        prior_args=[{
            "cutoff_distance": 4.0, "max_num_neighbors": 16,
            "atomic_number": list(range(100)), **EV_SCALES,
        }],
    )
    torch.manual_seed(0)
    ref = ref_create_model(dict(args))
    ref.eval()
    rng = np.random.RandomState(11)
    z, pos, batch = _batch(rng)
    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, f_ref = ref(torch.tensor(z), pos_t, torch.tensor(batch))

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
        {"params": params}, jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)), num_mols=2,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), f_ref.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
