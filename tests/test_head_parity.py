"""Head-level golden parity: full TorchMD_Net pipeline (representation →
output module → priors → reduce → forces) vs the reference, with identical
weights."""

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


def _make_batch(rng, sizes):
    zs, ps, bs = [], [], []
    for m, n in enumerate(sizes):
        zs.append(rng.randint(1, 10, n))
        ps.append(rng.uniform(-3, 3, (n, 3)) + 20.0 * m)
        bs.append(np.full(n, m))
    return (
        np.concatenate(zs).astype(np.int64),
        np.concatenate(ps).astype(np.float32),
        np.concatenate(bs).astype(np.int64),
    )


def _convert(potential, ref_model, n, b, extra=None):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    sd = apply_reference_compat(sd, potential.hparams, {}, {})
    rng = jax.random.PRNGKey(0)
    z = jnp.ones((n,), jnp.int32)
    pos = jnp.asarray(np.random.RandomState(0).randn(n, 3), jnp.float32)
    batch = jnp.zeros((n,), jnp.int32)
    variables = potential.init(
        rng, z, pos, batch, num_mols=b, extra_args=extra
    )
    from flax.core import unfreeze

    template = jax.tree.map(np.asarray, unfreeze(variables["params"]))
    params = convert_state_dict(sd, template)
    return {"params": params}


@pytest.mark.parametrize("with_atomref", [False, True])
def test_full_head_energy_and_forces(with_atomref):
    rng = np.random.RandomState(11)
    args = make_reference_args(
        embedding_dimension=32,
        num_rbf=8,
        derivative=True,
        prior_model="Atomref" if with_atomref else None,
        prior_args={"max_z": 100} if with_atomref else None,
    )
    torch.manual_seed(7)
    ref = ref_create_model(
        dict(args), mean=torch.tensor(1.5), std=torch.tensor(2.0)
    )
    ref.eval()
    if with_atomref:
        with torch.no_grad():
            ref.prior_model[0].atomref.weight.normal_(0.0, 0.1)

    z, pos, batch = _make_batch(rng, [10, 6, 8])
    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, negdy_ref = ref(
        torch.tensor(z), pos_t, torch.tensor(batch)
    )
    y_ref = y_ref.detach().numpy()
    negdy_ref = negdy_ref.detach().numpy()

    pot = create_model(dict(args), mean=1.5, std=2.0)
    if with_atomref:
        # inject the randomized table into our (non-trainable) prior
        table = ref.prior_model[0].atomref.weight.detach().numpy()
        from torchmdnet_tpu.priors.atomref import Atomref

        pot = create_model(
            dict(args),
            prior_models=(Atomref(initial_atomref=table),),
            mean=1.5,
            std=2.0,
        )
    variables = _convert(pot, ref, len(z), 3)
    y, negdy = pot.apply(
        variables,
        jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos),
        jnp.asarray(batch.astype(np.int32)),
        num_mols=3,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(negdy), negdy_ref, rtol=1e-4, atol=1e-4
    )


def test_force_gradcheck_fp64():
    """Force correctness in f64 (analogue of the reference's
    torch.autograd.gradcheck, tests/test_model.py:332-352)."""
    jax.config.update("jax_enable_x64", True)
    try:
        args = make_reference_args(embedding_dimension=16, num_rbf=8,
                                   num_layers=1, derivative=True)
        pot = create_model(dict(args))
        rng = np.random.RandomState(3)
        z = rng.randint(1, 10, 7).astype(np.int32)
        pos = rng.uniform(-2, 2, (7, 3)).astype(np.float64)
        batch = np.zeros(7, np.int32)
        variables = pot.init(
            jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(batch), num_mols=1,
        )
        variables = jax.tree.map(lambda a: a.astype(jnp.float64), variables)
        y0, F = pot.apply(
            variables, jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(batch), num_mols=1,
        )
        F = np.asarray(F)
        eps = 1e-6
        for (i, d) in [(0, 0), (3, 1), (6, 2)]:
            pp = pos.copy()
            pp[i, d] += eps
            yp, _ = pot.apply(
                variables, jnp.asarray(z), jnp.asarray(pp),
                jnp.asarray(batch), num_mols=1,
            )
            pp[i, d] -= 2 * eps
            ym, _ = pot.apply(
                variables, jnp.asarray(z), jnp.asarray(pp),
                jnp.asarray(batch), num_mols=1,
            )
            fd = -(float(np.asarray(yp).sum()) - float(np.asarray(ym).sum())) / (
                2 * eps
            )
            np.testing.assert_allclose(fd, F[i, d], rtol=1e-5, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)
