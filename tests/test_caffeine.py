"""BASELINE config #1: TensorNet energy+forces on caffeine
(tests/caffeine.pdb from the reference) — cross-framework agreement with
identical weights at the reference's own tolerance (1e-4, cf.
tests/test_warp_ops.py:85-86)."""

import os

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
    apply_reference_compat,
    convert_state_dict,
)

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite

CAFFEINE_PDB = "/root/reference/tests/caffeine.pdb"

SYMBOL_Z = {"H": 1, "C": 6, "N": 7, "O": 8}


def load_caffeine():
    z, pos = [], []
    with open(CAFFEINE_PDB) as fh:
        for line in fh:
            if line.startswith(("ATOM", "HETATM")):
                pos.append([float(line[30:38]), float(line[38:46]),
                            float(line[46:54])])
                element = line[76:78].strip() or line[12:16].strip()[0]
                z.append(SYMBOL_Z[element[0].upper()])
    return np.asarray(z, np.int64), np.asarray(pos, np.float32)


def test_caffeine_energy_forces_parity():
    assert os.path.exists(CAFFEINE_PDB)
    z, pos = load_caffeine()
    assert len(z) == 24  # caffeine atom count in the fixture

    args = make_reference_args(
        model="tensornet",
        embedding_dimension=64,
        num_layers=2,
        num_rbf=16,
        cutoff_upper=4.5,
        max_z=128,
        derivative=True,
    )
    torch.manual_seed(42)
    ref = ref_create_model(dict(args))
    ref.eval()
    batch = np.zeros(len(z), np.int64)
    pos_t = torch.tensor(pos, requires_grad=True)
    y_ref, f_ref = ref(torch.tensor(z), pos_t, torch.tensor(batch))

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
    y, f = pot.apply(
        {"params": params}, jnp.asarray(z.astype(np.int32)),
        jnp.asarray(pos), jnp.asarray(batch.astype(np.int32)), num_mols=1,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f), f_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
