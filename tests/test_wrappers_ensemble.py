"""AtomFilter semantics (reference tests/test_wrappers.py) and Ensemble
averaging (reference tests/test_model.py:355-387)."""

import os
import zipfile

import numpy as np

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import Ensemble, create_model, load_model
from torchmdnet_tpu.utils.torch_ckpt import save_torch_checkpoint

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _args(**kw):
    a = dict(
        model="tensornet", embedding_dimension=16, num_layers=1, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=8,
        derivative=False, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
    )
    a.update(kw)
    return a


def test_atom_filter_drops_low_z():
    rng = np.random.RandomState(0)
    n = 8
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)

    pot = create_model(_args(atom_filter=1))  # drop hydrogens (Z <= 1)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1,
    )
    y_f, _ = pot.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                       jnp.asarray(batch), num_mols=1)

    # manual equivalent: unfiltered per-atom outputs with H zeroed
    pot0 = create_model(_args())
    y0, _ = pot0.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                       jnp.asarray(batch), num_mols=1)
    # with everything filtered out the value differs from unfiltered
    assert not np.allclose(np.asarray(y_f), np.asarray(y0))

    # all-Z>1 system: filter is a no-op
    z2 = np.clip(z, 2, None).astype(np.int32)
    ya, _ = pot.apply(variables, jnp.asarray(z2), jnp.asarray(pos),
                      jnp.asarray(batch), num_mols=1)
    yb, _ = pot0.apply(variables, jnp.asarray(z2), jnp.asarray(pos),
                       jnp.asarray(batch), num_mols=1)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6)


def test_atom_filter_rejects_derivative():
    import pytest

    with pytest.raises(ValueError):
        create_model(_args(atom_filter=1, derivative=True))


def test_nontrainable_rbf_buffers_load_from_checkpoint(tmp_path):
    """Non-trainable RBF buffers are loaded from the checkpoint, like the
    reference's unconditional ``load_state_dict`` of buffers — a
    re-fitted-but-frozen RBF checkpoint must load faithfully, not fall
    back to the config-derived initialization."""
    import torch

    rng = np.random.RandomState(2)
    n = 6
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    args = _args()
    pot = create_model(dict(args))
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1,
    )
    path = str(tmp_path / "m.ckpt")
    save_torch_checkpoint(path, pot, variables, hparams=args)

    ckpt = torch.load(path, weights_only=False)
    key = "model.representation_model.distance_expansion.means"
    assert key in ckpt["state_dict"]
    ckpt["state_dict"][key] = ckpt["state_dict"][key] + 0.1
    mod = str(tmp_path / "refit.ckpt")
    torch.save(ckpt, mod)

    def energy(loaded):
        p, v = loaded
        y, _ = p.apply(v, jnp.asarray(z), jnp.asarray(pos),
                       jnp.asarray(batch), num_mols=1)
        return np.asarray(y)

    y_orig = energy(load_model(path))
    y_mod = energy(load_model(mod))
    # the edited buffer must take effect
    assert not np.allclose(y_orig, y_mod)
    # and must agree with loading the same values as trainable params
    y_trainable = energy(load_model(mod, trainable_rbf=True))
    np.testing.assert_allclose(y_mod, y_trainable, rtol=1e-6, atol=1e-6)


def test_ensemble_zip_and_list(tmp_path):
    rng = np.random.RandomState(1)
    n = 6
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)

    args = _args(derivative=True)
    paths = []
    ys = []
    for i in range(3):
        pot = create_model(dict(args))
        variables = pot.init(
            jax.random.PRNGKey(i), jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(batch), num_mols=1,
        )
        path = str(tmp_path / f"m{i}.ckpt")
        save_torch_checkpoint(path, pot, variables, hparams=args)
        paths.append(path)
        y, _ = pot.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                         jnp.asarray(batch), num_mols=1)
        ys.append(np.asarray(y))

    ens = load_model(paths)
    assert isinstance(ens, Ensemble)
    y_mean, f_mean = ens.apply(
        jnp.asarray(z), jnp.asarray(pos), jnp.asarray(batch), num_mols=1
    )
    np.testing.assert_allclose(
        np.asarray(y_mean), np.mean(ys, axis=0), rtol=1e-5, atol=1e-6
    )
    assert f_mean is not None

    zip_path = str(tmp_path / "ens.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in paths:
            zf.write(p, os.path.basename(p))
    ens2 = load_model(zip_path, return_std=True)
    y2, f2, y_std, f_std = ens2.apply(
        jnp.asarray(z), jnp.asarray(pos), jnp.asarray(batch), num_mols=1
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_mean), rtol=1e-5)
    assert np.asarray(y_std).shape == np.asarray(y_mean).shape
