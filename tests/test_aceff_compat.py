"""Offline AceFF old-checkpoint compatibility (reference
``torchmdnet/models/model.py:296-373``).

Released AceFF 1.x potentials predate the [N,F,3,3] → [N,3,3,F] tensor
reorder; their checkpoints carry ``check_errors`` in hyper_parameters and
need the ``remix_linear`` reshuffle of ``linears_scalar`` weights on load
(embedding for tensornet AND tensornet2; per-layer interaction linears for
tensornet only).  The reference covers this with a network-gated
HuggingFace download (``tests/test_calculator.py:166-307``); here an
old-format fixture is constructed synthetically by applying the *inverse*
remix to a new-format checkpoint, so the path is proven offline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchmdnet_tpu.models.model import create_model, load_model
from torchmdnet_tpu.utils.torch_ckpt import save_torch_checkpoint

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _unremix_linear(weight, bias):
    """Inverse of ``remix_linear``: new [3*F] block order → old [F*3]."""
    a, b = weight.shape
    w = weight.reshape(3, a // 3, b).transpose(1, 0, 2).reshape(a, b)
    bb = bias.reshape(3, a // 3).transpose(1, 0).reshape(a)
    return w, bb


def _args(model):
    args = dict(
        model=model,
        embedding_dimension=16,
        num_layers=2,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=32,
        max_num_neighbors=16,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
        static_shapes=True,
    )
    if model == "tensornet2":
        args.update(q_dim=4)
    return args


def _make_old_format_ckpt(path, old_path, model):
    """Save a fresh model, then derive a synthetic pre-reorder checkpoint."""
    import torch

    rng = np.random.RandomState(0)
    n = 7
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int32)
    args = _args(model)
    pot = create_model(dict(args))
    variables = pot.init(
        jax.random.PRNGKey(3), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=1,
        q=jnp.zeros((1,), jnp.float32),
    )
    save_torch_checkpoint(path, pot, variables, hparams=args)

    ckpt = torch.load(path, weights_only=False)
    sd = ckpt["state_dict"]
    remix_keys = [
        "model.representation_model.tensor_embedding.linears_scalar.1"
    ]
    if model == "tensornet":
        remix_keys += [
            f"model.representation_model.layers.{l}.linears_scalar.2"
            for l in range(args["num_layers"])
        ]
    for key in remix_keys:
        w = sd[key + ".weight"].numpy()
        b = sd[key + ".bias"].numpy()
        w_old, b_old = _unremix_linear(w, b)
        assert not np.allclose(w_old, w), "inverse remix must reorder"
        sd[key + ".weight"] = torch.tensor(w_old)
        sd[key + ".bias"] = torch.tensor(b_old)
    # the old-format marker the loader auto-detects
    ckpt["hyper_parameters"]["check_errors"] = True
    torch.save(ckpt, old_path)
    return z, pos, batch


@pytest.mark.parametrize("model", ["tensornet", "tensornet2"])
def test_old_format_checkpoint_roundtrip(tmp_path, model):
    new_path = str(tmp_path / "new.ckpt")
    old_path = str(tmp_path / "old.ckpt")
    z, pos, batch = _make_old_format_ckpt(new_path, old_path, model)

    def run(loaded):
        pot, variables = loaded
        y, neg_dy = pot.apply(
            variables, jnp.asarray(z), jnp.asarray(pos), jnp.asarray(batch),
            num_mols=1, q=jnp.zeros((1,), jnp.float32),
        )
        return np.asarray(y), np.asarray(neg_dy)

    y_new, f_new = run(load_model(new_path))
    with pytest.warns(UserWarning, match="Old-format checkpoint"):
        y_old, f_old = run(load_model(old_path))
    np.testing.assert_allclose(y_old, y_new, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f_old, f_new, rtol=1e-5, atol=1e-6)


def test_compatibility_load_override(tmp_path):
    """``compatibility_load=False`` suppresses the auto-remix (and changes
    the result); ``compatibility_load=True`` forces it on a checkpoint
    without the marker."""
    new_path = str(tmp_path / "new.ckpt")
    old_path = str(tmp_path / "old.ckpt")
    z, pos, batch = _make_old_format_ckpt(new_path, old_path, "tensornet")

    def run(loaded):
        pot, variables = loaded
        y, _ = pot.apply(
            variables, jnp.asarray(z), jnp.asarray(pos), jnp.asarray(batch),
            num_mols=1,
        )
        return np.asarray(y)

    y_new = run(load_model(new_path))
    # suppressed remix on an old-format ckpt loads the raw (wrong) weights
    y_raw = run(load_model(old_path, compatibility_load=False))
    assert not np.allclose(y_raw, y_new, rtol=1e-5, atol=1e-6)
    # forcing the remix on an un-marked checkpoint applies it anyway:
    # feeding the inverse-remixed old ckpt minus its marker must again
    # reproduce the original model
    import torch

    ckpt = torch.load(old_path, weights_only=False)
    del ckpt["hyper_parameters"]["check_errors"]
    unmarked = str(tmp_path / "unmarked.ckpt")
    torch.save(ckpt, unmarked)
    y_forced = run(load_model(unmarked, compatibility_load=True))
    np.testing.assert_allclose(y_forced, y_new, rtol=1e-5, atol=1e-6)
