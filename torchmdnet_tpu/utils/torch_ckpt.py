"""Torch/Lightning checkpoint bridge.

Loads reference TorchMD-Net ``.ckpt`` files (incl. released AceFF
potentials) into flax variables, reproducing every backward-compat remap of
the reference loader (``torchmdnet/models/model.py:208-374``):

* ``model.`` prefix stripping,
* PR#314 MLP key renames (``output_network.{0,1}.update_net.N`` →
  ``...update_net.layers.N``; ``output_network.{0,2}`` →
  ``output_network.layers.{0,2}``),
* legacy model aliases ``tensornetv2_alt``/``tensornet-nqe`` → tensornet2,
* old AceFF ``[N,F,3,3]`` layout: ``remix_linear`` reshuffle of
  ``linears_scalar`` weights, auto-detected via ``check_errors`` in the
  checkpoint hyper_parameters (override with ``compatibility_load=``),
* delta-learning: re-enabling a trailing Atomref prior.

Weight-name translation torch → flax is mechanical because our flax module
names mirror the torch attribute paths: numeric tokens merge into their
parent (``layers.0`` → ``layers_0``), ``weight`` maps to ``kernel``
(transposed), ``embedding`` or ``scale`` depending on the destination leaf.
"""

import re
import warnings
from typing import Dict, Tuple

import numpy as np

# Buffers that carry no learnable state (recomputed or config-derived).
_SKIP_PATTERNS = [
    r"\.initial_atomref$",
    r"(^|\.)mean$",
    r"(^|\.)std$",
    r"\.distance\.box$",
    r"\.box$",
    r"\.Zij_map$",
    r"\.qweights$",
    r"\.atomic_mass$",
    r"\.atomic_number$",
    r"\.C_6$",
    r"\.R_r$",
    r"\.Z_map$",
    r"\.edge_index$",
]

# Structural aliases between torch attribute paths and our flax layout.
_ALIAS_PATTERNS = [
    # GN: InteractionBlock.mlp is consumed inside CFConv as `net`
    # (torchmd_gn.py:248-258); our params live under conv/net_{0,2}.
    (r"interactions\.(\d+)\.mlp\.(\d+)\.", r"interactions.\1.conv.net.\2."),
]

_PR314_PATTERNS = [
    (
        r"output_model.output_network.(\d+).update_net.(\d+)\.",
        r"output_model.output_network.\1.update_net.layers.\2.",
    ),
    (
        r"output_model.output_network.([02]).(weight|bias)",
        r"output_model.output_network.layers.\1.\2",
    ),
]


def read_torch_checkpoint(path) -> Tuple[dict, Dict[str, np.ndarray]]:
    """Read a Lightning checkpoint into (hyper_parameters, numpy state_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    raw = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    state_dict = {}
    for k, v in raw.items():
        if hasattr(v, "detach"):
            state_dict[k] = v.detach().cpu().numpy()
        else:
            state_dict[k] = np.asarray(v)
    return hparams, state_dict


def remix_linear(weight: np.ndarray, bias: np.ndarray):
    """Old [N,F,3,3]→[N,3,3,F] layout reshuffle (reference ``model.py:321-331``)."""
    a, b = weight.shape
    w = weight.reshape(a // 3, 3, b).transpose(1, 0, 2).reshape(a, b)
    bb = bias.reshape(a // 3, 3).transpose(1, 0).reshape(a)
    return w, bb


def apply_reference_compat(
    state_dict: Dict[str, np.ndarray], args: dict, hparams: dict, kwargs: dict
) -> Dict[str, np.ndarray]:
    """Key renames + old-layout remixes, mirroring ``model.py:261-373``."""
    sd = {re.sub(r"^model\.", "", k): v for k, v in state_dict.items()}
    for pat, repl in _PR314_PATTERNS + _ALIAS_PATTERNS:
        sd = {re.sub(pat, repl, k): v for k, v in sd.items()}

    is_old_format = "check_errors" in hparams
    compatibility_load = kwargs.get("compatibility_load", is_old_format)
    if compatibility_load:
        if is_old_format and "compatibility_load" not in kwargs:
            warnings.warn(
                "Old-format checkpoint detected ('check_errors' in "
                "hyper_parameters); applying compatibility_load remap."
            )
        if args["model"] in ("tensornet", "tensornet2"):
            key_w = "representation_model.tensor_embedding.linears_scalar.1.weight"
            key_b = "representation_model.tensor_embedding.linears_scalar.1.bias"
            sd[key_w], sd[key_b] = remix_linear(sd[key_w], sd[key_b])
            if args["model"] == "tensornet":
                for layer in range(args["num_layers"]):
                    kw = f"representation_model.layers.{layer}.linears_scalar.2.weight"
                    kb = f"representation_model.layers.{layer}.linears_scalar.2.bias"
                    sd[kw], sd[kb] = remix_linear(sd[kw], sd[kb])
    return sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _torch_key_to_path(key: str) -> Tuple[str, ...]:
    tokens = key.split(".")
    merged = []
    for tok in tokens:
        if tok.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{tok}"
        else:
            merged.append(tok)
    if merged and merged[0] == "prior_model":
        merged[0] = "prior_models"
    return tuple(merged)


def convert_state_dict(
    state_dict: Dict[str, np.ndarray], params_template: dict
) -> dict:
    """Map a (compat-normalized) torch state dict onto a flax params tree."""
    flat_template = _flatten(params_template)
    filled = {}
    unmatched = []
    for key, value in state_dict.items():
        if any(re.search(p, key) for p in _SKIP_PATTERNS):
            continue
        path = _torch_key_to_path(key)
        leaf = path[-1]
        parent = path[:-1]
        candidates = []
        if leaf == "weight":
            candidates = [
                (parent + ("kernel",), "T"),
                (parent + ("embedding",), "id"),
                (parent + ("scale",), "id"),
                (parent, "id"),  # e.g. atomref.weight → leaf 'atomref'
            ]
        elif leaf == "bias":
            candidates = [(parent + ("bias",), "id")]
        else:
            candidates = [(path, "id")]
        # Non-trainable RBF parameters are buffers in torch state dicts but
        # config-derived constants here; their checkpoint values equal the
        # initialization, so they are skipped when absent from the template.
        if leaf in ("means", "betas", "offset", "coeff") and path not in flat_template:
            continue
        # A non-trainable Atomref table is a baked constant (injected at
        # module construction by the loader), not a flax param.
        if leaf == "weight" and "atomref" in parent and (
            parent not in flat_template
        ):
            continue
        placed = False
        for cand, op in candidates:
            if cand in flat_template:
                arr = value.T if op == "T" else value
                want = flat_template[cand].shape
                if tuple(arr.shape) != tuple(want):
                    raise ValueError(
                        f"Shape mismatch for {key} → {'/'.join(cand)}: "
                        f"ckpt {arr.shape} vs model {want}"
                    )
                filled[cand] = np.asarray(arr)
                placed = True
                break
        if not placed:
            unmatched.append(key)
    if unmatched:
        raise KeyError(f"Unmapped checkpoint keys: {unmatched}")
    missing = [p for p in flat_template if p not in filled]
    if missing:
        raise KeyError(
            "Checkpoint did not provide values for: "
            + ", ".join("/".join(p) for p in missing)
        )

    def rebuild(node, prefix=()):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
            else:
                out[k] = np.asarray(filled[prefix + (k,)], dtype=np.float32)
        return out

    return rebuild(params_template)


def _flax_path_to_torch_key(path, leaf_shape_is_matrix):
    """Inverse of :func:`_torch_key_to_path` for checkpoint export."""
    # Names whose trailing _<int> is literal (a torch attribute name,
    # not a ModuleList index).
    literal = {"charge_predict_0", "output_network_0", "output_network_1"}
    tokens = []
    for tok in path[:-1]:
        if tok in literal:
            tokens.append(tok)
            continue
        parts = tok.rsplit("_", 1)
        if len(parts) == 2 and parts[1].isdigit():
            tokens.extend(parts)
        else:
            tokens.append(tok)
    leaf = path[-1]
    if leaf == "kernel":
        tokens.append("weight")
    elif leaf == "embedding":
        tokens.append("weight")
    elif leaf == "scale":
        tokens.append("weight")
    elif leaf == "atomref":
        tokens.extend(["atomref", "weight"])
    else:
        tokens.append(leaf)
    if tokens[0] == "prior_models":
        tokens[0] = "prior_model"
    key = ".".join(tokens)
    # GN alias back: conv.net.{i} → mlp.{i} at the block level
    key = re.sub(r"(interactions\.\d+)\.conv\.net\.(\d+)\.", r"\1.mlp.\2.",
                 key)
    return key


def save_torch_checkpoint(filepath, potential, variables, hparams=None,
                          mean=None, std=None):
    """Export our flax params as a reference-loadable Lightning ``.ckpt``.

    Inverse of the loader: flax paths → torch keys (``layers_0`` →
    ``layers.0``; ``kernel`` → transposed ``weight``), ``model.`` prefix,
    ``hyper_parameters`` embedded — so checkpoints trained here run in the
    original torch framework unmodified.
    """
    import jax
    import torch
    from flax.core import unfreeze

    params = unfreeze(variables["params"]) if "params" in variables else (
        unfreeze(variables)
    )
    flat = _flatten(jax.tree.map(np.asarray, params))
    state_dict = {}
    for path, value in flat.items():
        key = _flax_path_to_torch_key(path, value.ndim == 2)
        if path[-1] == "kernel":
            value = value.T
        state_dict["model." + key] = torch.tensor(np.asarray(value))
    # Reference state dicts also carry non-learnable buffers (RBF params
    # when trainable_rbf=False, neighbor-list box buffers, prior tables);
    # emit them so torch `load_state_dict` finds every key.
    hp = dict(hparams or potential.hparams)
    rep = potential.module.representation_model

    def rbf_buffers(prefix, rbf_type, lo, hi, num):
        from torchmdnet_tpu.ops.rbf import (
            expnorm_initial_params,
            gauss_initial_params,
        )

        if rbf_type == "expnorm":
            means, betas = expnorm_initial_params(lo, hi, num)
            return {
                f"{prefix}.means": torch.tensor(np.asarray(means)),
                f"{prefix}.betas": torch.tensor(np.asarray(betas)),
            }
        offset, coeff = gauss_initial_params(lo, hi, num)
        return {
            f"{prefix}.offset": torch.tensor(np.asarray(offset)),
            f"{prefix}.coeff": torch.tensor(np.asarray(coeff)),
        }

    if not getattr(rep, "trainable_rbf", True):
        if getattr(rep, "rbf_initial", None) is not None:
            # checkpoint-provided buffer values round-trip verbatim
            names = (("means", "betas") if rep.rbf_type == "expnorm"
                     else ("offset", "coeff"))
            buffers = {
                f"model.representation_model.distance_expansion.{nm}":
                torch.tensor(np.asarray(vals, np.float32))
                for nm, vals in zip(names, rep.rbf_initial)
            }
        else:
            buffers = rbf_buffers(
                "model.representation_model.distance_expansion",
                rep.rbf_type, rep.cutoff_lower, rep.cutoff_upper,
                rep.num_rbf,
            )
        for key, val in buffers.items():
            state_dict.setdefault(key, val)
    state_dict.setdefault(
        "model.representation_model.distance.box", torch.zeros(3, 3)
    )
    if getattr(potential.module.output_model, "coulomb_cutoff", None):
        state_dict.setdefault(
            "model.output_model.distance.box", torch.zeros(3, 3)
        )

    from torchmdnet_tpu.priors.atomref import Atomref
    from torchmdnet_tpu.priors.coulomb import Coulomb
    from torchmdnet_tpu.priors.d2 import C_6, D2, R_R
    from torchmdnet_tpu.priors.zbl import ZBL

    for i, prior in enumerate(potential.module.prior_models):
        pfx = f"model.prior_model.{i}"
        if isinstance(prior, Atomref):
            table = torch.tensor(np.asarray(prior._initial_table()))
            state_dict.setdefault(f"{pfx}.atomref.weight", table)
            state_dict[f"{pfx}.initial_atomref"] = table
        elif isinstance(prior, ZBL):
            state_dict[f"{pfx}.atomic_number"] = torch.tensor(
                list(prior.atomic_number), dtype=torch.long
            )
            state_dict[f"{pfx}.distance.box"] = torch.zeros(3, 3)
        elif isinstance(prior, D2):
            state_dict[f"{pfx}.Z_map"] = torch.tensor(
                list(prior.atomic_number), dtype=torch.long
            )
            state_dict[f"{pfx}.C_6"] = torch.tensor(
                np.asarray(C_6, np.float32)
            )
            state_dict[f"{pfx}.R_r"] = torch.tensor(
                np.asarray(R_R, np.float32)
            )
            state_dict[f"{pfx}.distances.box"] = torch.zeros(3, 3)
        elif isinstance(prior, Coulomb):
            state_dict[f"{pfx}.distance.box"] = torch.zeros(3, 3)
    state_dict["model.mean"] = torch.tensor(
        float(mean if mean is not None else potential.module.mean)
    )
    state_dict["model.std"] = torch.tensor(
        float(std if std is not None else potential.module.std)
    )
    ckpt = {
        "state_dict": state_dict,
        "hyper_parameters": dict(hparams or potential.hparams),
    }
    torch.save(ckpt, filepath)
    return filepath


def load_checkpoint_as_potential(filepath, args=None, **kwargs):
    """Full reference-compatible loader; returns ``(potential, variables)``."""
    import jax
    import jax.numpy as jnp

    from torchmdnet_tpu.models.model import create_model, create_prior_models

    hparams, raw_sd = read_torch_checkpoint(filepath)
    if args is None:
        args = dict(hparams)
    else:
        args = dict(args)

    delta_learning = args.get("remove_ref_energy", False)
    for key, value in kwargs.items():
        if key == "compatibility_load":
            continue
        if key not in args:
            warnings.warn(f"Unknown hyperparameter: {key}={value}")
        args[key] = value

    if args.get("model") in ("tensornetv2_alt", "tensornet-nqe"):
        args["model"] = "tensornet2"

    sd = apply_reference_compat(raw_sd, args, hparams, kwargs)

    # Non-trainable RBF parameters are torch *buffers*. The reference
    # loads their values unconditionally via ``load_state_dict``; here
    # they are normally config-derived constants, so when a checkpoint's
    # values differ (e.g. a re-fitted-but-frozen RBF) they are injected
    # into module construction as ``rbf_initial`` instead of being
    # silently dropped.
    rbf_initial = None
    if not args.get("trainable_rbf", False):
        leaves = (("means", "betas")
                  if args.get("rbf_type", "expnorm") == "expnorm"
                  else ("offset", "coeff"))
        vals = []
        for leaf in leaves:
            key = f"representation_model.distance_expansion.{leaf}"
            if key in sd:
                vals.append(tuple(float(v)
                                  for v in np.asarray(sd[key]).ravel()))
        if len(vals) == len(leaves):
            rbf_initial = tuple(vals)

    # Priors from hparams; Atomref tables come from the checkpoint itself.
    prior_models = list(create_prior_models(args))
    for i, prior in enumerate(prior_models):
        from torchmdnet_tpu.priors.atomref import Atomref

        if isinstance(prior, Atomref):
            table_key = f"prior_model.{i}.atomref.weight"
            if table_key in sd:
                prior_models[i] = prior.copy(initial_atomref=sd[table_key])
                if not prior.trainable:
                    del sd[f"prior_model.{i}.atomref.weight"]

    if delta_learning and "remove_ref_energy" in kwargs:
        if not kwargs["remove_ref_energy"]:
            assert prior_models, (
                "Atomref prior must be added during training (with "
                "enable=False) for total energy prediction."
            )
            last = prior_models[-1]
            from torchmdnet_tpu.priors.atomref import Atomref

            assert isinstance(last, Atomref), "Expected the last prior to be Atomref."
            prior_models[-1] = last.copy(enable=True)

    mean = float(np.asarray(raw_sd.get("model.mean", raw_sd.get("mean", 0.0))))
    std = float(np.asarray(raw_sd.get("model.std", raw_sd.get("std", 1.0))))

    potential = create_model(args, prior_models=tuple(prior_models),
                             mean=mean, std=std, rbf_initial=rbf_initial)

    # Template init on a tiny dummy system.
    n, b = 8, 1
    rng = jax.random.PRNGKey(0)
    z = jnp.ones((n,), jnp.int32)
    pos = jnp.asarray(np.random.RandomState(0).randn(n, 3), jnp.float32)
    batch = jnp.zeros((n,), jnp.int32)
    extra = {"partial_charges": jnp.zeros((n,), jnp.float32)}
    q = jnp.zeros((b,), jnp.float32)
    variables = potential.init(
        rng, z, pos, batch, num_mols=b, q=q, extra_args=extra
    )
    from flax.core import unfreeze

    template = jax.tree.map(np.asarray, unfreeze(variables["params"]))
    params = convert_state_dict(sd, template)
    variables = dict(unfreeze(variables))
    variables["params"] = jax.tree.map(jnp.asarray, params)
    return potential, variables
