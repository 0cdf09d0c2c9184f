"""Model composition: head, factory, checkpoint loading, ensembles.

Reference parity: ``torchmdnet/models/model.py`` —
``create_model`` (:21-164), ``load_model`` incl. AceFF/PR#314 compat
remaps (:208-374), ``TorchMD_Net.forward`` pipeline (:530-631),
``Ensemble`` (:634-681).

TPU-first: the head is a *pure energy function*; forces come from
``jax.grad`` (second derivatives for force training come for free), and the
whole pipeline jits over static ``(N_pad, K, B_pad)`` shapes.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from torchmdnet_tpu.models.output_modules import OUTPUT_MODULES, OutputModel
from torchmdnet_tpu import priors as priors_pkg

DTYPES = {16: jnp.bfloat16, 32: jnp.float32, 64: jnp.float64}


class TorchMDNet(nn.Module):
    """representation → output.pre_reduce → ×std → priors.pre_reduce →
    reduce → +mean → post_reduce → priors.post_reduce
    (reference ``model.py:530-631``).

    Returns per-molecule predictions ``y [num_mols, out_dim]``.  Forces are
    computed outside via :class:`Potential` (``jax.grad`` of the summed
    energy), replacing the reference's autograd ``create_graph`` dance.
    """

    representation_model: nn.Module
    output_model: OutputModel
    prior_models: Tuple[nn.Module, ...] = ()
    mean: float = 0.0
    std: float = 1.0
    derivative: bool = False
    atom_filter: int = -1  # reference wrappers.py AtomFilter, mask-based here

    def __call__(
        self,
        z,
        pos,
        batch,
        *,
        num_mols: int,
        box=None,
        q=None,
        s=None,
        extra_args: Optional[Dict[str, Any]] = None,
        nbr=None,
        coulomb_nbr=None,
        coulomb_win=None,
        blocked=None,
        nbr_emb=None,
    ):
        atom_mask = batch < num_mols
        rep_kwargs = {}
        if blocked is not None:
            # cell-blocked Pallas MP tier (TensorNet/TensorNet2 only);
            # passed through only when active so the other representation
            # models keep their uniform signature
            rep_kwargs["blocked"] = blocked
        if nbr_emb is not None:
            # dual-list mode (grouped blocked tier): a compact K list for
            # the embedding while the interactions ride the grouped K'
            # list (TensorNet2 only)
            rep_kwargs["nbr_emb"] = nbr_emb
        x, v = self.representation_model(
            z, pos, batch, box=box, q=q, s=s, atom_mask=atom_mask,
            num_mols=num_mols, nbr=nbr, **rep_kwargs,
        )
        # the head (output MLP, priors, reductions) always runs in ≥f32,
        # even when the representation computes in bf16
        if x.dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        if v is not None and v.dtype == jnp.bfloat16:
            v = v.astype(jnp.float32)
        if self.atom_filter > -1:
            # AtomFilter (reference wrappers.py:33-67): atoms with
            # Z <= atom_filter are dropped after the representation; with
            # static shapes they are masked out of the readout instead.
            keep = (z > self.atom_filter)[:, None].astype(x.dtype)
            x = x * keep
            if v is not None:
                v = v * keep[:, :, None]
        pre_kwargs = {}
        if coulomb_nbr is not None:
            # MD passes a skin-cached Coulomb neighbor list (only the
            # Coulomb head consumes it)
            pre_kwargs["nbr"] = coulomb_nbr
        if coulomb_win is not None:
            # windowed direct-pair Coulomb tier (blocked MD path): a
            # (CoulombWindows, spec, wspec) bundle over the sorted space
            pre_kwargs["win"] = coulomb_win
        x = self.output_model.pre_reduce(
            x, v, z, pos, batch, box=box, num_mols=num_mols, **pre_kwargs
        )
        x = x * jnp.asarray(self.std, x.dtype)
        for prior in self.prior_models:
            x = prior.pre_reduce(x, z, pos, batch, extra_args, num_mols)
        y = self.output_model.reduce(x, batch, num_mols)
        y = y + jnp.asarray(self.mean, y.dtype)
        y = self.output_model.post_reduce(y)
        for prior in self.prior_models:
            y = prior.post_reduce(y, z, pos, batch, box, extra_args, num_mols)
        return y


class Potential:
    """Callable (energy, forces) potential around a :class:`TorchMDNet`.

    ``apply(variables, z, pos, batch, num_mols=...)`` returns ``(y, neg_dy)``
    with ``neg_dy = -∂(Σy)/∂pos`` when ``derivative`` — differentiable again
    for force training.
    """

    def __init__(self, module: TorchMDNet, hparams: Optional[dict] = None):
        self.module = module
        self.derivative = module.derivative
        self.hparams = dict(hparams or {})

    def init(self, rng, z, pos, batch, *, num_mols, box=None, q=None, s=None,
             extra_args=None):
        return self.module.init(
            rng, z, pos, batch, num_mols=num_mols, box=box, q=q, s=s,
            extra_args=extra_args,
        )

    def energy(self, variables, z, pos, batch, *, num_mols, box=None, q=None,
               s=None, extra_args=None, nbr=None, coulomb_nbr=None,
               blocked=None, coulomb_win=None, nbr_emb=None):
        return self.module.apply(
            variables, z, pos, batch, num_mols=num_mols, box=box, q=q, s=s,
            extra_args=extra_args, nbr=nbr, coulomb_nbr=coulomb_nbr,
            blocked=blocked, coulomb_win=coulomb_win, nbr_emb=nbr_emb,
        )

    def apply(self, variables, z, pos, batch, *, num_mols, box=None, q=None,
              s=None, extra_args=None, nbr=None, coulomb_nbr=None,
              blocked=None, coulomb_win=None, nbr_emb=None):
        if not self.derivative:
            y = self.energy(
                variables, z, pos, batch, num_mols=num_mols, box=box, q=q,
                s=s, extra_args=extra_args, nbr=nbr, coulomb_nbr=coulomb_nbr,
                blocked=blocked, coulomb_win=coulomb_win, nbr_emb=nbr_emb,
            )
            return y, None

        def etot(p):
            y = self.energy(
                variables, z, p, batch, num_mols=num_mols, box=box, q=q, s=s,
                extra_args=extra_args, nbr=nbr, coulomb_nbr=coulomb_nbr,
                blocked=blocked, coulomb_win=coulomb_win, nbr_emb=nbr_emb,
            )
            return jnp.sum(y), y

        grad, y = jax.grad(etot, has_aux=True)(pos)
        return y, -grad


def create_prior_models(args: dict, dataset=None) -> Tuple[nn.Module, ...]:
    """Parse the ``prior_model``/``prior_args`` config forms
    (reference ``model.py:377-448``)."""
    prior_models = []
    if not args.get("prior_model"):
        return ()
    prior_model = args["prior_model"]
    prior_names, prior_args = [], []
    if not isinstance(prior_model, (list, tuple)):
        prior_model = [prior_model]
    for prior in prior_model:
        if isinstance(prior, dict):
            for key, value in prior.items():
                prior_names.append(key)
                prior_args.append(value or {})
        else:
            prior_names.append(prior)
            prior_args.append({})
    if args.get("prior_args") is not None:
        prior_args = args["prior_args"]
        if not isinstance(prior_args, (list, tuple)):
            prior_args = [prior_args]
    for name, arg in zip(prior_names, prior_args):
        if name not in priors_pkg.PRIOR_CLASSES:
            raise ValueError(
                f"Unknown prior model {name}. Available: "
                f"{', '.join(priors_pkg.__all__)}"
            )
        arg = dict(arg)
        cls = priors_pkg.PRIOR_CLASSES[name]
        if dataset is not None:
            # Priors pull element maps / unit scales from the dataset
            # (reference scripts/train.py:198-199, zbl.py:45-50).
            if name in ("ZBL", "Coulomb", "D2"):
                arg.setdefault("distance_scale", float(dataset.distance_scale))
                arg.setdefault("energy_scale", float(dataset.energy_scale))
            if name in ("ZBL", "D2") and "atomic_number" not in arg:
                arg["atomic_number"] = tuple(
                    int(v) for v in np.asarray(dataset.atomic_number).tolist()
                )
            if name in ("Atomref", "LearnableAtomref"):
                atomref = getattr(dataset, "get_atomref", lambda: None)()
                if atomref is not None:
                    arg.setdefault("initial_atomref", np.asarray(atomref))
                else:
                    arg.setdefault("max_z", 100)
        if name in ("ZBL", "D2") and "atomic_number" in arg:
            arg["atomic_number"] = tuple(int(v) for v in arg["atomic_number"])
        prior_models.append(cls(**arg))
    return tuple(prior_models)


def _make_representation(args: dict, rbf_initial=None):
    model_name = args["model"]
    # precision=16 selects bf16 compute (params stay f32) — the TPU-native
    # analogue of the reference's fp16 training mode; 32/64 keep the input
    # dtype (f64 via jax_enable_x64).
    compute_dtype = jnp.bfloat16 if args.get("precision", 32) == 16 else None
    cpd = args.get("cells_per_dim")
    shared = dict(
        dtype=compute_dtype,
        neighbor_strategy=args.get("neighbor_strategy", "brute"),
        cells_per_dim=tuple(int(c) for c in cpd) if cpd else None,
        cell_capacity=int(args.get("cell_capacity", 64)),
        hidden_channels=args["embedding_dimension"],
        num_layers=args["num_layers"],
        num_rbf=args["num_rbf"],
        rbf_type=args["rbf_type"],
        trainable_rbf=args["trainable_rbf"],
        rbf_initial=rbf_initial,
        activation=args["activation"],
        cutoff_lower=float(args["cutoff_lower"]),
        cutoff_upper=float(args["cutoff_upper"]),
        max_z=args["max_z"],
        max_num_neighbors=args["max_num_neighbors"],
    )
    if model_name == "tensornet":
        from torchmdnet_tpu.models.tensornet import TensorNet

        return TensorNet(
            equivariance_invariance_group=args["equivariance_invariance_group"],
            remat=bool(args.get("remat", False)),
            pallas_edge_mlp=bool(args.get("pallas_edge_mlp", False)),
            tabulated_edge_mlp=int(args.get("tabulated_edge_mlp", 0)),
            pallas_embedding=bool(args.get("pallas_embedding", False)),
            cell_block_spec=args.get("cell_block_spec"),
            **shared,
        ), False
    if model_name == "tensornet2":
        from torchmdnet_tpu.models.tensornet2 import TensorNet2

        return TensorNet2(
            equivariance_invariance_group=args["equivariance_invariance_group"],
            q_dim=args.get("q_dim", 0),
            output_charges="Coul" in args["output_model"],
            remat=bool(args.get("remat", False)),
            pallas_edge_mlp=bool(args.get("pallas_edge_mlp", False)),
            pallas_embedding=bool(args.get("pallas_embedding", False)),
            cell_block_spec=args.get("cell_block_spec"),
            q_tab=int(args.get("q_tab", 64)),
            **shared,
        ), False
    if model_name == "equivariant-transformer":
        from torchmdnet_tpu.models.torchmd_et import TorchMD_ET

        return TorchMD_ET(
            attn_activation=args["attn_activation"],
            num_heads=args["num_heads"],
            distance_influence=args["distance_influence"],
            neighbor_embedding=args["neighbor_embedding"],
            vector_cutoff=args.get("vector_cutoff", False),
            **shared,
        ), True
    if model_name == "transformer":
        from torchmdnet_tpu.models.torchmd_t import TorchMD_T

        return TorchMD_T(
            attn_activation=args["attn_activation"],
            num_heads=args["num_heads"],
            distance_influence=args["distance_influence"],
            neighbor_embedding=args["neighbor_embedding"],
            **shared,
        ), False
    if model_name == "graph-network":
        from torchmdnet_tpu.models.torchmd_gn import TorchMD_GN

        return TorchMD_GN(
            num_filters=args["embedding_dimension"],
            aggr=args["aggr"],
            neighbor_embedding=args["neighbor_embedding"],
            **shared,
        ), False
    raise ValueError(f'Unknown architecture: {model_name}')


def create_model(args: dict, prior_models=None, mean=None, std=None,
                 rbf_initial=None) -> Potential:
    """Build a :class:`Potential` from a reference-compatible args dict
    (reference ``model.py:21-164``)."""
    args = dict(args)
    if args.get("matmul_precision"):
        from torchmdnet_tpu.ops.config import set_matmul_precision

        set_matmul_precision(args["matmul_precision"])
    args.setdefault("box_vecs", None)
    args.setdefault("static_shapes", True)
    args.setdefault("vector_cutoff", False)
    args.setdefault("derivative", False)
    args.setdefault("atom_filter", -1)
    args.setdefault("output_model", "Scalar")
    args.setdefault("reduce_op", "sum")

    representation_model, is_equivariant = _make_representation(
        args, rbf_initial=rbf_initial
    )

    if args["derivative"] and args["atom_filter"] > -1:
        raise ValueError("Derivative and atom filter can't be used together")

    if args.get("prior_model") and prior_models is None:
        prior_models = create_prior_models(args)
    prior_models = tuple(prior_models or ())

    output_prefix = "Equivariant" if is_equivariant else ""
    output_name = output_prefix + args["output_model"]
    out_cls = OUTPUT_MODULES[output_name]
    out_kwargs = dict(
        hidden_channels=args["embedding_dimension"],
        activation=args["activation"],
        reduce_op=args["reduce_op"],
    )
    if args["output_model"] == "ScalarPlusWeightedCoulomb":
        out_kwargs.update(
            num_hidden_layers=args.get("output_mlp_num_layers", 0),
            q_dim=args.get("q_dim", 0),
            num_interaction_layers=args["num_layers"],
            q_weights=tuple(tuple(w) if isinstance(w, (list, tuple)) else (w,)
                            for w in args.get("q_weights", [])),
            coulomb_cutoff=args.get("coulomb_cutoff", None),
            coulomb_max_num_neighbors=args.get("coulomb_max_num_neighbors", None),
            coulomb_neighbor_strategy=args.get("coulomb_neighbor_strategy", "brute"),
            coulomb_cells_per_dim=(
                tuple(int(c) for c in args["coulomb_cells_per_dim"])
                if args.get("coulomb_cells_per_dim") else None
            ),
            coulomb_cell_stencil=int(
                args.get("coulomb_cell_stencil", 1) or 1
            ),
            coulomb_cell_capacity=int(
                args.get("coulomb_cell_capacity", 64) or 64
            ),
        )
    else:
        # reference quirk (issue #343): Scalar's MLP depth comes from the
        # `num_layers` kwarg which create_model pins to 0 for non-Coulomb
        # output models.
        out_kwargs.update(num_hidden_layers=0)
    output_model = out_cls(**out_kwargs)

    if not output_model.allow_prior_model and prior_models:
        prior_models = ()

    module = TorchMDNet(
        representation_model=representation_model,
        output_model=output_model,
        prior_models=prior_models,
        mean=float(mean) if mean is not None else 0.0,
        std=float(std) if std is not None else 1.0,
        derivative=bool(args["derivative"]),
        atom_filter=int(args["atom_filter"]),
    )
    return Potential(module, hparams=args)


def load_model(filepath, args=None, device=None, return_std=False, **kwargs):
    """Load a reference Lightning ``.ckpt`` (or an ensemble zip/list) into a
    :class:`Potential` + converted variables.

    Returns ``(potential, variables)``.  Handles (reference
    ``model.py:208-374``): hparam override kwargs, the
    ``tensornetv2_alt``/``tensornet-nqe`` aliases, PR#314 MLP key renames,
    old AceFF ``[N,F,3,3]``-layout ``remix_linear`` (auto-detected via
    ``check_errors`` in hparams), delta-learning Atomref enabling, and
    torch→flax weight mapping.
    """
    from torchmdnet_tpu.utils.torch_ckpt import load_checkpoint_as_potential

    if isinstance(filepath, (list, tuple)) or str(filepath).endswith(".zip"):
        return load_ensemble(filepath, args=args, return_std=return_std, **kwargs)
    return load_checkpoint_as_potential(filepath, args=args, **kwargs)


class Ensemble:
    """Average predictions over multiple potentials
    (reference ``model.py:634-681``)."""

    def __init__(self, members, return_std=False):
        # members: list of (Potential, variables)
        self.members = list(members)
        self.return_std = return_std

    def apply(self, z, pos, batch, **kw):
        ys, fs = [], []
        for pot, variables in self.members:
            y, neg_dy = pot.apply(variables, z, pos, batch, **kw)
            ys.append(y)
            fs.append(neg_dy)
        y = jnp.stack(ys)
        y_mean = jnp.mean(y, axis=0)
        y_std = jnp.std(y, axis=0, ddof=1)
        if fs[0] is not None:
            f = jnp.stack(fs)
            f_mean, f_std = jnp.mean(f, axis=0), jnp.std(f, axis=0, ddof=1)
        else:
            f_mean = f_std = None
        if self.return_std:
            return y_mean, f_mean, y_std, f_std
        return y_mean, f_mean


def load_ensemble(filepath, args=None, return_std=False, **kwargs):
    """Reference ``model.py:167-205``: list of ckpts or a zip of ckpts."""
    import glob as globmod
    import os
    import tempfile
    import zipfile

    if isinstance(filepath, (list, tuple)):
        paths = list(filepath)
        members = [load_model(p, args=args, **kwargs) for p in paths]
        return Ensemble(members, return_std=return_std)
    if str(filepath).endswith(".zip"):
        with tempfile.TemporaryDirectory() as tmpdir:
            with zipfile.ZipFile(filepath, "r") as zf:
                zf.extractall(tmpdir)
            paths = sorted(globmod.glob(os.path.join(tmpdir, "*.ckpt")))
            assert len(paths) > 0, "No checkpoint files found in zip file."
            members = [load_model(p, args=args, **kwargs) for p in paths]
        return Ensemble(members, return_std=return_std)
    raise ValueError("Invalid filepath for ensemble.")
