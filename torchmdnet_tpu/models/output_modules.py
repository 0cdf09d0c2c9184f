"""Output modules (reference ``torchmdnet/models/output_modules.py``).

The reference's ``reduce`` carries CUDA-graph/TorchScript ``dim_size``
caching machinery (``output_modules.py:43-73``); under jit the number of
molecules is simply a static ``num_segments`` — padding molecules receive
zeros and ghost atoms live in an extra segment that is dropped.
"""

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from torchmdnet_tpu.models.common import MLP, GatedEquivariantBlock
from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix, neighbor_geometry
from torchmdnet_tpu.ops.segment import segment_mean, segment_sum
from torchmdnet_tpu.utils.periodic_table import ATOMIC_MASSES


def reduce_atoms(x, batch, num_mols: int, reduce_op: str = "sum"):
    """Per-molecule reduction; ghost atoms (batch == num_mols) are dropped."""
    if reduce_op in ("sum", "add"):
        out = segment_sum(x, batch, num_mols + 1)
    elif reduce_op == "mean":
        out = segment_mean(x, batch, num_mols + 1)
    else:
        raise ValueError(f"Unsupported reduce_op {reduce_op!r}")
    return out[:num_mols]


def _center_of_mass(z, pos, batch, num_mols):
    mass = jnp.asarray(ATOMIC_MASSES, pos.dtype)[z][:, None]
    c = reduce_atoms(mass * pos, batch, num_mols) / reduce_atoms(
        mass, batch, num_mols
    )
    return c, mass


class OutputModel(nn.Module):
    """Base: pre_reduce (per-atom) → reduce → post_reduce (per-molecule)."""

    hidden_channels: int = 128
    activation: str = "silu"
    reduce_op: str = "sum"
    num_hidden_layers: int = 0
    allow_prior_model: bool = True

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        raise NotImplementedError

    def reduce(self, x, batch, num_mols):
        return reduce_atoms(x, batch, num_mols, self.reduce_op)

    def post_reduce(self, x):
        return x


class Scalar(OutputModel):
    """MLP energy head (reference ``output_modules.py:79-117``)."""

    def setup(self):
        self.output_network = MLP(
            out_channels=1,
            hidden_channels=self.hidden_channels // 2,
            activation=self.activation,
            num_hidden_layers=self.num_hidden_layers,
        )

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        return self.output_network(x)

    def __call__(self, *a, **k):  # for init tracing
        return self.pre_reduce(*a, **k)


class EquivariantScalar(OutputModel):
    """Gated-equivariant energy head (reference ``output_modules.py:120-163``)."""

    def setup(self):
        self.output_network = [
            GatedEquivariantBlock(
                self.hidden_channels,
                self.hidden_channels // 2,
                activation=self.activation,
                scalar_activation=True,
                name="output_network_0",
            ),
            GatedEquivariantBlock(
                self.hidden_channels // 2,
                1,
                activation=self.activation,
                name="output_network_1",
            ),
        ]

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        for layer in self.output_network:
            x, v = layer(x, v)
        # the reference adds v.sum()*0 to tie all params into the graph —
        # unnecessary under jax.grad, but harmless to omit.
        return x

    def __call__(self, *a, **k):
        return self.pre_reduce(*a, **k)


class DipoleMoment(Scalar):
    """COM-referenced dipole magnitude (reference ``:166-206``)."""

    allow_prior_model: bool = False

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        x = self.output_network(x)
        c, _ = _center_of_mass(z, pos, batch, num_mols)
        c_ext = jnp.concatenate([c, jnp.zeros((1, 3), c.dtype)])[
            jnp.minimum(batch, num_mols)
        ]
        return x * (pos - c_ext)

    def post_reduce(self, x):
        return jnp.linalg.norm(x, axis=-1, keepdims=True)


class EquivariantDipoleMoment(EquivariantScalar):
    """Reference ``output_modules.py:209-242``."""

    allow_prior_model: bool = False

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        for layer in self.output_network:
            x, v = layer(x, v)
        c, _ = _center_of_mass(z, pos, batch, num_mols)
        c_ext = jnp.concatenate([c, jnp.zeros((1, 3), c.dtype)])[
            jnp.minimum(batch, num_mols)
        ]
        x = x * (pos - c_ext)
        return x + v.squeeze(-1)

    def post_reduce(self, x):
        return jnp.linalg.norm(x, axis=-1, keepdims=True)


class ElectronicSpatialExtent(OutputModel):
    """Reference ``output_modules.py:245-290``."""

    allow_prior_model: bool = False

    def setup(self):
        self.output_network = MLP(
            out_channels=1,
            hidden_channels=self.hidden_channels // 2,
            activation=self.activation,
            num_hidden_layers=self.num_hidden_layers,
        )

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        x = self.output_network(x)
        c, _ = _center_of_mass(z, pos, batch, num_mols)
        c_ext = jnp.concatenate([c, jnp.zeros((1, 3), c.dtype)])[
            jnp.minimum(batch, num_mols)
        ]
        d = pos - c_ext
        return jnp.sum(d * d, axis=-1, keepdims=True) * x

    def __call__(self, *a, **k):
        return self.pre_reduce(*a, **k)


class EquivariantElectronicSpatialExtent(ElectronicSpatialExtent):
    pass


class EquivariantVectorOutput(EquivariantScalar):
    """Reference ``output_modules.py:297-320``."""

    allow_prior_model: bool = False

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None):
        for layer in self.output_network:
            x, v = layer(x, v)
        return v.squeeze(-1)


def _exp_cutoff(d, rc: float):
    """AIMNet2 short-range damping (reference ``output_modules.py:323-332``)."""
    t = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
    return jnp.exp(-1.0 / (1.0 - t * t)) / 0.36787944117144233


class ScalarPlusWeightedCoulomb(OutputModel):
    """Scalar energy + multi-channel predicted-charge Coulomb energy
    (reference ``output_modules.py:344-609``).

    Expects ``x = [N, hidden + (num_layers+1)·q_dim]`` with the per-layer
    charges appended by TensorNet2.  ``coulomb_cutoff=None`` ⇒ all-to-all
    within each molecule; otherwise a cutoff neighbor list with OpenMM-style
    reaction field (k_rf/c_rf).
    """

    q_dim: int = 16
    num_interaction_layers: int = 2
    q_weights: tuple = ()
    coulomb_cutoff: Optional[float] = None
    coulomb_max_num_neighbors: Optional[int] = None
    coulomb_neighbor_strategy: str = "brute"
    # static cell grid for strategy="cell" under jit (box is a tracer
    # there, so the dims cannot be derived in-trace)
    coulomb_cells_per_dim: Optional[tuple] = None
    coulomb_cell_capacity: int = 64
    # ±S stencil with cutoff/S-wide cells (ops/neighbors.pick_cell_grid):
    # at the Coulomb cutoff this shrinks the candidate width several-fold
    coulomb_cell_stencil: int = 1
    epsilon_solvent: float = 78.3

    # 0.5 · Hartree · Bohr (eV·Å Coulomb constant / 2), reference :397-401
    _FACTOR = 0.5 * 27.211386024367243 * 0.5291772105638411

    def setup(self):
        self.output_network = MLP(
            out_channels=1,
            hidden_channels=self.hidden_channels // 2,
            activation=self.activation,
            num_hidden_layers=self.num_hidden_layers,
        )
        assert len(self.q_weights) == self.num_interaction_layers + 1, (
            "q_weights must have one entry per interaction layer + 1"
        )
        w = np.zeros((self.num_interaction_layers + 1, self.q_dim), np.float32)
        for i in range(self.num_interaction_layers + 1):
            w[i, :] = np.asarray(self.q_weights[i], np.float32)
        self.qweights = jnp.asarray(w.flatten())

    def _coulomb_max_neighbors(self):
        if self.coulomb_max_num_neighbors is not None:
            return int(self.coulomb_max_num_neighbors)
        density = 0.1  # atoms / Å³, water-like (reference :420-423)
        volume = 4.0 / 3.0 * math.pi * self.coulomb_cutoff**3
        # density·volume is the per-row MEAN; real liquid rows exceed it
        # by Poisson fluctuation (measured: max 472 vs mean 419 at
        # rc=10/ρ=0.1, n=2048), and the standalone build has no overflow
        # surface — +35% headroom keeps the default budget complete
        # instead of silently truncating the densest rows.
        return int(density * volume * 1.35) + 16

    def pre_reduce(self, x, v, z, pos, batch, box=None, num_mols=None,
                   nbr=None, win=None):
        charges = x[:, self.hidden_channels:]
        x = x[:, : self.hidden_channels]
        x = self.output_network(x)
        qw = self.qweights.astype(x.dtype)

        if win is not None:
            # Windowed direct-pair tier (ops/pallas_coulomb.py): the MD
            # blocked path plans (±S, rc+skin) stencil windows over the
            # SAME cell-block sort the model already runs in, and the
            # Pallas kernel evaluates all window pairs — no neighbor
            # list, no gather.  ``win`` = (CoulombWindows, spec, wspec).
            import jax

            from torchmdnet_tpu.ops.pallas_coulomb import (
                windowed_coulomb_energy,
            )

            cwin, spec, wspec = win
            factor = self._FACTOR / float(
                sum(float(v_) for row in self.q_weights for v_ in row)
            )
            e_i = windowed_coulomb_energy(
                pos, qw, charges, cwin, spec, wspec,
                float(self.coulomb_cutoff), float(self.epsilon_solvent),
                factor, jax.default_backend() != "tpu",
            )
            return x + e_i[:, None]

        if self.coulomb_cutoff is None:
            if box is not None:
                raise ValueError("PBC is not supported with coulomb_cutoff = None")
            # All-to-all within molecules: full [N, N] masked pair matrix.
            n = pos.shape[0]
            same_mol = batch[:, None] == batch[None, :]
            pair_mask = same_mol & ~jnp.eye(n, dtype=bool)
            if num_mols is not None:
                valid = batch < num_mols
                pair_mask &= valid[:, None] & valid[None, :]
            diff = pos[:, None, :] - pos[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)
            safe = jnp.where(d2 > 0, d2, 1.0)
            d = jnp.sqrt(safe)
            fc = 1.0 - _exp_cutoff(d, 4.6)
            # Σ_c qw_c·q_i[c]·q_j[c] as one [N,C]×[N,C]ᵀ matmul — the
            # [N,N,C] channel product never materializes.
            qq = jnp.einsum("nc,mc->nm", charges * qw, charges)
            e_pair = self._FACTOR * fc * qq / (d * jnp.sum(qw))
            e_i = jnp.sum(jnp.where(pair_mask, e_pair, 0.0), axis=1)
        else:
            if nbr is None:
                # standalone build; MD passes a skin-cached list instead
                # (the energy op re-masks edges beyond the cutoff)
                cell_kwargs = {}
                if self.coulomb_neighbor_strategy == "cell":
                    cell_kwargs = dict(
                        cells_per_dim=self.coulomb_cells_per_dim,
                        cell_capacity=self.coulomb_cell_capacity,
                        stencil=self.coulomb_cell_stencil,
                    )
                nbr = build_neighbor_matrix(
                    pos,
                    batch,
                    strategy=self.coulomb_neighbor_strategy,
                    k_max=self._coulomb_max_neighbors(),
                    cutoff_upper=float(self.coulomb_cutoff),
                    loop=False,
                    box=box,
                    atom_mask=(batch < num_mols) if num_mols is not None
                    else None,
                    **cell_kwargs,
                )
            # Fused pair-energy op (ops/coulomb.py): channel contraction
            # inside the gather consumer (only [N,K] materializes) and a
            # hand-derived gather-only force VJP — the default scatter-add
            # transpose of the neighbor gather dominates the MD step at
            # the 25k/10Å Coulomb config.  Row format holds both edge
            # directions, so summing rows equals the reference's two
            # index_adds over half the edges.
            from torchmdnet_tpu.ops.coulomb import coulomb_cutoff_energy_w

            # static channel-weight total (config-derived, not the traced
            # buffer)
            factor = self._FACTOR / float(
                sum(float(v) for row in self.q_weights for v in row)
            )
            # weighted specialization: a = qw ⊙ charges — its collapsed
            # backward gathers C+4 channels instead of 3+2C and keeps all
            # per-edge reductions minor-axis (ops/coulomb.py)
            e_i = coulomb_cutoff_energy_w(
                pos, qw, charges, nbr.idx, nbr.mask,
                float(self.coulomb_cutoff), float(self.epsilon_solvent),
                factor, box, batch,
            )

        return x + e_i[:, None]

    def __call__(self, *a, **k):
        return self.pre_reduce(*a, **k)


OUTPUT_MODULES = {
    "Scalar": Scalar,
    "EquivariantScalar": EquivariantScalar,
    "DipoleMoment": DipoleMoment,
    "EquivariantDipoleMoment": EquivariantDipoleMoment,
    "ElectronicSpatialExtent": ElectronicSpatialExtent,
    "EquivariantElectronicSpatialExtent": EquivariantElectronicSpatialExtent,
    "EquivariantVectorOutput": EquivariantVectorOutput,
    "ScalarPlusWeightedCoulomb": ScalarPlusWeightedCoulomb,
}
