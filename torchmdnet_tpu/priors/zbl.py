"""Ziegler-Biersack-Littmark screened nuclear repulsion
(reference ``torchmdnet/priors/zbl.py``)."""

from typing import Tuple

import jax.numpy as jnp

from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix, neighbor_geometry
from torchmdnet_tpu.ops.rbf import cosine_cutoff
from torchmdnet_tpu.ops.segment import segment_sum
from torchmdnet_tpu.priors.base import BasePrior


class ZBL(BasePrior):
    """Universal 4-exponential screening function, cosine-cutoff windowed,
    unit-converted through the dataset's distance/energy scales
    (reference ``zbl.py:74-112``).

    ``atomic_number[z]`` maps atom *types* to true atomic numbers.
    """

    cutoff_distance: float = 4.0
    max_num_neighbors: int = 32
    atomic_number: Tuple[int, ...] = ()
    distance_scale: float = 1e-10
    energy_scale: float = 1.0

    def post_reduce(self, y, z, pos, batch, box=None, extra_args=None, num_mols=None):
        num_mols = num_mols if num_mols is not None else int(y.shape[0])
        atom_mask = batch < num_mols
        nbr = build_neighbor_matrix(
            pos,
            batch,
            strategy="brute",
            k_max=self.max_num_neighbors,
            cutoff_upper=float(self.cutoff_distance),
            loop=False,
            box=box,
            atom_mask=atom_mask,
        )
        _, dist = neighbor_geometry(pos, nbr, box=box, batch=batch)
        zmap = jnp.asarray(self.atomic_number, jnp.int32)
        zi = zmap[z][:, None].astype(pos.dtype)  # [N, 1]
        zj = zmap[z][nbr.idx].astype(pos.dtype)  # [N, K]
        # 0.8854·a0 / (Zi^0.23 + Zj^0.23); Bohr radius in meters.
        a = 0.8854 * 5.29177210903e-11 / (zi**0.23 + zj**0.23)
        safe_d = jnp.where(dist > 0, dist, 1.0)
        d = safe_d * self.distance_scale / a
        f = (
            0.1818 * jnp.exp(-3.2 * d)
            + 0.5099 * jnp.exp(-0.9423 * d)
            + 0.2802 * jnp.exp(-0.4029 * d)
            + 0.02817 * jnp.exp(-0.2016 * d)
        )
        f = f * cosine_cutoff(dist, float(self.cutoff_distance))
        e_pair = jnp.where(nbr.mask, f * zi * zj / safe_d, 0.0)
        # 0.5× because the row format holds both directions of each pair.
        scale = 0.5 * (2.30707755e-28 / self.energy_scale / self.distance_scale)
        e_atom = jnp.sum(e_pair, axis=1)
        e_mol = scale * segment_sum(e_atom, batch, num_mols + 1)[:num_mols]
        return y + e_mol.reshape(y.shape).astype(y.dtype)

    def get_init_args(self):
        return {
            "cutoff_distance": self.cutoff_distance,
            "max_num_neighbors": self.max_num_neighbors,
            "atomic_number": list(self.atomic_number),
            "distance_scale": self.distance_scale,
            "energy_scale": self.energy_scale,
        }
