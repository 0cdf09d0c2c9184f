"""Grimme DFT-D2 dispersion correction (reference ``torchmdnet/priors/d2.py``)."""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix, neighbor_geometry
from torchmdnet_tpu.ops.segment import segment_sum
from torchmdnet_tpu.priors.base import BasePrior

# C_6 (J/mol·nm⁶) and vdW radii (Å, converted to nm below) for Z = 1..54,
# Grimme 2006 Table 1 (reference ``d2.py:49-109``).  Index 0 is NaN.
# fmt: off
_C6_TABLE = [
    np.nan,
    0.14, 0.08, 1.61, 1.61, 3.13, 1.75, 1.23, 0.70, 0.75, 0.63,
    5.71, 5.71, 10.79, 9.23, 7.84, 5.57, 5.07, 4.61, 10.80, 10.80,
    10.80, 10.80, 10.80, 10.80, 10.80, 10.80, 10.80, 10.80, 10.80, 10.80,
    16.99, 17.10, 16.37, 12.64, 12.47, 12.01, 24.67, 24.67, 24.67, 24.67,
    24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 24.67, 37.32, 38.71,
    38.44, 31.74, 31.50, 29.99,
]
_RR_TABLE = [
    np.nan,
    1.001, 1.012, 0.825, 1.408, 1.485, 1.452, 1.397, 1.342, 1.287, 1.243,
    1.144, 1.364, 1.639, 1.716, 1.705, 1.683, 1.639, 1.595, 1.485, 1.474,
    1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562, 1.562,
    1.650, 1.727, 1.760, 1.771, 1.749, 1.727, 1.628, 1.606, 1.639, 1.639,
    1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.639, 1.672, 1.804,
    1.881, 1.892, 1.892, 1.881,
]
# fmt: on

C_6 = np.asarray(_C6_TABLE, np.float64)
R_R = np.asarray(_RR_TABLE, np.float64) * 0.1  # Å → nm


class D2(BasePrior):
    """Fermi-damped C6/R⁶ dispersion with element parameters for Z ≤ 54
    (reference ``d2.py:110-201``); ``d = 20``, ``s6 = 1``."""

    cutoff_distance: float = 10.0
    max_num_neighbors: int = 128
    atomic_number: Tuple[int, ...] = ()
    distance_scale: float = 1e-10
    energy_scale: float = 1.0
    d: float = 20.0
    s_6: float = 1.0

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

        distance_scale = self.distance_scale * 1e9  # m → nm
        energy_scale = self.energy_scale * 6.02214076e23  # J → J/mol
        r = dist * distance_scale

        zmap = jnp.asarray(self.atomic_number, jnp.int32)
        Z = zmap[z]
        c6 = jnp.asarray(C_6, pos.dtype)
        rr = jnp.asarray(R_R, pos.dtype)
        c6_ij = jnp.sqrt(c6[Z][:, None] * c6[Z][nbr.idx])
        rr_ij = rr[Z][:, None] + rr[Z][nbr.idx]

        safe_r = jnp.where(r > 0, r, 1.0)
        f_damp = 1.0 / (1.0 + jnp.exp(-self.d * (safe_r / rr_ij - 1.0)))
        e_pair = jnp.where(nbr.mask, c6_ij / safe_r**6 * f_damp, 0.0)
        # -s6 × and 0.5× for double-counted pairs (reference :189-196).
        e_mol = (
            -self.s_6
            * 0.5
            * segment_sum(jnp.sum(e_pair, axis=1), batch, num_mols + 1)[:num_mols]
        )
        return y + (e_mol / energy_scale).reshape(y.shape).astype(y.dtype)

    def get_init_args(self):
        return {
            "cutoff_distance": self.cutoff_distance,
            "max_num_neighbors": self.max_num_neighbors,
            "atomic_number": list(self.atomic_number),
            "distance_scale": self.distance_scale,
            "energy_scale": self.energy_scale,
        }
