"""Cosine-switched Coulomb prior using dataset partial charges
(reference ``torchmdnet/priors/coulomb.py``)."""

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix, neighbor_geometry
from torchmdnet_tpu.ops.segment import segment_sum
from torchmdnet_tpu.priors.base import BasePrior


class Coulomb(BasePrior):
    """Coulomb energy from ``extra_args['partial_charges']``, switched on
    between lower/upper switch distances (reference ``coulomb.py:107-125``).

    The reference computes in nanometers (positions × 1e9·distance_scale)
    with an *unbounded* cutoff (``torch.inf``) — i.e. all-to-all within each
    molecule, capped at ``max_num_neighbors``.
    """

    lower_switch_distance: float = 0.0
    upper_switch_distance: float = 1.0
    max_num_neighbors: int = 32
    distance_scale: float = 1e-10
    energy_scale: float = 1.0

    def post_reduce(self, y, z, pos, batch, box=None, extra_args=None, num_mols=None):
        num_mols = num_mols if num_mols is not None else int(y.shape[0])
        atom_mask = batch < num_mols
        x = 1e9 * self.distance_scale * pos  # → nm
        nbr = build_neighbor_matrix(
            x,
            batch,
            strategy="brute",
            k_max=self.max_num_neighbors,
            cutoff_upper=float(np.finfo(np.float32).max) ** 0.5,
            loop=False,
            box=box,
            atom_mask=atom_mask,
        )
        _, dist = neighbor_geometry(x, nbr, box=box, batch=batch)
        q = extra_args["partial_charges"].astype(pos.dtype)
        qi = q[:, None]
        qj = q[nbr.idx]
        lower = self.lower_switch_distance
        upper = self.upper_switch_distance
        phase = (jnp.clip(dist, lower, upper) - lower) / (upper - lower)
        safe_d = jnp.where(dist > 0, dist, 1.0)
        e_pair = (0.5 - 0.5 * jnp.cos(jnp.pi * phase)) * qi * qj / safe_d
        e_pair = jnp.where(nbr.mask, e_pair, 0.0)
        scale = 0.5 * (2.30707e-28 / self.energy_scale / self.distance_scale)
        e_mol = scale * segment_sum(
            jnp.sum(e_pair, axis=1), batch, num_mols + 1
        )[:num_mols]
        return y + e_mol.reshape(y.shape).astype(y.dtype)

    def get_init_args(self):
        return {
            "lower_switch_distance": self.lower_switch_distance,
            "upper_switch_distance": self.upper_switch_distance,
            "max_num_neighbors": self.max_num_neighbors,
            "distance_scale": self.distance_scale,
            "energy_scale": self.energy_scale,
        }
