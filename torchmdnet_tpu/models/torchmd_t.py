"""TorchMD-T — invariant Transformer (deprecated in the reference but kept
for capability parity; reference ``torchmdnet/models/torchmd_t.py``).

Attention aggregates into ``edge_index[0]`` with sources ``edge_index[1]``
(``torchmd_t.py:324-338``) — exactly the dense row format's row/neighbor
orientation.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from torchmdnet_tpu.models.common import (
    Embedding,
    LayerNorm,
    Linear,
    get_activation,
    make_rbf,
)
from torchmdnet_tpu.models.torchmd_et import NeighborEmbedding
from torchmdnet_tpu.ops import rbf as rbf_ops
from torchmdnet_tpu.ops.neighbors import (
    NeighborMatrix,
    build_neighbor_matrix,
    neighbor_geometry,
)


class MultiHeadAttention(nn.Module):
    """Reference ``torchmd_t.py:224-338``."""

    hidden_channels: int
    num_rbf: int
    distance_influence: str = "both"
    num_heads: int = 8
    activation: str = "silu"
    attn_activation: str = "silu"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbr: NeighborMatrix, r_ij, f_ij):
        H, F = self.num_heads, self.hidden_channels
        hd = F // H
        act = get_activation(self.activation)
        attn_act = get_activation(self.attn_activation)

        x = LayerNorm(name="layernorm")(x)
        q = Linear(F, init="xavier_zeros", name="q_proj", dtype=self.dtype)(x)
        k = Linear(F, init="xavier_zeros", name="k_proj", dtype=self.dtype)(x)
        v = Linear(F, init="xavier_zeros", name="v_proj", dtype=self.dtype)(x)
        q = q.reshape(-1, H, hd)
        k = k.reshape(-1, H, hd)
        v = v.reshape(-1, H, hd)

        dk = dv = None
        if self.distance_influence in ("keys", "both"):
            dk = act(
                Linear(F, init="xavier_zeros", name="dk_proj",
                       dtype=self.dtype)(f_ij)
            ).reshape(f_ij.shape[0], f_ij.shape[1], H, hd)
        if self.distance_influence in ("values", "both"):
            dv = act(
                Linear(F, init="xavier_zeros", name="dv_proj",
                       dtype=self.dtype)(f_ij)
            ).reshape(f_ij.shape[0], f_ij.shape[1], H, hd)

        idx, emask = nbr.idx, nbr.mask
        q_i = q[:, None]
        k_j = k[idx]
        v_j = v[idx]
        attn = (
            jnp.sum(q_i * k_j * dk, axis=-1)
            if dk is not None
            else jnp.sum(q_i * k_j, axis=-1)
        )
        cutoff = rbf_ops.cosine_cutoff(r_ij, self.cutoff_upper, self.cutoff_lower)
        attn = attn_act(attn) * (cutoff * emask.astype(cutoff.dtype))[..., None]
        if dv is not None:
            v_j = v_j * dv
        out = jnp.sum(v_j * attn[..., None], axis=1).reshape(-1, F)
        return Linear(F, init="xavier_zeros", name="o_proj",
                      dtype=self.dtype)(out)


class TorchMD_T(nn.Module):
    """Reference ``torchmd_t.py:20-205``; returns (x, None)."""

    hidden_channels: int = 128
    num_layers: int = 6
    num_rbf: int = 50
    rbf_type: str = "expnorm"
    trainable_rbf: bool = True
    rbf_initial: Optional[tuple] = None
    activation: str = "silu"
    attn_activation: str = "silu"
    neighbor_embedding: bool = True
    num_heads: int = 8
    distance_influence: str = "both"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    max_z: int = 100
    max_num_neighbors: int = 32
    neighbor_strategy: str = "brute"
    cells_per_dim: Optional[tuple] = None  # static grid for "cell" under jit
    cell_capacity: int = 64
    dtype: Optional[jnp.dtype] = None

    def build_neighbors(self, pos, batch, box=None, atom_mask=None):
        kwargs = {}
        if self.neighbor_strategy == "cell":
            kwargs = dict(cells_per_dim=self.cells_per_dim,
                          cell_capacity=self.cell_capacity)
        return build_neighbor_matrix(
            pos, batch,
            strategy=self.neighbor_strategy,
            k_max=self.max_num_neighbors,
            cutoff_upper=self.cutoff_upper,
            cutoff_lower=self.cutoff_lower,
            loop=True,
            box=box,
            atom_mask=atom_mask,
            **kwargs,
        )

    @nn.compact
    def __call__(self, z, pos, batch, box=None, q=None, s=None,
                 atom_mask=None, nbr: Optional[NeighborMatrix] = None,
                 num_mols: Optional[int] = None):
        F = self.hidden_channels
        x = Embedding(self.max_z, F, name="embedding", dtype=self.dtype)(z)
        if nbr is None:
            nbr = self.build_neighbors(pos, batch, box=box, atom_mask=atom_mask)
        _, dist = neighbor_geometry(pos, nbr, box=box, batch=batch)
        edge_attr = make_rbf(
            self.rbf_type, self.cutoff_lower, self.cutoff_upper,
            self.num_rbf, self.trainable_rbf, name="distance_expansion",
            initial_values=self.rbf_initial,
        )(dist)

        if self.neighbor_embedding:
            x = NeighborEmbedding(
                hidden_channels=F,
                num_rbf=self.num_rbf,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                max_z=self.max_z,
                name="neighbor_embedding",
                dtype=self.dtype,
            )(z, x, nbr, dist, edge_attr)

        for i in range(self.num_layers):
            x = x + MultiHeadAttention(
                hidden_channels=F,
                num_rbf=self.num_rbf,
                distance_influence=self.distance_influence,
                num_heads=self.num_heads,
                activation=self.activation,
                attn_activation=self.attn_activation,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                name=f"attention_layers_{i}",
                dtype=self.dtype,
            )(x, nbr, dist, edge_attr)
        x = LayerNorm(name="out_norm")(x)
        return x, None
