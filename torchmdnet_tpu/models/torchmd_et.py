"""TorchMD-ET — Equivariant Transformer (Thölke & de Fabritiis, ICLR'22).

Capability parity with the reference ``torchmdnet/models/torchmd_et.py``
(TorchMD_ET:19-239, EquivariantMultiHeadAttention:242-431), rebuilt over
the dense [N, K] neighbor matrix: per-edge dot-product attention becomes a
gather + masked reduction over the K axis (one fused einsum chain per
layer — no scatter in the forward pass).

Direction convention: the reference aggregates messages into
``edge_index[1]`` with sources ``edge_index[0]`` and uses
``d_ij = (pos_src − pos_tgt)/r`` (``torchmd_et.py:368-373,412-414``); the
dense row format stores ``delta = pos_row − pos_neighbor``, so the ET
direction is the negated row delta.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torchmdnet_tpu.models.common import (
    Embedding,
    LayerNorm,
    Linear,
    get_activation,
    make_rbf,
)
from torchmdnet_tpu.ops import rbf as rbf_ops
from torchmdnet_tpu.ops.neighbors import (
    NeighborMatrix,
    build_neighbor_matrix,
    neighbor_geometry,
)


class NeighborEmbedding(nn.Module):
    """Distance-filtered neighbor-type embedding
    (reference ``models/utils.py:45-117``); self loops are excluded."""

    hidden_channels: int
    num_rbf: int
    cutoff_lower: float
    cutoff_upper: float
    max_z: int = 100
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, x, nbr: NeighborMatrix, edge_weight, edge_attr):
        C = rbf_ops.cosine_cutoff(edge_weight, self.cutoff_upper, self.cutoff_lower)
        W = Linear(
            self.hidden_channels, init="xavier_zeros", name="distance_proj",
            dtype=self.dtype,
        )(edge_attr) * C[..., None]
        rows = jnp.arange(nbr.idx.shape[0], dtype=nbr.idx.dtype)[:, None]
        mask = nbr.mask & (nbr.idx != rows)  # remove self loops
        x_nb = Embedding(self.max_z, self.hidden_channels, name="embedding",
                         dtype=self.dtype)(z)
        msg = W * x_nb[nbr.idx] * mask[..., None].astype(x.dtype)
        x_neighbors = jnp.sum(msg, axis=1)
        return Linear(
            self.hidden_channels, init="xavier_zeros", name="combine",
            dtype=self.dtype,
        )(jnp.concatenate([x, x_neighbors], axis=-1))


class EquivariantMultiHeadAttention(nn.Module):
    """Reference ``torchmd_et.py:242-431``."""

    hidden_channels: int
    num_rbf: int
    distance_influence: str = "both"
    num_heads: int = 8
    activation: str = "silu"
    attn_activation: str = "silu"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    vector_cutoff: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, vec, nbr: NeighborMatrix, r_ij, f_ij, d_ij):
        H, F = self.num_heads, self.hidden_channels
        hd = F // H
        act = get_activation(self.activation)
        attn_act = get_activation(self.attn_activation)

        x = LayerNorm(name="layernorm")(x)
        q = Linear(F, init="xavier_zeros", name="q_proj", dtype=self.dtype)(x)
        k = Linear(F, init="xavier_zeros", name="k_proj", dtype=self.dtype)(x)
        v = Linear(3 * F, init="xavier_zeros", name="v_proj", dtype=self.dtype)(x)
        q = q.reshape(-1, H, hd)
        k = k.reshape(-1, H, hd)
        v = v.reshape(-1, H, 3 * hd)

        vecp = Linear(3 * F, use_bias=False, init="xavier_zeros",
                      name="vec_proj", dtype=self.dtype)(vec)
        vec1, vec2, vec3 = jnp.split(vecp, 3, axis=-1)
        vec_heads = vec.reshape(-1, 3, H, hd)
        vec_dot = jnp.sum(vec1 * vec2, axis=1)  # [N, F]

        dk = dv = None
        if self.distance_influence in ("keys", "both"):
            dk = act(
                Linear(F, init="xavier_zeros", name="dk_proj",
                       dtype=self.dtype)(f_ij)
            ).reshape(f_ij.shape[0], f_ij.shape[1], H, hd)
        if self.distance_influence in ("values", "both"):
            dv = act(
                Linear(3 * F, init="xavier_zeros", name="dv_proj",
                       dtype=self.dtype)(f_ij)
            ).reshape(f_ij.shape[0], f_ij.shape[1], H, 3 * hd)

        idx, emask = nbr.idx, nbr.mask
        q_i = q[:, None]  # target = row
        k_j = k[idx]
        v_j = v[idx]
        vec_j = vec_heads[idx]  # [N, K, 3, H, hd]

        attn = (
            jnp.sum(q_i * k_j * dk, axis=-1)
            if dk is not None
            else jnp.sum(q_i * k_j, axis=-1)
        )  # [N, K, H]
        cutoff = rbf_ops.cosine_cutoff(r_ij, self.cutoff_upper, self.cutoff_lower)
        attn = attn_act(attn)
        if self.vector_cutoff:
            # cutoff weights both scalar and vector channels (continuity fix)
            v_j = v_j * cutoff[..., None, None]
            attn = attn * emask.astype(attn.dtype)[..., None]
        else:
            attn = attn * (cutoff * emask.astype(cutoff.dtype))[..., None]
        if dv is not None:
            v_j = v_j * dv
        xe, vec1e, vec2e = jnp.split(v_j, 3, axis=-1)  # each [N, K, H, hd]

        if self.vector_cutoff:
            # emask was folded into attn above; the vector message needs it too
            pass
        xm = jnp.sum(xe * attn[..., None], axis=1)  # [N, H, hd]
        # vector message; ET direction = −(row delta)
        vmsg = vec_j * vec1e[:, :, None] + vec2e[:, :, None] * (-d_ij)[..., None, None]
        vmsg = vmsg * emask[..., None, None, None].astype(vmsg.dtype)
        if self.vector_cutoff:
            pass  # cutoff already inside v_j
        vm = jnp.sum(vmsg, axis=1)  # [N, 3, H, hd]

        xm = xm.reshape(-1, F)
        vm = vm.reshape(-1, 3, F)

        o1, o2, o3 = jnp.split(
            Linear(3 * F, init="xavier_zeros", name="o_proj",
                   dtype=self.dtype)(xm),
            3, axis=-1,
        )
        dx = vec_dot * o2 + o3
        dvec = vec3 * o1[:, None, :] + vm
        return dx, dvec


class TorchMD_ET(nn.Module):
    """Reference ``torchmd_et.py:19-239``; returns (x, vec)."""

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
    vector_cutoff: bool = False
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
        if self.distance_influence not in ("keys", "values", "both", "none"):
            raise ValueError(self.distance_influence)
        F = self.hidden_channels
        x = Embedding(self.max_z, F, name="embedding", dtype=self.dtype)(z)
        if nbr is None:
            nbr = self.build_neighbors(pos, batch, box=box, atom_mask=atom_mask)
        delta, dist = neighbor_geometry(pos, nbr, box=box, batch=batch)

        edge_attr = make_rbf(
            self.rbf_type, self.cutoff_lower, self.cutoff_upper,
            self.num_rbf, self.trainable_rbf, name="distance_expansion",
            initial_values=self.rbf_initial,
        )(dist)
        # normalize non-self edge vectors; self loops keep the zero vector
        # (reference :207-208)
        safe = jnp.where(dist > 0, dist, 1.0)
        edge_vec_norm = delta / safe[..., None]

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

        vec = jnp.zeros((x.shape[0], 3, F), x.dtype)
        for i in range(self.num_layers):
            dx, dvec = EquivariantMultiHeadAttention(
                hidden_channels=F,
                num_rbf=self.num_rbf,
                distance_influence=self.distance_influence,
                num_heads=self.num_heads,
                activation=self.activation,
                attn_activation=self.attn_activation,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                vector_cutoff=self.vector_cutoff,
                name=f"attention_layers_{i}",
                dtype=self.dtype,
            )(x, vec, nbr, dist, edge_attr, edge_vec_norm)
            x = x + dx
            vec = vec + dvec
        x = LayerNorm(name="out_norm")(x)
        return x, vec
