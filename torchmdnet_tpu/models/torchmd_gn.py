"""TorchMD-GN — SchNet-style graph network with continuous-filter
convolutions (reference ``torchmdnet/models/torchmd_gn.py``; deprecated in
the reference, kept for capability parity).

CFConv messages aggregate into ``edge_index[0]`` with sources
``edge_index[1]`` (``torchmd_gn.py:325-336``) = dense row orientation;
``aggr`` ∈ {add, mean, max} over the K axis with masking.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from torchmdnet_tpu.models.common import (
    Embedding,
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


class CFConv(nn.Module):
    """Reference ``torchmd_gn.py:291-336``."""

    hidden_channels: int
    num_filters: int
    activation: str
    cutoff_lower: float
    cutoff_upper: float
    aggr: str = "add"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbr: NeighborMatrix, edge_weight, edge_attr):
        act = get_activation(self.activation)
        # filter net (InteractionBlock.mlp, xavier+zeros)
        W = act(Linear(self.num_filters, init="xavier_zeros", name="net_0",
                       dtype=self.dtype)(edge_attr))
        W = Linear(self.num_filters, init="xavier_zeros", name="net_2",
                   dtype=self.dtype)(W)
        C = rbf_ops.cosine_cutoff(edge_weight, self.cutoff_upper, self.cutoff_lower)
        W = W * C[..., None]

        h = Linear(self.num_filters, use_bias=False, init="xavier_zeros",
                   name="lin1", dtype=self.dtype)(x)
        msg = W * h[nbr.idx]
        m = nbr.mask[..., None].astype(msg.dtype)
        if self.aggr == "add":
            out = jnp.sum(msg * m, axis=1)
        elif self.aggr == "mean":
            # reference scatter-mean includes the zero init value
            # (denominator = count + 1; see ops/segment.py docstring)
            out = jnp.sum(msg * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1) + 1.0, 1.0
            )
        elif self.aggr == "max":
            neg_inf = jnp.asarray(-jnp.inf, msg.dtype)
            masked = jnp.where(m > 0, msg, neg_inf)
            out = jnp.max(masked, axis=1)
            out = jnp.where(jnp.sum(m, axis=1) > 0, out, 0.0)
        else:
            raise ValueError(self.aggr)
        return Linear(self.hidden_channels, init="xavier_zeros", name="lin2",
                      dtype=self.dtype)(out)


class InteractionBlock(nn.Module):
    """Reference ``torchmd_gn.py:230-288``."""

    hidden_channels: int
    num_filters: int
    activation: str
    cutoff_lower: float
    cutoff_upper: float
    aggr: str = "add"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbr, edge_weight, edge_attr):
        act = get_activation(self.activation)
        x = CFConv(
            hidden_channels=self.hidden_channels,
            num_filters=self.num_filters,
            activation=self.activation,
            cutoff_lower=self.cutoff_lower,
            cutoff_upper=self.cutoff_upper,
            aggr=self.aggr,
            name="conv",
            dtype=self.dtype,
        )(x, nbr, edge_weight, edge_attr)
        x = act(x)
        return Linear(self.hidden_channels, init="xavier_zeros", name="lin",
                      dtype=self.dtype)(x)


class TorchMD_GN(nn.Module):
    """Reference ``torchmd_gn.py:18-228``; returns (x, None).

    Note: the CFConv filter-MLP weights live under
    ``interactions.{i}.mlp.{0,2}`` in torch state dicts but are consumed by
    ``conv.net`` — our flax path is ``interactions_{i}/conv/net_{0,2}``;
    the checkpoint converter handles the alias.
    """

    hidden_channels: int = 128
    num_filters: int = 128
    num_layers: int = 6
    num_rbf: int = 50
    rbf_type: str = "expnorm"
    trainable_rbf: bool = True
    rbf_initial: Optional[tuple] = None
    activation: str = "silu"
    neighbor_embedding: bool = True
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    max_z: int = 100
    max_num_neighbors: int = 32
    aggr: str = "add"
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
            loop=False,
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
            x = x + InteractionBlock(
                hidden_channels=F,
                num_filters=self.num_filters,
                activation=self.activation,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                aggr=self.aggr,
                name=f"interactions_{i}",
                dtype=self.dtype,
            )(x, nbr, dist, edge_attr)
        return x, None
