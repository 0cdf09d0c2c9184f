"""TensorNet2 — TensorNet + AIMNet2-style neutral charge equilibration.

Capability parity with the reference ``torchmdnet/models/tensornet2.py``
(ChargePredict:49-156, TensorNet2:159-462, Interaction:465-626): per-layer
MLPs predict multi-channel partial charges that are redistributed so each
molecule's channel sums equal its total charge Q (qeq); the charges feed
back into the interaction layers as edge features and are appended to the
node features for the Coulomb output module.

TPU-first notes: ``mol_sum`` is a static-shape ``segment_sum`` (the
reference's CUDA-graph-aware ``dim_size`` caching, ``tensornet2.py:65-100``,
is unnecessary under jit); ghost/padding atoms live in an extra segment
that every per-molecule sum simply ignores.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torchmdnet_tpu.models.common import MLP, LayerNorm, get_activation, make_rbf
from torchmdnet_tpu.models.tensornet import (
    TensorEmbedding,
    edge_message_passing,
    linear_irreps,
)
from torchmdnet_tpu.ops import rbf as rbf_ops
from torchmdnet_tpu.ops.message_passing import gather_nodes, reverse_slots
from torchmdnet_tpu.ops.neighbors import (
    NeighborMatrix,
    build_neighbor_matrix,
    neighbor_geometry,
)
from torchmdnet_tpu.ops.segment import segment_sum
from torchmdnet_tpu.ops.tensor_algebra import (
    Irreps,
    compose_tensor,
    decompose_tensor,
    irreps_norm2,
    irreps_norm3,
    tensor_frobenius_norm2,
    tensor_matmul_o3,
    tensor_matmul_so3,
)


class ChargePredict(nn.Module):
    """Charge head + neutral charge equilibration
    (reference ``tensornet2.py:49-156``)."""

    hidden_channels: int
    activation: str = "silu"
    q_dim: int = 16

    def setup(self):
        self.q_norm = LayerNorm()
        self.q_mlp = MLP(
            out_channels=2 * self.q_dim,
            hidden_channels=self.hidden_channels,
            activation=self.activation,
            num_hidden_layers=1,
        )

    def qeq(self, old_charges, f, batch, Q_atom, num_mols: int):
        """new = q + f²/(Σ_mol f² + ε) · (Q - Σ_mol q)
        (reference ``tensornet2.py:102-140``)."""
        f_u = f * f
        eps = 1.0e-6
        F_u = segment_sum(f_u, batch, num_mols + 1) + eps  # [B+1, qdim]
        Q_u = segment_sum(old_charges, batch, num_mols + 1)
        dQ = Q_atom[:, None] - Q_u[batch]
        frac = f_u / F_u[batch]
        return old_charges + frac * dQ

    def __call__(self, X: Irreps, batch, Q_atom, num_mols: int):
        # Feature: (I, ‖A‖², ‖S‖²) — raw I here, unlike the readout's 3I²
        # (reference :142-150).
        nI, nA, nS = irreps_norm2(X)
        x = jnp.concatenate([X.I, nA, nS], axis=-1)
        cf = self.q_mlp(self.q_norm(x))
        charges, f = cf[:, : self.q_dim], cf[:, self.q_dim:]
        return self.qeq(charges, f, batch, Q_atom, num_mols)


class Interaction2(nn.Module):
    """TensorNet2 interaction layer: rbf ⊕ charge-pair edge features, no
    (1+0.1q) scaling (reference ``tensornet2.py:465-626``)."""

    hidden_channels: int
    num_rbf: int
    q_dim: int
    activation: str = "silu"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 4.5
    equivariance_invariance_group: str = "O(3)"
    dtype: Optional[jnp.dtype] = None
    pallas_edge_mlp: bool = False  # fused VMEM-resident edge MLP (f32/silu)
    cell_block_spec: Optional[tuple] = None  # CellBlockSpec (static)
    # θ-tabulated base for the blocked q-tier (Chebyshev terms; 0 = exact
    # rbf operand).  With tabulation the [N, K, R] rbf array and its
    # backward cotangent never exist in HBM — required for the grouped
    # (K'≈3.3K) layout at 25k, and less traffic everywhere.
    q_tab: int = 64

    @nn.compact
    def __call__(self, X: Irreps, charges, nbr: NeighborMatrix, edge_weight,
                 edge_attr, rev_slot=None, blocked=None, rbf_nodes=None):
        from torchmdnet_tpu.models.common import Linear

        if rev_slot is None:
            rev_slot = reverse_slots(nbr.idx, nbr.mask)
        F = self.hidden_channels
        act = get_activation(self.activation)
        C = rbf_ops.cosine_cutoff(edge_weight, self.cutoff_upper, self.cutoff_lower)

        # Charge-fold of the first edge linear (parameters unchanged):
        # W1·[rbf; q_i; q_j] = rbf·W1a + (q·W1b + b1)[i] + (q·W1c)[j].
        # The naive path gathers q_j as [N,K,q_dim] — 64 B rows that XLA
        # lane-pads 8x and shuffles through {0,2,1} layout copies (~36
        # ms/step at the 25k MD config, device trace 2026-08-17); the fold
        # replaces it with one lane-aligned [N,F]-row gather and drops the
        # [N,K,R+2Q] concat entirely.
        from torchmdnet_tpu.models.common import LinearParams
        from torchmdnet_tpu.ops.config import get_matmul_precision

        R = self.num_rbf if edge_attr is None else edge_attr.shape[-1]
        Q = charges.shape[-1]
        w1, b1 = LinearParams(R + 2 * Q, F, name="linears_scalar_0")()
        cdt = (self.dtype if self.dtype is not None
               else (edge_weight if edge_attr is None else edge_attr).dtype)
        w1, b1 = w1.astype(cdt), b1.astype(cdt)
        qc = charges.astype(cdt)
        hi = get_matmul_precision()
        u_i = qc @ w1[R:R + Q] + b1  # bias folded into the i-term
        u_j = qc @ w1[R + Q:]

        # Fused charge-fold MP tier (ops/pallas_blocked_mp.py q-tier): the
        # whole edge-MLP tail is evaluated inside the window MP kernel, so
        # neither attr nor attr_rev ([N, K, 3F] x2 ~ 7.4 GB/pass HBM
        # traffic at the 25k north-star config) ever materializes.
        # First-order VJP only — the MD force path; force training uses
        # the packed XLA path below.  Grouped (column-partitioned) specs
        # run the per-column kernels: gather FLOPs ∝ W/9.  Reference
        # analog: the Warp gather MP consumed by
        # ``torchmdnet/models/tensornet2.py:546-557``.
        use_q_kernel = (
            blocked is not None
            and self.cell_block_spec is not None
            and self.activation == "silu"
            and self.dtype is None
            and edge_weight.dtype == jnp.float32
        )
        if edge_attr is None:  # dual-list mode: θ-tab q path only
            assert use_q_kernel and self.q_tab and rbf_nodes is not None, (
                "edge_attr=None requires the θ-tabulated blocked q-tier")
        if use_q_kernel:
            from jax.ad_checkpoint import checkpoint_name

            from torchmdnet_tpu.ops.pallas_blocked_mp import (
                blocked_neighbor_sum_asym_q,
                blocked_neighbor_sum_asym_q_tab,
            )

            w2, b2 = LinearParams(F, 2 * F, name="linears_scalar_1")()
            w3, b3 = LinearParams(2 * F, 3 * F, name="linears_scalar_2")()
            cwfm = C * nbr.mask.astype(jnp.float32)

            normp1 = tensor_frobenius_norm2(X) + 1.0
            X = Irreps(X.I / normp1, X.A / normp1[:, None, :],
                       X.S / normp1[:, None, :])
            Y = linear_irreps(
                X, ["linears_tensor_0", "linears_tensor_1",
                    "linears_tensor_2"], dtype=self.dtype)
            n = Y.I.shape[0]
            feats9 = jnp.concatenate(
                [Y.I, Y.A.reshape(n, 3 * F), Y.S.reshape(n, 5 * F)],
                axis=-1)
            interp = jax.default_backend() != "tpu"
            # NOTE: blocked_neighbor_sum_asym_q requires edge_attr and
            # cwfm direction-SYMMETRIC (equal on both slots of a pair) —
            # holds here because both are functions of the pair distance
            # only (rbf(d) and C(d)·mask).  Do not pass direction-
            # dependent edge values through this op: the mirrored du_j
            # backward pass would silently read the wrong side.
            if self.q_tab and rbf_nodes is not None:
                from torchmdnet_tpu.ops.cheb import cheb_fit_matrix

                # base(d) = rbf(d)·W1a as a T-term Chebyshev series on
                # [lo, hi]; the fit is one [T, T]·[T, F] matmul per step
                T = rbf_nodes.shape[0]
                coeffs = jnp.einsum(
                    "ts,sf->tf", cheb_fit_matrix(T),
                    rbf_nodes.astype(jnp.float32) @ w1[:R],
                    precision=jax.lax.Precision.HIGHEST)
                msg9 = blocked_neighbor_sum_asym_q_tab(
                    edge_weight, cwfm, u_i, u_j, feats9, nbr.mask,
                    nbr.idx, rev_slot, blocked.rel, blocked.run_starts,
                    coeffs, w2, b2, w3, b3, self.cell_block_spec,
                    self.cutoff_lower, self.cutoff_upper, interp)
            else:
                msg9 = blocked_neighbor_sum_asym_q(
                    edge_attr, cwfm, u_i, u_j, feats9, nbr.mask, nbr.idx,
                    rev_slot, blocked.rel, blocked.run_starts,
                    w1[:R], w2, b2, w3, b3, self.cell_block_spec, interp)
            msg9 = checkpoint_name(msg9, "pns_out")
            M = Irreps(msg9[:, :F], msg9[:, F:4 * F].reshape(n, 3, F),
                       msg9[:, 4 * F:].reshape(n, 5, F))
            return self._mix_and_update(X, Y, M)

        uj_e = gather_nodes(u_j, nbr.idx, rev_slot, nbr.mask)
        base = jnp.einsum("nkr,rf->nkf", edge_attr.astype(cdt), w1[:R],
                          precision=hi)
        pre1 = base + u_i[:, None, :] + uj_e
        # Reverse-edge weights for the scatter-free asymmetric MP backward
        # (ops/message_passing.py::packed_neighbor_sum_asym): same MLP,
        # same distance factor, (q_i, q_j) roles swapped.  Dead code
        # outside the backward pass under the selective-remat policy.
        ui_e = gather_nodes(u_i, nbr.idx, rev_slot, nbr.mask)
        pre1_rev = base + u_j[:, None, :] + ui_e
        use_pallas = (
            self.pallas_edge_mlp
            and self.activation == "silu"
            and pre1.dtype == jnp.float32
            and self.dtype is None
        )
        cw = C * nbr.mask.astype(pre1.dtype)
        if use_pallas:
            # Remaining 2-layer chain in VMEM per edge tile; only the
            # final [N,K,3F] is written.
            from torchmdnet_tpu.ops.pallas_kernels import fused_edge_mlp_pre

            w2, b2 = LinearParams(F, 2 * F, name="linears_scalar_1")()
            w3, b3 = LinearParams(2 * F, 3 * F, name="linears_scalar_2")()
            interp = jax.default_backend() != "tpu"
            attr = fused_edge_mlp_pre(pre1, cw, w2, b2, w3, b3, interp)
            attr_rev = fused_edge_mlp_pre(pre1_rev, cw, w2, b2, w3, b3,
                                          interp)
        else:
            l2 = Linear(2 * F, name="linears_scalar_1", dtype=self.dtype)
            l3 = Linear(3 * F, name="linears_scalar_2", dtype=self.dtype)

            def mlp_tail(p):
                h = act(l3(act(l2(act(p)))))
                return h * cw[..., None]

            attr = mlp_tail(pre1)
            attr_rev = mlp_tail(pre1_rev)

        normp1 = tensor_frobenius_norm2(X) + 1.0
        X = Irreps(X.I / normp1, X.A / normp1[:, None, :], X.S / normp1[:, None, :])

        Y = linear_irreps(
            X, ["linears_tensor_0", "linears_tensor_1", "linears_tensor_2"],
            dtype=self.dtype,
        )
        M = edge_message_passing(attr, Y, nbr, rev_slot, attr_rev=attr_rev,
                                 blocked=blocked,
                                 block_spec=self.cell_block_spec)
        return self._mix_and_update(X, Y, M)

    def _mix_and_update(self, X: Irreps, Y: Irreps, M: Irreps):
        # plain helper invoked from the @nn.compact __call__ (params
        # created here register under the same compact scope)
        Yf = compose_tensor(Y)
        Mf = compose_tensor(M)
        if self.equivariance_invariance_group == "O(3)":
            Cf = tensor_matmul_o3(Yf, Mf)
        else:
            Cf = 2.0 * tensor_matmul_so3(Yf, Mf)
        B = decompose_tensor(Cf)
        np1 = tensor_frobenius_norm2(B) + 1.0
        B = Irreps(B.I / np1, B.A / np1[:, None, :], B.S / np1[:, None, :])
        dX = linear_irreps(
            B, ["linears_tensor_3", "linears_tensor_4", "linears_tensor_5"],
            dtype=self.dtype,
        )
        dXf = compose_tensor(dX)
        dX2 = decompose_tensor(tensor_matmul_so3(dXf, dXf))
        return Irreps(X.I + dX.I + dX2.I, X.A + dX.A + dX2.A,
                      X.S + dX.S + dX2.S)


class TensorNet2(nn.Module):
    """Representation model with charge equilibration
    (reference ``tensornet2.py:159-462``).  When ``output_charges`` the
    per-layer charges are appended to the node features for
    ScalarPlusWeightedCoulomb."""

    hidden_channels: int = 128
    q_dim: int = 16
    num_layers: int = 2
    num_rbf: int = 32
    rbf_type: str = "expnorm"
    trainable_rbf: bool = False
    rbf_initial: Optional[tuple] = None
    activation: str = "silu"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 4.5
    max_num_neighbors: int = 64
    max_z: int = 128
    equivariance_invariance_group: str = "O(3)"
    output_charges: bool = False
    neighbor_strategy: str = "brute"
    cells_per_dim: Optional[tuple] = None  # static grid for "cell" under jit
    cell_capacity: int = 64
    dtype: Optional[jnp.dtype] = None
    remat: bool = False  # selective remat: save neighbor sums, recompute rest
    pallas_edge_mlp: bool = False  # fused Pallas edge MLP (f32/silu only)
    pallas_embedding: bool = False  # fused radial-embedding kernel (f32)
    cell_block_spec: Optional[tuple] = None  # blocked MP tier (static spec)
    q_tab: int = 64  # θ-tabulated q-tier base (0 = exact rbf operand)

    def build_neighbors(self, pos, batch, box=None, atom_mask=None) -> NeighborMatrix:
        kwargs = {}
        if self.neighbor_strategy == "cell":
            kwargs = dict(cells_per_dim=self.cells_per_dim,
                          cell_capacity=self.cell_capacity)
        return build_neighbor_matrix(
            pos,
            batch,
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
    def __call__(
        self,
        z,
        pos,
        batch,
        box=None,
        q=None,
        s=None,
        atom_mask=None,
        nbr: Optional[NeighborMatrix] = None,
        num_mols: Optional[int] = None,
        blocked=None,
        nbr_emb: Optional[NeighborMatrix] = None,
    ):
        from torchmdnet_tpu.models.common import Linear

        F = self.hidden_channels
        act = get_activation(self.activation)
        if num_mols is None:
            num_mols = int(batch.shape[0])  # safe upper bound
        if nbr is None:
            nbr = self.build_neighbors(pos, batch, box=box, atom_mask=atom_mask)
        rev_slot = (nbr.rev_slot if nbr.rev_slot is not None
                    else reverse_slots(nbr.idx, nbr.mask))
        delta, dist = neighbor_geometry(pos, nbr, box=box, batch=batch)
        # Dual-list mode (grouped blocked tier): the embedding runs on a
        # COMPACT K list while the interactions ride the grouped K'≈3.3K
        # list through the θ-tabulated q kernels.  Without it, every
        # [N, K', ·] embedding array inflates 3.3× — the [N, K', 3F] dp
        # tensor alone was 12.4 GB at the 25k north-star (OOM).
        if nbr_emb is not None:
            assert self.q_tab and self.cell_block_spec is not None, (
                "nbr_emb (dual-list) requires the θ-tabulated blocked "
                "q-tier — the interactions never see an rbf array")
            nbr_e = nbr_emb
            rev_slot_e = (nbr_e.rev_slot if nbr_e.rev_slot is not None
                          else reverse_slots(nbr_e.idx, nbr_e.mask))
            delta_e, dist_e = neighbor_geometry(pos, nbr_e, box=box,
                                                batch=batch)
        else:
            nbr_e, rev_slot_e, delta_e, dist_e = nbr, rev_slot, delta, dist

        # Per-atom total charge Q (reference :376-380).
        if q is None:
            Q_atom = jnp.zeros_like(z, dtype=pos.dtype)
        else:
            Q_atom = jnp.concatenate(
                [jnp.asarray(q, pos.dtype), jnp.zeros((1,), pos.dtype)]
            )[jnp.minimum(batch, q.shape[0])]

        rbf_module = make_rbf(
            self.rbf_type, self.cutoff_lower, self.cutoff_upper, self.num_rbf,
            self.trainable_rbf, name="distance_expansion",
            initial_values=self.rbf_initial,
        )
        # dual-list mode: rbf only on the embedding list — the grouped
        # interactions evaluate base(d) from the series in-kernel
        edge_attr_e = rbf_module(dist_e)
        edge_attr = edge_attr_e if nbr_emb is None else None
        # rbf sampled at the Chebyshev nodes for the θ-tabulated q-tier
        # base (tiny [T, R]; the series fit happens inside Interaction2
        # where W1a lives)
        rbf_nodes = None
        if self.q_tab and self.cell_block_spec is not None:
            from torchmdnet_tpu.ops.cheb import cheb_nodes

            rbf_nodes = rbf_module(cheb_nodes(
                self.q_tab, self.cutoff_lower, self.cutoff_upper))
        safe_w = jnp.where(dist_e > 0, dist_e, 1.0)
        edge_vec_norm = delta_e / safe_w[..., None]

        # Selective remat (same policy as TensorNet): recompute the
        # [N,K,*] edge pipeline in the backward but save the named
        # neighbor-sum outputs — only [N,9F] each, yet a full HBM-gather
        # pass to recompute.
        if self.remat:
            policy = jax.checkpoint_policies.save_only_these_names("pns_out")
            EmbeddingCls = nn.remat(TensorEmbedding, policy=policy)
            Interaction2Cls = nn.remat(Interaction2, policy=policy)
        else:
            EmbeddingCls = TensorEmbedding
            Interaction2Cls = Interaction2
        X = EmbeddingCls(
            hidden_channels=F,
            num_rbf=self.num_rbf,
            activation=self.activation,
            cutoff_lower=self.cutoff_lower,
            cutoff_upper=self.cutoff_upper,
            max_z=self.max_z,
            name="tensor_embedding",
            dtype=self.dtype,
            pallas_embedding=self.pallas_embedding,
        )(z, nbr_e, dist_e, edge_vec_norm, edge_attr_e, rev_slot_e)

        charges = ChargePredict(
            hidden_channels=F, activation=self.activation, q_dim=self.q_dim,
            name="charge_predict_0",
        )(X, batch, Q_atom, num_mols)
        charge_list = [charges]

        for i in range(self.num_layers):
            X = Interaction2Cls(
                hidden_channels=F,
                num_rbf=self.num_rbf,
                q_dim=self.q_dim,
                activation=self.activation,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                equivariance_invariance_group=self.equivariance_invariance_group,
                name=f"layers_{i}",
                dtype=self.dtype,
                pallas_edge_mlp=self.pallas_edge_mlp,
                cell_block_spec=self.cell_block_spec,
                q_tab=self.q_tab,
            )(X, charges, nbr, dist, edge_attr, rev_slot, blocked=blocked,
              rbf_nodes=rbf_nodes)
            charges = ChargePredict(
                hidden_channels=F, activation=self.activation, q_dim=self.q_dim,
                name=f"charge_predicts_{i}",
            )(X, batch, Q_atom, num_mols)
            charge_list.append(charges)

        all_charges = jnp.concatenate(charge_list, axis=-1)

        x = irreps_norm3(X)
        x = LayerNorm(name="out_norm")(x)
        x = act(Linear(F, name="linear", dtype=self.dtype)(x))
        if self.output_charges:
            x = jnp.concatenate([x, all_charges], axis=-1)
        return x, None
