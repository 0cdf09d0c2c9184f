"""TPU-native neighbor lists.

Capability parity with the reference ``OptimizedDistance`` module and its
Warp kernels (reference: ``torchmdnet/models/utils.py:120-313``,
``torchmdnet/extensions/warp_kernels/neighbors_brute.py``,
``.../neighbors_cell.py``) — but redesigned for XLA/TPU:

* The reference appends pairs into a flat ``[2, max_num_pairs]`` buffer with
  device atomics (nondeterministic order, ``-1`` padding).  On TPU we build a
  **dense per-atom neighbor matrix** ``idx[N, K]``: row ``i`` holds the
  indices ``j`` of up to ``K`` neighbors in deterministic ascending-``j``
  order plus a validity ``mask[N, K]``.  This is exactly the reference's
  per-atom neighbor budget (``max_num_pairs = -max_num_neighbors`` ⇒
  ``K = max_num_neighbors``, ``models/utils.py:279-281``) expressed as a
  static-shape tensor, so message passing becomes gather + masked reduction
  over the ``K`` axis — no atomics, no scatter in the forward pass.
* ``include_transpose`` needs no special handling: a row-based matrix
  natively contains both directions of every pair.
* Overflow (an atom with more than ``K`` neighbors) surfaces as a checkable
  ``overflow`` flag instead of a device-side assert
  (reference: ``models/utils.py:297-300``).

Differentiability: the index build is non-differentiable (wrapped in
``stop_gradient``); geometry (deltas/distances) is recomputed from ``pos``
by :func:`neighbor_geometry`, so ``jax.grad(jax.grad(...))`` — needed for
force training — works with no hand-written backward kernels (the reference
hand-writes these in ``extensions/neighbor_utils.py:11-46`` plus bwd_bwd
Warp kernels).

Conventions (matching the reference kernels,
``neighbors_brute.py:111-161``): an entry ``(i, k)`` with ``j = idx[i, k]``
represents the directed edge ``i ← j`` with
``delta = pos[i] - pos[j]`` (minimum-image wrapped),
kept when ``dist < cutoff_upper`` and (for ``i != j``)
``dist >= cutoff_lower``.  Self pairs (``loop=True``) are exempt from the
lower cutoff.
"""

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NeighborMatrix(NamedTuple):
    """Static-shape neighbor list in dense per-atom matrix form."""

    idx: jnp.ndarray  # [N, K] int32; padded slots point at own row i (safe gather)
    mask: jnp.ndarray  # [N, K] bool; True = valid neighbor
    num_neighbors: jnp.ndarray  # [N] int32 (true count, may exceed K on overflow)
    overflow: jnp.ndarray  # [] bool; True if any atom had > K neighbors
    # rev_slot[n,k] = position of n in row idx[n,k] (the column-CSR dual;
    # see ops/message_passing.py) — computed once per build so the models
    # don't pay for it every step.
    rev_slot: Optional[jnp.ndarray] = None


def _expand_box(box: jnp.ndarray, batch: jnp.ndarray) -> jnp.ndarray:
    """Expand a [3,3] or [B,3,3] box to per-atom [N,3,3] via the batch index."""
    box = jnp.asarray(box)
    if box.ndim == 2:
        return jnp.broadcast_to(box[None], (batch.shape[0], 3, 3))
    return box[batch]


def wrap_deltas(delta: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Triclinic minimum-image reduction of displacement vectors.

    Mirrors the 3-step round-reduction of the reference brute kernel
    (``neighbors_brute.py:116-134``).  ``delta``: [..., 3]; ``box``:
    broadcastable [..., 3, 3] with rows (a, b, c) in reduced form
    (a_y = a_z = b_z = 0).
    """
    a = box[..., 0, :]
    b = box[..., 1, :]
    c = box[..., 2, :]
    scale3 = jnp.round(delta[..., 2] / c[..., 2])
    delta = delta - scale3[..., None] * c
    scale2 = jnp.round(delta[..., 1] / b[..., 1])
    delta = delta - scale2[..., None] * b
    scale1 = jnp.round(delta[..., 0] / a[..., 0])
    delta = delta - scale1[..., None] * a
    return delta


def _adjacency_to_matrix(adj: jnp.ndarray, k_max: int) -> NeighborMatrix:
    """Compact a boolean [N, N_cand] adjacency into a [N, K] neighbor matrix.

    ``adj[i, c]`` refers to candidate column ``c``; the caller maps candidate
    columns to atom indices afterwards if they aren't already atom indices.
    Deterministic: keeps the K smallest valid column indices per row.
    """
    n, n_cand = adj.shape
    # Valid candidates score (n_cand - c) in [1, n_cand]; invalid score 0.
    # (A cumsum+scatter compaction like the cell path's is ~10x SLOWER here:
    # the scatter source is the full [N, N_cand] adjacency — measured
    # 2026-08-16; top_k's sort is the better lowering at this shape.)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n_cand), 1)
    score = jnp.where(adj, n_cand - col, 0).astype(jnp.int32)
    k_eff = min(k_max, n_cand)
    top, _ = jax.lax.top_k(score, k_eff)  # descending ⇒ ascending column idx
    if k_eff < k_max:
        top = jnp.pad(top, ((0, 0), (0, k_max - k_eff)))
    mask = top > 0
    idx = jnp.where(mask, n_cand - top, 0).astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, k_max), 0)
    idx = jnp.where(mask, idx, row)  # padded slots point at own row
    count = adj.sum(axis=1).astype(jnp.int32)
    overflow = jnp.any(count > k_max)
    from torchmdnet_tpu.ops.message_passing import reverse_slots

    return NeighborMatrix(idx, mask, count, overflow,
                          reverse_slots(idx, mask))


@partial(
    jax.jit,
    static_argnames=("k_max", "cutoff_lower", "cutoff_upper", "loop"),
)
def brute_neighbor_matrix(
    pos: jnp.ndarray,
    batch: Optional[jnp.ndarray] = None,
    *,
    k_max: int,
    cutoff_upper: float,
    cutoff_lower: float = 0.0,
    loop: bool = False,
    box: Optional[jnp.ndarray] = None,
    atom_mask: Optional[jnp.ndarray] = None,
) -> NeighborMatrix:
    """O(N²) neighbor matrix (reference parity: brute strategy).

    Good for N up to a few thousand atoms; use :func:`cell_neighbor_matrix`
    for large periodic systems.

    Args:
      pos: [N, 3] positions.
      batch: [N] molecule index (same-molecule pairs only). None ⇒ single system.
      k_max: per-atom neighbor capacity K (reference ``max_num_neighbors``).
      cutoff_upper/cutoff_lower: keep ``cutoff_lower <= d < cutoff_upper``.
      loop: include self pairs (i, i) with d = 0.
      box: optional [3,3] or [B,3,3] periodic box (reduced triclinic form).
      atom_mask: [N] bool; False = ghost/padding atom, excluded entirely.
    """
    n = pos.shape[0]
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    pos = jax.lax.stop_gradient(pos)
    delta = pos[:, None, :] - pos[None, :, :]
    if box is not None:
        per_atom_box = _expand_box(box, batch)
        delta = wrap_deltas(delta, per_atom_box[:, None, :, :])
    d2 = jnp.sum(delta * delta, axis=-1)

    eye = jnp.eye(n, dtype=bool)
    adj = d2 < cutoff_upper * cutoff_upper
    if cutoff_lower > 0.0:
        adj &= (d2 >= cutoff_lower * cutoff_lower) | eye
    adj &= batch[:, None] == batch[None, :]
    if loop:
        pass  # self pairs kept (d = 0 < cutoff_upper always)
    else:
        adj &= ~eye
    if atom_mask is not None:
        adj &= atom_mask[:, None] & atom_mask[None, :]
    return _adjacency_to_matrix(adj, k_max)


def _cell_dims(box_diag: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Number of cells per dimension; ≥ 3 as the reference requires
    (``extensions/neighbor_utils.py:83-85``)."""
    dims = jnp.floor(box_diag / cutoff).astype(jnp.int32)
    return jnp.maximum(dims, 3)


def pick_cell_grid(box_diag, cutoff: float, n_atoms: int,
                   capacity_factor: float = 2.5):
    """Choose ``(cells_per_dim, stencil, cell_capacity)`` minimizing the
    candidate width ``(2S+1)³ · capacity``.

    With the fixed 27-stencil, cells must be ≥ cutoff wide — at a large
    cutoff (the Coulomb head's 10 Å) that covers ~10× the needed sphere
    volume and the compaction scatter dominates the rebuild (345M-element
    scatter at 25k, device trace 2026-08-17).  Finer cells with a wider
    ±S stencil tighten the covered volume toward the cutoff sphere.
    """
    import numpy as np

    bd = np.asarray(box_diag, dtype=np.float64)
    vol = float(np.prod(bd))
    best = None
    for s in (1, 2, 3, 4):
        dims = np.floor(bd * s / cutoff).astype(np.int64)
        dims = np.maximum(dims, 2 * s + 1)
        if np.any(bd / dims * s < cutoff):  # box too small for this S
            continue
        occ = n_atoms / float(np.prod(dims))
        cap = int(np.ceil(occ * capacity_factor)) + 8
        width = (2 * s + 1) ** 3 * cap
        if best is None or width < best[0]:
            best = (width, tuple(int(d) for d in dims), s, cap)
    if best is None:  # degenerate tiny box: single 27-stencil cell grid
        dims = np.maximum(np.floor(bd / cutoff).astype(np.int64), 3)
        occ = n_atoms / float(np.prod(dims))
        return (tuple(int(d) for d in dims), 1,
                int(np.ceil(occ * capacity_factor)) + 8)
    return best[1], best[2], best[3]


def cell_neighbor_matrix(
    pos: jnp.ndarray,
    batch: Optional[jnp.ndarray] = None,
    *,
    k_max: int,
    cutoff_upper: float,
    cutoff_lower: float = 0.0,
    loop: bool = False,
    box: Optional[jnp.ndarray] = None,
    atom_mask: Optional[jnp.ndarray] = None,
    cell_capacity: int = 64,
    cells_per_dim: Optional[tuple] = None,
    stencil: int = 1,
    compact: Optional[str] = None,
    column_partition: Optional[tuple] = None,
) -> NeighborMatrix:
    """O(N·(2S+1)³·cell_capacity) neighbor matrix via sort-based binning.

    Reference parity: cell strategy (``warp_kernels/neighbors_cell.py``),
    orthogonal boxes only, cells ≥ cutoff wide, 27-cell stencil.  TPU-native
    redesign: instead of GPU atomics we (1) assign each atom a cell id,
    (2) ``argsort`` atoms by cell id (XLA sort), (3) scatter sorted atoms
    into a dense ``[n_cells, cell_capacity]`` table, (4) gather the
    stencil cells' slots per atom into a candidate list and (5) compact
    with the same deterministic top-k as the brute path.  Beyond the
    reference: ``stencil=S`` generalizes to cells ≥ cutoff/S wide with a
    ±S stencil — at large cutoffs this shrinks the candidate width (and
    the compaction cost) several-fold; see :func:`pick_cell_grid`.

    Requires an orthogonal ``box`` ([3,3], diagonal used).  ``cells_per_dim``
    must be static; if None it is computed from the concrete box (requires
    box to be a concrete array, not a tracer).
    """
    n = pos.shape[0]
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    if box is None:
        raise ValueError("cell strategy requires a box (reference parity)")
    box = jnp.asarray(box)
    if box.ndim == 3:
        box = box[0]
    box_diag = jnp.diag(box)

    if cells_per_dim is None:
        import numpy as np

        bd = np.asarray(jax.device_get(box_diag), dtype=np.float64)
        dims = np.maximum(
            np.floor(bd * stencil / cutoff_upper).astype(np.int64),
            2 * stencil + 1,
        )
        cells_per_dim = tuple(int(d) for d in dims)

    # Large-C compaction lowering: read the env knob HERE (outside jit) and
    # pass it as a static argname so it participates in the jit cache key —
    # reading it at trace time silently binds the first-trace value per
    # shape (ADVICE r2).
    if compact is None:
        compact = os.environ.get("TMDNET_COMPACT", "kloop")
    return _cell_neighbor_matrix_impl(
        pos,
        batch,
        box_diag,
        k_max=k_max,
        cutoff_upper=float(cutoff_upper),
        cutoff_lower=float(cutoff_lower),
        loop=loop,
        atom_mask=atom_mask,
        cell_capacity=cell_capacity,
        cells_per_dim=cells_per_dim,
        stencil=stencil,
        compact=compact,
        column_partition=(tuple(column_partition)
                          if column_partition is not None else None),
    )


@partial(
    jax.jit,
    static_argnames=(
        "k_max",
        "cutoff_upper",
        "cutoff_lower",
        "loop",
        "cell_capacity",
        "cells_per_dim",
        "stencil",
        "compact",
        "column_partition",
    ),
)
def _cell_neighbor_matrix_impl(
    pos,
    batch,
    box_diag,
    *,
    k_max,
    cutoff_upper,
    cutoff_lower,
    loop,
    atom_mask,
    cell_capacity,
    cells_per_dim,
    stencil=1,
    compact="kloop",
    column_partition=None,
):
    n = pos.shape[0]
    pos = jax.lax.stop_gradient(pos)
    nx, ny, nz = cells_per_dim
    n_cells = nx * ny * nz
    dims = jnp.array([nx, ny, nz], dtype=jnp.int32)

    # Wrap positions into [0, L) and find home cell.
    frac = pos / box_diag[None, :]
    frac = frac - jnp.floor(frac)
    cell_xyz = jnp.clip((frac * dims[None, :]).astype(jnp.int32), 0, dims - 1)
    cell_id = (cell_xyz[:, 0] * ny + cell_xyz[:, 1]) * nz + cell_xyz[:, 2]
    if atom_mask is not None:
        cell_id = jnp.where(atom_mask, cell_id, n_cells)  # ghosts to overflow bin

    # Dense cell table via sort: atoms sorted by cell id, then each atom's
    # rank within its cell addresses a [n_cells+1, capacity] table.
    order = jnp.argsort(cell_id)  # stable ⇒ ascending atom idx within a cell
    sorted_cell = cell_id[order]
    arange = jnp.arange(n, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = arange - seg_start  # rank of atom within its cell
    cell_count = jnp.zeros((n_cells + 1,), jnp.int32).at[sorted_cell].add(1)
    cell_overflow = jnp.any(cell_count[:n_cells] > cell_capacity)

    table = jnp.full((n_cells + 1, cell_capacity), n, dtype=jnp.int32)
    in_cap = rank < cell_capacity
    table = table.at[
        jnp.where(in_cap, sorted_cell, n_cells),
        jnp.clip(rank, 0, cell_capacity - 1),
    ].set(jnp.where(in_cap, order.astype(jnp.int32), n))

    # ±S-cell stencil: candidate atoms per atom (S=1 ⇒ the reference's
    # 27-cell stencil; requires dims ≥ 2S+1, enforced by the callers).
    S = int(stencil)
    ns = 2 * S + 1
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-S, S + 1), jnp.arange(-S, S + 1),
            jnp.arange(-S, S + 1), indexing="ij"
        ),
        axis=-1,
    ).reshape(ns**3, 3)
    ncell_xyz = (cell_xyz[:, None, :] + offs[None, :, :]) % dims[None, None, :]
    ncell_id = (ncell_xyz[..., 0] * ny + ncell_xyz[..., 1]) * nz + ncell_xyz[..., 2]
    cand = table[ncell_id].reshape(n, ns**3 * cell_capacity)  # [N, C]
    cand_valid = cand < n
    cand_safe = jnp.minimum(cand, n - 1)

    # Distances per coordinate component: gathering pos[cand] as [N, C, 3]
    # would put the length-3 axis on the 128-lane dimension (42× padding,
    # OOM at 25k atoms); [N, C] per component keeps lanes dense.
    #
    # Candidate attributes are fetched through the cell table in two hops:
    # first permute each attribute into table layout ([n_cells+1, capacity],
    # a tiny element gather), then fetch each atom's 27 stencil blocks with
    # ``attr_table[ncell_id]`` — a ROW gather (capacity-wide slices).  The
    # naive ``pc[cand_safe]`` is an *element* gather over N·27·capacity
    # arbitrary indices, which XLA lowers to scalar loads (~800 ms at 25k
    # atoms); the two-hop form is bit-identical and bandwidth-bound (~20 ms).
    table_safe = jnp.minimum(table, n - 1)
    C = ns**3 * cell_capacity
    d2 = jnp.zeros((n, C), pos.dtype)
    for c in range(3):
        pc = pos[:, c]
        cand_pc = pc[table_safe][ncell_id].reshape(n, C)
        dc = pc[:, None] - cand_pc
        dc = dc - jnp.round(dc / box_diag[c]) * box_diag[c]
        d2 = d2 + dc * dc

    is_self = cand_safe == arange[:, None]
    adj = cand_valid & (d2 < cutoff_upper * cutoff_upper)
    if cutoff_lower > 0.0:
        adj &= (d2 >= cutoff_lower * cutoff_lower) | is_self
    if not loop:
        adj &= ~is_self
    cand_batch = batch[table_safe][ncell_id].reshape(n, C)
    adj &= batch[:, None] == cand_batch
    if atom_mask is not None:
        cand_am = atom_mask[table_safe][ncell_id].reshape(n, C)
        adj &= atom_mask[:, None] & cand_am

    if column_partition is not None:
        # Column-partitioned slots for the grouped blocked-MP kernel
        # (ops/pallas_blocked_mp.py): slot axis statically split into 9
        # ranges, one per stencil xy-column (dx,dy) in ij order — the
        # candidate axis is already grouped that way (offs meshgrid: dx
        # slowest, dy, dz; 3 z-cells = 3·capacity contiguous candidates
        # per xy-column).  Each group compacts independently to its
        # budget; per-group overflow feeds the (recoverable) flag.
        assert S == 1, "column_partition requires the 3x3 stencil"
        assert len(column_partition) == 9
        assert k_max == sum(column_partition)
        gsz = 3 * cell_capacity
        idx_parts, mask_parts = [], []
        overflow = cell_overflow
        colg = jax.lax.broadcasted_iota(jnp.int32, (n, gsz), 1)
        for g, kg in enumerate(column_partition):
            sub_adj = adj[:, g * gsz:(g + 1) * gsz]
            sub_cand = cand_safe[:, g * gsz:(g + 1) * gsz]
            score = jnp.where(sub_adj, gsz - colg, 0).astype(jnp.int32)
            top, _ = jax.lax.top_k(score, min(kg, gsz))
            if kg > gsz:
                top = jnp.pad(top, ((0, 0), (0, kg - gsz)))
            mask_g = top > 0
            colidx = jnp.where(mask_g, gsz - top, 0)
            idx_g = jnp.take_along_axis(sub_cand, colidx, axis=1)
            rowg = jax.lax.broadcasted_iota(jnp.int32, (n, kg), 0)
            idx_parts.append(
                jnp.where(mask_g, idx_g.astype(jnp.int32), rowg))
            mask_parts.append(mask_g)
            overflow |= jnp.any(sub_adj.sum(axis=1) > kg)
        idx = jnp.concatenate(idx_parts, axis=1)
        mask = jnp.concatenate(mask_parts, axis=1)
        count = adj.sum(axis=1).astype(jnp.int32)
        from torchmdnet_tpu.ops.message_passing import reverse_slots

        return NeighborMatrix(idx, mask, count, overflow,
                              reverse_slots(idx, mask))

    # Compact candidates to K slots.  Slot order = candidate order
    # (stencil-cell, rank); valid-first, which is all reverse_slots/message
    # passing require.  Two lowerings, picked by candidate width:
    # * small C (≲1k): per-row top_k — the sort cost scales with C and beats
    #   the element-granular scatter (~0.6 ms vs ~6 ms at dhfr scale);
    # * large C: cumsum + one unique-index scatter — at the 25k/K=96 MD
    #   config the [N, C] sort is the slower side.
    row = jax.lax.broadcasted_iota(jnp.int32, (n, k_max), 0)
    if C <= 1024:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, C), 1)
        score = jnp.where(adj, C - col, 0).astype(jnp.int32)
        top, _ = jax.lax.top_k(score, min(k_max, C))
        if k_max > C:
            top = jnp.pad(top, ((0, 0), (0, k_max - C)))
        mask = top > 0
        colidx = jnp.where(mask, C - top, 0)
        idx = jnp.take_along_axis(cand_safe, colidx, axis=1).astype(jnp.int32)
        idx = jnp.where(mask, idx, row)
    elif compact == "kloop":
        # Scatter-free compaction: slot k of row n is the unique candidate
        # with in-row rank k, extracted by K fused compare+select+reduce
        # passes over [N, C].  The element-granular scatter below lowers to
        # scalar stores (~158 ms at the 25k/K=96 MD shape, device trace
        # 2026-08-17); these are plain vectorized VPU passes (~11 ms at the
        # same shape).  Candidates are packed as idx+1 so the invalid
        # sentinel 0 is additive-neutral; accumulation is exact (one hit
        # per (row, rank)).  Built [K, N] (leading-axis stack, one layout
        # transpose at the end) — a minor-axis stack is a strided
        # concatenate (see docs/PERF.md tabulated-filter table).
        pos_in_row = jnp.cumsum(adj, axis=1, dtype=jnp.int32) - 1
        packed = jnp.where(adj, cand_safe.astype(jnp.int32) + 1, 0)
        rank = jnp.where(adj, pos_in_row, -1)
        idx1 = jnp.stack(
            [jnp.sum(jnp.where(rank == kk, packed, 0), axis=1)
             for kk in range(k_max)], axis=0).T
        mask = idx1 > 0
        idx = jnp.where(mask, idx1 - 1, row)
    else:
        pos_in_row = jnp.cumsum(adj, axis=1, dtype=jnp.int32) - 1
        keep = adj & (pos_in_row < k_max)
        rowid = jax.lax.broadcasted_iota(jnp.int32, adj.shape, 0)
        flat_t = jnp.where(keep, rowid * k_max + pos_in_row, n * k_max)
        idx = (
            jnp.full((n * k_max + 1,), -1, jnp.int32)
            .at[flat_t.reshape(-1)]
            .set(cand_safe.reshape(-1).astype(jnp.int32), mode="drop",
                 unique_indices=True)[: n * k_max]
            .reshape(n, k_max)
        )
        mask = idx >= 0
        idx = jnp.where(mask, idx, row)
    count = adj.sum(axis=1).astype(jnp.int32)
    overflow = jnp.any(count > k_max) | cell_overflow
    from torchmdnet_tpu.ops.message_passing import reverse_slots

    return NeighborMatrix(idx, mask, count, overflow,
                          reverse_slots(idx, mask))


def build_neighbor_matrix(
    pos,
    batch=None,
    *,
    strategy: str = "brute",
    **kwargs,
) -> NeighborMatrix:
    """Strategy dispatch, mirroring ``get_neighbor_pairs_kernel``
    (reference ``extensions/ops.py:14-106``)."""
    if strategy == "brute":
        kwargs.pop("cell_capacity", None)
        kwargs.pop("cells_per_dim", None)
        kwargs.pop("stencil", None)
        kwargs.pop("compact", None)
        kwargs.pop("column_partition", None)
        return brute_neighbor_matrix(pos, batch, **kwargs)
    if strategy == "cell":
        return cell_neighbor_matrix(pos, batch, **kwargs)
    raise ValueError(f"Unknown neighbor strategy: {strategy!r}")


def neighbor_geometry(
    pos: jnp.ndarray,
    nbr: NeighborMatrix,
    box: Optional[jnp.ndarray] = None,
    batch: Optional[jnp.ndarray] = None,
):
    """Differentiable edge geometry from positions + a (fixed) index set.

    Returns ``(delta, dist)`` with ``delta[i,k] = pos[i] - pos[idx[i,k]]``
    (minimum-image wrapped) and ``dist = |delta|``; both are zero on padded
    slots and safe to differentiate twice (no NaN at d = 0; cf. the
    reference's analytic backward in ``neighbor_utils.py:11-46``).
    """
    idx = jax.lax.stop_gradient(nbr.idx)
    mask = jax.lax.stop_gradient(nbr.mask)
    if nbr.rev_slot is not None:
        from torchmdnet_tpu.ops.message_passing import gather_pair_deltas

        # scatter-free VJP via the slot involution (see message_passing)
        delta = gather_pair_deltas(
            pos, idx, jax.lax.stop_gradient(nbr.rev_slot), mask
        )
    else:
        delta = pos[:, None, :] - pos[idx]
    if box is not None:
        if batch is None:
            batch = jnp.zeros((pos.shape[0],), dtype=jnp.int32)
        per_atom_box = _expand_box(box, batch)
        delta = wrap_deltas(delta, per_atom_box[:, None, :, :])
    delta = jnp.where(mask[..., None], delta, 0.0)
    d2 = jnp.sum(delta * delta, axis=-1)
    safe = jnp.where(d2 > 0.0, d2, 1.0)
    dist = jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)
    return delta, dist


def neighbor_matrix_to_edge_list(nbr: NeighborMatrix):
    """Flatten to the reference's padded edge-list format for API parity.

    Returns ``edge_index [2, N*K]`` int32 with ``-1`` sentinel padding
    (valid edges first within each row block), matching the contract of
    ``OptimizedDistance`` with ``resize_to_fit=False``.
    """
    n, k = nbr.idx.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    i = jnp.where(nbr.mask, rows, -1).reshape(-1)
    j = jnp.where(nbr.mask, nbr.idx, -1).reshape(-1)
    return jnp.stack([i, j])
