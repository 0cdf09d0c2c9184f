"""Cell-blocked window structure for the Pallas message-passing kernel.

The K-slot neighbor gather ``x[idx[n,k]]`` is the HBM floor of large-N
message passing: XLA lowers it to row-granular loads at ~330 GB/s with a
K× read amplification (docs/PERF.md).  The reference's answer is a Warp
gather kernel (``torchmdnet/extensions/warp_kernels/tensornet_mp.py:42-131``);
the TPU-native answer is *cell-blocked windows*: sort atoms spatially so
that every block of ``CAP`` consecutive rows has all its neighbors inside
a bounded set of contiguous row *runs* (the 3×3 neighboring xy-columns,
z-cropped to the cutoff).  A Pallas kernel DMAs those runs into VMEM once
per block and performs the gather on-chip as a one-hot bf16 matmul on the
MXU (ops/pallas_blocked_mp.py) — window rows are read once per *block*
instead of once per *edge*.

Layout: atoms sorted by (xy-column, fine z-bin), each column padded to a
multiple of ``CAP`` with ghost rows so no block straddles a column
boundary.  Window of a block = for each of its 9 stencil columns, the
rows whose fine z-bin lies within ``cutoff`` of the block's own z-range.
Periodic z-wrap makes that up to two contiguous row pieces per column;
each piece is fetched by whole ``RLH``-row runs (piece-aligned, so a run
never spans a gap).  Build produces, per block, ``NR`` run start rows
and, per edge, the window-relative neighbor position ``rel`` such that
``window[rel[i,k]] == x_sorted[idx[i,k]]``.  Coverage failures raise the
``overflow`` flag (same contract as the K-overflow surface of
ops/neighbors.py) — callers fall back to the gather path or rebuild with
larger static knobs.
"""

import math
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class CellBlockSpec(NamedTuple):
    """Static geometry knobs (hashable; part of the jit signature)."""

    nx: int          # coarse xy-columns (≥ cutoff wide each, 3×3 stencil)
    ny: int
    nzf: int         # fine z-bins per column (crop granularity)
    cap: int         # rows per block
    rpc: int         # runs per stencil column (NR = 9·rpc)
    rlh: int         # rows per run
    n_pad: int       # padded sorted row count (N + per-column alignment)
    cut_bins: int    # cutoff in fine z-bins (ceil) + 1 slop bin
    # f32-accurate gather: window features ride as a hi/lo bf16 split
    # (x = bf16(x) + bf16(x - bf16(x)), two MXU passes) instead of a
    # single bf16 pass — ~2^-16 relative error, meeting the 1e-4 eV/Å
    # production-force bar (BASELINE.md) at ~2× window DMA + dot cost.
    precise: bool = False
    # Column-partitioned slot budgets (9 ints, stencil (dx,dy) ij order):
    # the neighbor matrix's K axis is statically split per stencil column
    # (ops/neighbors.py column_partition) and the MP kernel runs one
    # one-hot per column against that column's 1/9 of the window —
    # gather FLOPs drop from 2·n_pad·K·W·9F to 2·n_pad·K'·(W/9)·9F
    # (K' = Σ budgets ≈ 1.3K).  None = unpartitioned whole-window kernel.
    col_slots: Optional[tuple] = None
    # Packed-runs window budget (ungrouped kernels only): per block, the
    # USED runs of all 9 stencil columns are packed contiguously from
    # window row 0, and the static window shrinks from 9·rpc·rlh (every
    # column max-sized) to nrp·rlh with nrp ≈ max over blocks of the
    # TOTAL used runs — the one-hot contraction FLOPs and the per-block
    # bf16 split follow (measured ~1.8× fewer dead window rows at the
    # 25k north-star).  The used count rides as run_starts' last column
    # (×8 so the wrappers' uniform //8 recovers it).  None = per-column
    # run slots (required by the grouped kernels' window slicing).
    nrp: Optional[int] = None

    @property
    def nr(self) -> int:
        """Static run count of the window (packed budget when set)."""
        if self.nrp is not None and self.col_slots is None:
            return self.nrp
        return 9 * self.rpc

    @property
    def window(self) -> int:
        return self.nr * self.rlh

    @property
    def n_blocks(self) -> int:
        return self.n_pad // self.cap


class CellBlocks(NamedTuple):
    """Rebuild-time window structure (static shapes given a spec)."""

    perm: jnp.ndarray        # [n_pad] sorted row -> original atom (N = ghost)
    inv_perm: jnp.ndarray    # [N] original atom -> sorted row
    mask_rows: jnp.ndarray   # [n_pad] bool: real atom rows
    run_starts: jnp.ndarray  # [n_blocks, NR] int32 row starts (clamped);
    #                          packed specs: [n_blocks, NRP+1], last col =
    #                          total used runs ×8
    nr1: jnp.ndarray         # [n_blocks, 9] runs used by piece 1 per column
    a1: jnp.ndarray          # [n_blocks, 9] piece-1 start row
    a2: jnp.ndarray          # [n_blocks, 9] piece-2 start row
    e1: jnp.ndarray          # [n_blocks, 9] piece-1 end row
    e2: jnp.ndarray          # [n_blocks, 9] piece-2 end row
    overflow: jnp.ndarray    # bool: run capacity exceeded somewhere
    spec: CellBlockSpec
    # packed-runs layout (spec.nrp): per-column window-row offset (runs
    # packed contiguously) and piece-2 run counts — edge_rel needs both
    col_off: jnp.ndarray = None  # [n_blocks, 9] int32, units of runs
    nr2: jnp.ndarray = None      # [n_blocks, 9]


class StencilWindowSpec(NamedTuple):
    """Static knobs of a *secondary* stencil window over an existing
    :class:`CellBlockSpec` sort — the direct-pair Coulomb tier
    (ops/pallas_coulomb.py) covers the Coulomb cutoff with a ±S column
    stencil and its own run budget on the SAME sorted row space, so one
    sort serves both the MP windows and the Coulomb windows."""

    s: int           # stencil radius in xy columns (window = (2S+1)²)
    cut_bins: int    # cutoff in fine z-bins (ceil) + 1 slop bin
    rpc: int         # runs per stencil column
    rlh: int         # rows per run (multiple of 8)

    @property
    def nsc(self) -> int:
        return (2 * self.s + 1) ** 2

    @property
    def nr(self) -> int:
        return self.nsc * self.rpc

    @property
    def window(self) -> int:
        return self.nr * self.rlh


class StencilWindows(NamedTuple):
    """Rebuild-time window geometry for one stencil spec (the MP 3×3
    windows are :class:`CellBlocks`; this is the generalized per-block
    view plus the *exact* piece bounds the direct-pair kernels mask by)."""

    run_starts: jnp.ndarray  # [n_blocks, NR] int32 (8-floored row starts)
    nr1: jnp.ndarray         # [n_blocks, NSC] runs used by piece 1
    nr2: jnp.ndarray         # [n_blocks, NSC] runs used by piece 2
    a1: jnp.ndarray          # [n_blocks, NSC] piece-1 exact start row
    e1: jnp.ndarray          # [n_blocks, NSC] piece-1 exact end row
    a2: jnp.ndarray          # [n_blocks, NSC] piece-2 exact start row
    e2: jnp.ndarray          # [n_blocks, NSC] piece-2 exact end row
    overflow: jnp.ndarray    # bool: run budget exceeded somewhere


def make_cell_block_spec(
    box_diag,
    cutoff: float,
    n_atoms: int,
    *,
    cap: int = 8,
    rpc: Optional[int] = None,
    rlh: int = 8,
    zf_width: float = 1.0,
    headroom: float = 1.35,
    precise: bool = False,
) -> CellBlockSpec:
    """Pick static knobs from concrete geometry.

    ``rlh`` must be a multiple of 8 (Mosaic f32 HBM-slice tile alignment —
    the window is DMA'd as f32 and split to bf16 hi/lo in-kernel).
    ``rpc`` defaults to a density estimate with ``headroom`` slack plus
    piece-alignment margin; the rebuild overflow flag catches
    underestimates (inhomogeneous systems may need a larger value).
    One-hot gather FLOPs in the MP kernel scale with
    ``window = 9·rpc·rlh`` — whether runs are used or not — so tight
    rpc·rlh matters more than generous overflow margins (the round-2 spec
    at rlh=16/zf=2.0 tuned to window=1440 at 25k and LOST to the XLA
    gather; 8-row runs + 1 Å z-bins cut the quantization waste ~2×).
    """
    bd = np.asarray(box_diag, dtype=np.float64)
    nx = max(int(bd[0] // cutoff), 1)
    ny = max(int(bd[1] // cutoff), 1)
    nzf = max(int(bd[2] / zf_width), 1)
    zbin = bd[2] / nzf
    cut_bins = int(np.ceil(cutoff / zbin)) + 1
    ncols = nx * ny
    rlh = max(int(np.ceil(rlh / 8) * 8), 8)
    npm = int(np.lcm(cap, 16))  # n_pad: blocks AND 16-row slice clamps
    n_pad = int(np.ceil((n_atoms + ncols * cap) / npm) * npm)
    if rpc is None:
        rho_col = n_atoms / ncols / bd[2]          # atoms per Å per column
        span = cap / max(rho_col, 1e-9)            # block z-extent in Å
        z_ext = 2.0 * (cut_bins + 1) * zbin + span
        rows = z_ext * rho_col * headroom + 2 * 8  # + piece-align margin
        rpc = max(int(np.ceil(rows / rlh)), 2)
    return CellBlockSpec(nx=nx, ny=ny, nzf=nzf, cap=cap, rpc=rpc,
                         rlh=rlh, n_pad=n_pad, cut_bins=cut_bins,
                         precise=precise)


class BlockedMP(NamedTuple):
    """Per-rebuild dynamic inputs of the blocked MP kernels (the static
    :class:`CellBlockSpec` travels separately — as a module attribute /
    closure — so jit never traces it)."""

    rel: jnp.ndarray         # [n_pad, K] window-relative neighbor slots
    run_starts: jnp.ndarray  # [n_blocks, NR] window run start rows


@jax.custom_vjp
def permute_rows(x, perm_safe, mask_rows, inv_perm):
    """Sorted-space scatter-free permutation: ``out[r] = x[perm[r]]`` for
    real rows, 0 for ghosts.  The VJP is the inverse *gather* (``g[inv_perm]``)
    rather than the scatter XLA would generate for an indexed read — exact
    because ``perm`` restricted to real rows is a bijection."""
    out = x[perm_safe]
    return jnp.where(mask_rows[(...,) + (None,) * (x.ndim - 1)], out, 0)


def _permute_rows_fwd(x, perm_safe, mask_rows, inv_perm):
    return permute_rows(x, perm_safe, mask_rows, inv_perm), inv_perm


def _permute_rows_bwd(inv_perm, g):
    return g[inv_perm], None, None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def tune_cell_block_spec(
    pos,
    box_diag,
    cutoff: float,
    *,
    cap: int = 8,
    rlh: int = 8,
    zf_width: float = 1.0,
    slack_runs: int = 1,
    precise: bool = False,
    column_slots: bool = False,
    slot_slack: int = 2,
    packed_runs: bool = True,
) -> CellBlockSpec:
    """Data-driven spec: plan once with a generous run budget, read off the
    runs actually needed, and return a spec with ``rpc = max_used + slack``.

    Window FLOPs in the MP kernel scale with the *static* window size
    9·rpc·rlh whether runs are used or not, so the density-estimate rpc of
    :func:`make_cell_block_spec` (sized to never overflow) costs real
    milliseconds; at MD setup the geometry is concrete and the exact
    requirement is one cheap plan away.  ``slack_runs`` absorbs atom motion
    between spec refreshes (the rebuild overflow flag still guards it).
    """
    n_atoms = pos.shape[0]
    # Tuning is pure geometry probing and returns only static ints — pin
    # it to CPU so the probe plans never hit the (remote) TPU compiler:
    # each headroom probe is a fresh spec = a fresh jit, minutes each via
    # a compile service vs seconds on host (measured 2026-08-20: ~8 min
    # of 25k bench startup was tune-probe compiles).
    import numpy as _np

    _cpu = jax.devices("cpu")[0]
    # device_get is a no-op on host arrays — never bounce through the
    # accelerator here (a wedged transfer tunnel must not stall setup)
    pos = jax.device_put(_np.asarray(jax.device_get(pos)), _cpu)
    box_diag = jax.device_put(
        _np.asarray(jax.device_get(box_diag)), _cpu)
    with jax.default_device(_cpu):
        return _tune_cell_block_spec_cpu(
            pos, box_diag, cutoff, cap=cap, rlh=rlh, zf_width=zf_width,
            slack_runs=slack_runs, precise=precise,
            column_slots=column_slots, slot_slack=slot_slack,
            packed_runs=packed_runs)


def _tune_cell_block_spec_cpu(pos, box_diag, cutoff, *, cap, rlh, zf_width,
                              slack_runs, precise, column_slots,
                              slot_slack, packed_runs=True):
    n_atoms = pos.shape[0]
    for headroom in (2.5, 4.0, 6.0, 9.0, 14.0):
        probe = make_cell_block_spec(
            box_diag, cutoff, n_atoms, cap=cap, rlh=rlh, zf_width=zf_width,
            headroom=headroom,
        )
        blocks = plan_cell_blocks(jnp.asarray(pos), jnp.asarray(box_diag),
                                  probe)
        if not bool(blocks.overflow):
            break
    else:
        raise ValueError(
            "tune_cell_block_spec: probe overflowed even at 14x headroom "
            "(pathological density concentration?)")
    nr2 = (blocks.e2 - blocks.a2 + probe.rlh - 1) // probe.rlh
    nru = blocks.nr1 + nr2
    used = int(jax.device_get(jnp.max(nru)))
    rpc = max(used + slack_runs, 2)
    if column_slots:
        # Mosaic alignment for the grouped kernels' per-column window
        # slices `win[s*wc:(s+1)*wc]`: the window parts are bf16 (sublane
        # tile 16), so wc = rpc·rlh must be a multiple of 16.
        while (rpc * rlh) % 16:
            rpc += 1
    spec = probe._replace(rpc=rpc, precise=precise)
    if not column_slots:
        if packed_runs:
            # packed-runs window budget: the max TOTAL used runs per
            # block (vs 9·rpc per-column max-sizing — measured ~1.8×
            # smaller at the 25k north-star).  Even nrp keeps the bf16
            # window scratch 16-row tiled (rlh is a multiple of 8).
            tot = int(jax.device_get(jnp.max(jnp.sum(nru, axis=1))))
            nrp = tot + max(2, 2 * slack_runs)
            nrp += nrp % 2
            spec = spec._replace(nrp=min(nrp, 9 * rpc))
        return spec
    # Measure per-stencil-column slot budgets on the concrete geometry
    # (grouped kernel tier).  Requires a ≥3-wide xy grid (the cell-list
    # builder's minimum).
    if spec.nx < 3 or spec.ny < 3:
        raise ValueError(
            f"column_slots needs a >=3x3 xy grid (got {spec.nx}x{spec.ny})"
            " — box too small for the grouped tier at this cutoff")
    from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix

    blocks = plan_cell_blocks(jnp.asarray(pos), jnp.asarray(box_diag), spec)
    perm_safe = jnp.minimum(blocks.perm, n_atoms - 1)
    am = blocks.mask_rows
    pos_s = jnp.where(am[:, None], jnp.asarray(pos)[perm_safe], 0.0)
    bd = np.asarray(jax.device_get(jnp.asarray(box_diag)), np.float64)
    nz = max(int(bd[2] // cutoff), 3)
    occ = n_atoms / (spec.nx * spec.ny * nz)
    # probe budget ≥ the max row count at this cutoff (≈4π/3·rc³·ρ plus
    # fluctuation); the cutoff sphere spans ~4.2·occ cell volumes
    k_probe = min(int(np.ceil(occ * 10)) + 32, spec.n_pad)
    box = jnp.diag(jnp.asarray(box_diag))
    probe_nbr = build_neighbor_matrix(
        pos_s, strategy="cell", k_max=k_probe, cutoff_upper=cutoff,
        loop=True, box=box, atom_mask=am,
        cells_per_dim=(spec.nx, spec.ny, nz),
        cell_capacity=int(np.ceil(occ * 2.5)) + 8)
    if bool(probe_nbr.overflow):
        raise ValueError("column_slots probe neighbor list overflowed")
    slots = tune_column_slots(blocks, probe_nbr.idx, probe_nbr.mask,
                              pos_s, jnp.asarray(box_diag),
                              slack=slot_slack)
    return spec._replace(col_slots=slots)


def tune_stencil_window_spec(
    pos,
    box_diag,
    spec: CellBlockSpec,
    cutoff: float,
    *,
    rlh: int = 32,
    slack_runs: int = 1,
) -> StencilWindowSpec:
    """Data-driven :class:`StencilWindowSpec` for a secondary cutoff over
    ``spec``'s sort (the direct-pair Coulomb tier): stencil radius from the
    concrete column widths, run budget read off a generous probe plan.

    The direct-pair kernel's work scales with the *static* window
    ``(2S+1)²·rpc·rlh``, so ``rpc`` is measured, not estimated.  ``rlh``
    defaults to 32 (vs the MP kernels' 8): the Coulomb window covers
    ~4× the z-extent, and fewer, longer runs cut the per-block DMA count
    ~4× at a ≤(rlh−1)-row junk cost per piece (junk is masked exactly)."""
    import numpy as np

    # CPU-pinned probing — see the tune_cell_block_spec note
    _cpu = jax.devices("cpu")[0]
    pos = jax.device_put(np.asarray(jax.device_get(pos)), _cpu)
    box_diag = jax.device_put(
        np.asarray(jax.device_get(box_diag)), _cpu)
    with jax.default_device(_cpu):
        return _tune_stencil_window_spec_cpu(
            pos, box_diag, spec, cutoff, rlh=rlh, slack_runs=slack_runs)


def _tune_stencil_window_spec_cpu(pos, box_diag, spec, cutoff, *, rlh,
                                  slack_runs):
    import numpy as np

    bd = np.asarray(jax.device_get(box_diag), np.float64)
    wx, wy = bd[0] / spec.nx, bd[1] / spec.ny
    s = max(int(np.ceil(cutoff / wx)), int(np.ceil(cutoff / wy)), 1)
    if 2 * s + 1 > min(spec.nx, spec.ny):
        raise ValueError(
            f"stencil 2S+1={2*s+1} exceeds the {spec.nx}x{spec.ny} xy grid "
            "(a wrapped stencil would double-count columns) — box too "
            f"small for a direct-pair window at cutoff {cutoff}")
    zbin = bd[2] / spec.nzf
    cut_bins = int(np.ceil(cutoff / zbin)) + 1
    rlh = max(int(np.ceil(rlh / 8) * 8), 8)
    # generous probe budget from density, then read off the actual max
    n_atoms = pos.shape[0]
    rho_col = n_atoms / (spec.nx * spec.ny) / bd[2]
    span = spec.cap / max(rho_col, 1e-9)
    z_ext = 2.0 * (cut_bins + 1) * zbin + span
    rows = z_ext * rho_col * 4.0 + 2 * 8
    probe = StencilWindowSpec(
        s=s, cut_bins=cut_bins, rlh=rlh,
        rpc=max(int(np.ceil(rows / rlh)), 2))
    win = plan_stencil_windows(jnp.asarray(pos), jnp.asarray(box_diag),
                               spec, probe)
    if bool(win.overflow):
        raise ValueError(
            "tune_stencil_window_spec: probe overflowed at 4x headroom "
            "(pathological density concentration?)")
    used = int(jax.device_get(jnp.max(win.nr1 + win.nr2)))
    return probe._replace(rpc=max(used + slack_runs, 2))


def tune_column_slots(blocks: "CellBlocks", idx, mask, pos_s, box_diag,
                      slack: int = 2) -> tuple:
    """Per-stencil-column slot budgets for the grouped blocked-MP kernel,
    measured on a concrete sorted-space neighbor matrix (``idx``/``mask``
    [n_pad, K] built on ``pos_s``): budget[s] = max over rows of the
    number of neighbors in stencil column s, plus ``slack``.  Returns a
    9-tuple in the builder's (dx,dy) ij order; feed it to
    ``build_neighbor_matrix(..., column_partition=...)`` and
    ``spec._replace(col_slots=...)``."""
    spec = blocks.spec
    n_pad, k = idx.shape
    cap = spec.cap
    n_blocks = spec.n_blocks
    col_s, _ = _column_bins(pos_s, box_diag, spec)
    jcol = col_s[idx]
    blk = jnp.arange(n_pad, dtype=jnp.int32) // cap
    cx = col_s.reshape(n_blocks, cap)[:, 0] // spec.ny
    cy = col_s.reshape(n_blocks, cap)[:, 0] % spec.ny
    dx = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
    dy = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)
    scol = ((cx[:, None] + dx[None, :]) % spec.nx) * spec.ny + (
        (cy[:, None] + dy[None, :]) % spec.ny)
    eq = scol[blk][:, None, :] == jcol[:, :, None]    # [n_pad, K, 9]
    counts = jnp.sum(eq & mask[:, :, None], axis=1)   # [n_pad, 9]
    maxima = jax.device_get(jnp.max(counts, axis=0))
    # Mosaic alignment: the grouped kernels slice the packed edge arrays
    # on the LANE axis at offsets off·cap; every group boundary must land
    # on a 128-lane tile, so each budget is rounded up to cap·ks ≡ 0
    # (mod 128).  (cap ∈ {8,16,32,...} divides 128.)
    lane_q = max(128 // math.gcd(cap, 128), 1)
    return tuple(int(np.ceil((int(m) + slack) / lane_q)) * lane_q
                 for m in maxima)


def _column_bins(pos, box_diag, spec: CellBlockSpec):
    """(column id, fine z-bin) per atom, PBC-wrapped."""
    frac = pos / box_diag[None, :]
    frac = frac - jnp.floor(frac)
    cx = jnp.clip((frac[:, 0] * spec.nx).astype(jnp.int32), 0, spec.nx - 1)
    cy = jnp.clip((frac[:, 1] * spec.ny).astype(jnp.int32), 0, spec.ny - 1)
    zf = jnp.clip((frac[:, 2] * spec.nzf).astype(jnp.int32), 0, spec.nzf - 1)
    return cx * spec.ny + cy, zf


def plan_cell_blocks(pos, box_diag, spec: CellBlockSpec) -> CellBlocks:
    """Sort + window-run geometry (no edges yet: ``rel`` is filled by
    :func:`edge_rel` after the neighbor list is built on the sorted
    positions).  ``pos`` [N, 3] is in the *original* atom order."""
    arrays = _plan_impl(pos, box_diag, spec)
    return CellBlocks(*arrays[:10], spec=spec, col_off=arrays[13],
                      nr2=arrays[10])


def plan_stencil_windows(pos, box_diag, spec: CellBlockSpec,
                         wspec: StencilWindowSpec) -> StencilWindows:
    """Window-run geometry for a secondary (±S, cutoff) stencil over the
    SAME sort as ``plan_cell_blocks(pos, box_diag, spec)`` — the sort is a
    pure function of (pos, box, spec), so the row space is shared and a
    direct-pair kernel over these windows sees exactly the atoms the MP
    blocks do.  Mutual coverage: pairs within the wspec cutoff are in each
    other's windows (|Δzbin| ≤ cut_bins − 1 and |Δcol| ≤ S both ways)."""
    # an oversized stencil wraps onto duplicate columns and silently
    # double-counts pairs in the direct-pair sum (tune_stencil_window_spec
    # enforces this; hand-built specs must too)
    assert 2 * wspec.s + 1 <= min(spec.nx, spec.ny), (
        f"stencil 2S+1={2 * wspec.s + 1} exceeds grid "
        f"min(nx,ny)={min(spec.nx, spec.ny)}: wrapped duplicate columns")
    arrays = _plan_impl(pos, box_diag, spec, wspec)
    (run_starts, nr1, _a1f, _a2f, e1, e2, overflow) = arrays[3:10]
    nr2, ex_a1, ex_a2 = arrays[10:13]
    return StencilWindows(run_starts, nr1, nr2, ex_a1, e1, ex_a2, e2,
                          overflow)


@partial(jax.jit, static_argnames=("spec", "wspec"))
def _plan_impl(pos, box_diag, spec: CellBlockSpec,
               wspec: Optional[StencilWindowSpec] = None):
    n = pos.shape[0]
    cap, nzf = spec.cap, spec.nzf
    if wspec is None:
        rpc, rlh, stencil_s, cut_bins = spec.rpc, spec.rlh, 1, spec.cut_bins
        nr_total = spec.nr
    else:
        rpc, rlh, stencil_s, cut_bins = (wspec.rpc, wspec.rlh, wspec.s,
                                         wspec.cut_bins)
        nr_total = wspec.nr
    ncols = spec.nx * spec.ny
    n_pad = spec.n_pad
    n_blocks = spec.n_blocks

    col, zf = _column_bins(pos, box_diag, spec)
    key = col * (nzf + 1) + zf
    order = jnp.argsort(key).astype(jnp.int32)        # sorted -> original

    csize = jnp.zeros((ncols,), jnp.int32).at[col].add(1)
    cal = ((csize + cap - 1) // cap) * cap            # CAP-aligned sizes
    cstart_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cal).astype(jnp.int32)])
    cstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(csize).astype(jnp.int32)])

    c_sorted = col[order]
    row_pad = cstart_pad[c_sorted] + (
        jnp.arange(n, dtype=jnp.int32) - cstart[c_sorted])
    perm = jnp.full((n_pad,), n, jnp.int32).at[row_pad].set(order)
    inv_perm = jnp.zeros((n,), jnp.int32).at[order].set(row_pad)
    mask_rows = perm < n

    # bin starts in padded row space: within a column, real rows are
    # contiguous from cstart_pad[c]; ghosts trail past all bins.
    bcount = jnp.zeros((ncols * nzf,), jnp.int32).at[
        col * nzf + zf].add(1)
    bin_csum = jnp.cumsum(bcount).astype(jnp.int32)
    bin_excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), bin_csum])
    col_of_bin = jnp.arange(ncols * nzf, dtype=jnp.int32) // nzf
    # rows before bin b within its column = bin_excl[b] - cstart[col]
    bin_start_flat = cstart_pad[col_of_bin] + (
        bin_excl[:-1] - cstart[col_of_bin])
    # sentinel row for "bin index == nzf": end of the column's real rows
    col_real_end = cstart_pad[:-1] + csize                      # [ncols]
    # bin_start[c, z] for z in [0, nzf]: shape [ncols, nzf+1]
    bin_start = jnp.concatenate(
        [bin_start_flat.reshape(ncols, nzf), col_real_end[:, None]], axis=1)

    # block z-ranges from the block's own real rows
    zf_pad = jnp.where(mask_rows, zf[jnp.minimum(perm, n - 1)], -1)
    zf_b = zf_pad.reshape(n_blocks, cap)
    any_real = (zf_b >= 0).any(axis=1)
    zlo = jnp.min(jnp.where(zf_b >= 0, zf_b, nzf), axis=1) - cut_bins
    zhi = jnp.max(zf_b, axis=1) + cut_bins
    zlo = jnp.where(any_real, zlo, 0)
    zhi = jnp.where(any_real, zhi, -1)                # empty window

    # stencil columns (PBC wrap)
    col_pad = jnp.where(mask_rows, col[jnp.minimum(perm, n - 1)], 0)
    col_b = col_pad.reshape(n_blocks, cap)[:, 0]
    cx = col_b // spec.ny
    cy = col_b % spec.ny
    # stencil offsets in the builder's (dx,dy) ij order, radius S
    offs = np.arange(-stencil_s, stencil_s + 1, dtype=np.int32)
    dx = jnp.asarray(np.repeat(offs, 2 * stencil_s + 1))
    dy = jnp.asarray(np.tile(offs, 2 * stencil_s + 1))
    sx = (cx[:, None] + dx[None, :]) % spec.nx
    sy = (cy[:, None] + dy[None, :]) % spec.ny
    scol = sx * spec.ny + sy                          # [n_blocks, 9]

    # coverage pieces per stencil column: z in [zlo, zhi] with PBC wrap.
    lo = zlo[:, None]
    hi = zhi[:, None]
    wrap_lo = lo < 0
    wrap_hi = hi >= nzf
    whole = wrap_lo & wrap_hi | ((hi - lo + 1) >= nzf)
    lo_w = jnp.where(wrap_lo, lo + nzf, lo)
    hi_w = jnp.where(wrap_hi, hi - nzf, hi)

    def bsz(z):
        zc = jnp.broadcast_to(jnp.clip(z, 0, nzf), scol.shape)
        return jnp.take_along_axis(
            bin_start[scol.reshape(-1)],
            zc.reshape(-1, 1), axis=1).reshape(scol.shape)

    base = bsz(jnp.zeros_like(scol))
    q_end = bsz(jnp.full_like(scol, nzf))
    # non-wrapped: piece1 = [lo, hi+1); wrapped-lo: piece1 = [lo_w, nzf),
    # piece2 = [0, hi+1); wrapped-hi: piece1 = [lo, nzf), piece2 = [0, hi_w+1)
    a1 = jnp.where(wrap_lo, bsz(lo_w), bsz(lo))
    e1 = jnp.where(wrap_lo | wrap_hi, q_end, bsz(hi + 1))
    a2 = jnp.where(wrap_lo | wrap_hi, base, e1)
    e2 = jnp.where(wrap_lo, bsz(hi_w + 1),
                   jnp.where(wrap_hi, bsz(hi_w + 1), e1))
    a1 = jnp.where(whole, base, a1)
    e1 = jnp.where(whole, q_end, e1)
    a2 = jnp.where(whole, e1, a2)
    e2 = jnp.where(whole, e1, e2)
    empty = hi < lo
    a1 = jnp.where(empty, base, a1)
    e1 = jnp.where(empty, base, e1)
    a2 = jnp.where(empty, base, a2)
    e2 = jnp.where(empty, base, e2)

    # Exact (pre-floor) piece starts: the direct-pair kernels mask window
    # slots by [exact start, end) so 8-floor junk, gap rows, and unused-run
    # tiles can never alias a row covered by the other piece (double-count
    # hazard — the one-hot MP kernels are immune because ``rel`` addresses
    # specific slots, but a direct-pair sum counts every unmasked row).
    ex_a1, ex_a2 = a1, a2

    # Mosaic can only slice HBM at tile-aligned (8-row for f32) offsets,
    # and it needs a static *proof* — so piece starts are floored to
    # multiples of 8 here (the extra sub-piece rows are harmless junk
    # coverage) and the kernel receives run starts in units of 8 rows
    # (start = rs·8).  Only align non-empty pieces: flooring a degenerate
    # piece would fabricate a spurious run.
    a1 = jnp.where(e1 > a1, (a1 // 8) * 8, a1)
    a2 = jnp.where(e2 > a2, (a2 // 8) * 8, a2)

    # When the two pieces sit close in row space (wrapped windows in
    # short columns), covering the merged interval [a2, e1) — junk rows
    # in the gap are harmless — can need fewer runs than piece-aligned
    # coverage (piece quantization wastes up to rlh-1 rows per piece).
    has2 = e2 > a2
    merged_len = e1 - a2                              # piece2 precedes piece1
    runs_split = (e1 - a1 + rlh - 1) // rlh + (e2 - a2 + rlh - 1) // rlh
    runs_merged = (merged_len + rlh - 1) // rlh
    merge = has2 & (runs_merged <= runs_split)
    a1 = jnp.where(merge, a2, a1)
    # merged exact piece-1 start = piece-2's exact start (the merged runs
    # begin at floored a2); exact piece-2 becomes empty
    ex_a1 = jnp.where(merge, ex_a2, ex_a1)
    a2 = jnp.where(merge, e2, a2)
    e2 = jnp.where(merge, a2, e2)
    ex_a2 = jnp.where(merge, e2, ex_a2)

    len1 = e1 - a1
    len2 = e2 - a2
    nr1 = (len1 + rlh - 1) // rlh                     # piece-1 runs used
    nr2 = (len2 + rlh - 1) // rlh
    packed = (wspec is None and spec.nrp is not None
              and spec.col_slots is None)
    overflow = jnp.any((nr1 + nr2) > rpc)

    # run starts: piece-aligned; piece-2 runs follow piece-1 runs.
    j = jnp.arange(rpc, dtype=jnp.int32)[None, None, :]
    nr1e = nr1[:, :, None]
    starts = jnp.where(
        j < nr1e,
        a1[:, :, None] + j * rlh,
        a2[:, :, None] + (j - nr1e) * rlh,
    )
    if wspec is None:
        # MP path: the one-hot kernels DMA from an UNPADDED [n_pad, F]
        # source, so every run must fit below n_pad.  Sliding a top run
        # down is safe here because ``rel`` addresses specific slots.
        starts = jnp.clip(starts, 0, max(n_pad - rlh, 0))
    else:
        # Direct-pair (wspec) path: the kernel source is rlh-padded
        # (pallas_coulomb._pad_src), so runs may start up to n_pad.
        # Clipping to n_pad - rlh here would slide the last used run of a
        # near-full column onto the previous run's rows; window_slot_mask
        # marks the overlap live in BOTH runs and the direct-pair sum
        # double-counts those pairs silently (advisor finding, round 4).
        starts = jnp.clip(starts, 0, n_pad)
    # unused runs (j ≥ nr1+nr2) may start at unaligned piece remnants;
    # floor them too — they DMA junk that nothing addresses.
    starts = (starts // 8) * 8

    nru = (nr1 + nr2).astype(jnp.int32)               # [n_blocks, 9]
    if packed:
        # Pack each block's USED runs contiguously from window row 0:
        # column c's runs land at [col_off[c], col_off[c] + nru[c]).  The
        # static window shrinks to nrp·rlh (≈ the max TOTAL used runs,
        # vs 9·rpc per-column max-sizing) and the used total rides as
        # run_starts' LAST column (×8 — the kernel wrappers //8 every
        # column uniformly, recovering the plain count).
        nrp = spec.nrp
        col_off = (jnp.cumsum(nru, axis=1) - nru).astype(jnp.int32)
        used_total = jnp.sum(nru, axis=1).astype(jnp.int32)
        jr = jnp.arange(rpc, dtype=jnp.int32)[None, None, :]
        dest = jnp.where(jr < nru[:, :, None],
                         col_off[:, :, None] + jr, nrp)
        bidx = jnp.arange(n_blocks, dtype=jnp.int32)[:, None, None]
        run_starts = jnp.zeros((n_blocks, nrp + 1), jnp.int32)
        run_starts = run_starts.at[bidx, dest].set(
            starts.astype(jnp.int32), mode="drop")
        run_starts = run_starts.at[:, nrp].set(used_total * 8)
        overflow = overflow | jnp.any(used_total > nrp)
    else:
        col_off = jnp.broadcast_to(
            (jnp.arange(9, dtype=jnp.int32) * rpc)[None, :],
            (n_blocks, 9))
        run_starts = starts.reshape(n_blocks, nr_total).astype(jnp.int32)

    return (perm, inv_perm, mask_rows, run_starts,
            nr1.astype(jnp.int32),
            a1.astype(jnp.int32), a2.astype(jnp.int32),
            e1.astype(jnp.int32), e2.astype(jnp.int32),
            overflow,
            nr2.astype(jnp.int32),
            ex_a1.astype(jnp.int32), ex_a2.astype(jnp.int32),
            col_off)


@partial(jax.jit, static_argnames=("spec",))
def _edge_rel_impl(blocks_arrays, idx, mask, pos_s, box_diag, spec):
    (run_starts, nr1, a1, a2, e1, e2, col_off, nr2) = blocks_arrays
    cap, rpc, rlh = spec.cap, spec.rpc, spec.rlh
    n_pad, k = idx.shape
    n_blocks = spec.n_blocks

    blk = jnp.arange(n_pad, dtype=jnp.int32) // cap
    if spec.col_slots is not None:
        # Partitioned slots: the stencil column of every slot is STATIC
        # (the builder groups the K axis per (dx,dy) — same ij order as
        # the planner's scol), so no column matching is needed.
        q_static = np.repeat(np.arange(9, dtype=np.int32),
                             np.asarray(spec.col_slots, np.int64))
        assert q_static.shape[0] == k, (spec.col_slots, k)
        q = jnp.broadcast_to(jnp.asarray(q_static)[None, :], (n_pad, k))
        matched = jnp.ones((n_pad, k), bool)
    else:
        col_s, _ = _column_bins(pos_s, box_diag, spec)  # sorted-space cols
        jcol = col_s[idx]                               # [n_pad, K]

        # stencil columns per block, derived from runs' geometry inputs:
        # the planner's scol is reproducible from the block's own column
        cx = col_s.reshape(n_blocks, cap)[:, 0] // spec.ny
        cy = col_s.reshape(n_blocks, cap)[:, 0] % spec.ny
        dx = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
        dy = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)
        scol = ((cx[:, None] + dx[None, :]) % spec.nx) * spec.ny + (
            (cy[:, None] + dy[None, :]) % spec.ny)      # [n_blocks, 9]

        eq = scol[blk][:, None, :] == jcol[:, :, None]  # [n_pad, K, 9]
        q = jnp.argmax(eq, axis=-1).astype(jnp.int32)
        matched = eq.any(axis=-1)

    def g(x):
        return jnp.take_along_axis(x[blk], q, axis=1)

    a1e, e1e, a2e, e2e, nr1e = g(a1), g(e1), g(a2), g(e2), g(nr1)
    off_e = g(col_off)                                  # runs, per column
    nru_e = nr1e + g(nr2)
    in1 = (idx >= a1e) & (idx < e1e)
    in2 = (idx >= a2e) & (idx < e2e)
    slot = jnp.where(in1, idx - a1e, nr1e * rlh + (idx - a2e))
    within = jnp.where(
        in1, slot < nr1e * rlh,
        in2 & (slot < nru_e * rlh))
    covered = matched & (in1 | in2) & within & mask
    # column window base: packed layout = prefix of used runs; per-column
    # layout = c·rpc — both ride ``col_off`` so the formula is uniform
    rel = off_e * rlh + slot
    # Sentinel spec.window on uncovered/invalid slots: the kernel's
    # one-hot compare (iota < window) never matches it, so those edges
    # contribute exact zeros without any separate mask pass.
    rel = jnp.where(covered, rel, spec.window).astype(jnp.int32)
    edge_overflow = jnp.any(mask & ~covered)
    return rel, edge_overflow


def edge_rel(blocks: CellBlocks, idx, mask, pos_s, box_diag):
    """Window-relative neighbor positions for a sorted-space neighbor
    matrix (``idx``/``mask`` [n_pad, K] built on the sorted positions
    ``pos_s`` [n_pad, 3]).  Returns (rel [n_pad, K], overflow)."""
    return _edge_rel_impl(
        (blocks.run_starts, blocks.nr1, blocks.a1, blocks.a2,
         blocks.e1, blocks.e2, blocks.col_off, blocks.nr2),
        idx, mask, pos_s, box_diag, blocks.spec)


def window_rows_ref(blocks: CellBlocks, feats_s: jnp.ndarray, b: int):
    """Test oracle: materialize block ``b``'s window [NR·RLH, C] rows."""
    rs = blocks.run_starts[b]
    return jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(feats_s, rs[r], blocks.spec.rlh, 0)
         for r in range(blocks.spec.nr)], axis=0)
