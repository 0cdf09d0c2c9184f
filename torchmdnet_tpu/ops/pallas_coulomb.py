"""Windowed direct-pair Coulomb Pallas kernel (the TPU answer to the
reference's cutoff-Coulomb head, ``torchmdnet/models/output_modules.py:
566-588``, at MD scale).

The list-based op (ops/coulomb.py) is exact but gather-bound: at the 25k
north-star config the ~770-slot rows make fwd+bwd read ~8.8 GB through
the TPU gather engine (~25 GB/s effective; measured ~230 ms/step).  This
kernel removes the neighbor list entirely: atoms are cell-block sorted
(ops/cell_blocks.py) and for each block of ``cap`` rows we DMA the
(±S-stencil, z-cut) window of candidate partners — ``plan_stencil_windows``
geometry over the SAME sort as the MP windows — and evaluate ALL window
pairs directly:

    E_i = Σ_j G(d_ij) · Σ_c qw_c b_ic b_jc
        = Σ_c (qw ⊙ b)_ic · Φ_ic,     Φ = G · B_win    (MXU, contraction
                                                        over the window)

The per-pair channel products NEVER materialize: the forward is one
[cap, W] kernel-matrix build on the VPU plus one [cap, W]×[W, C] matmul.
Window slop (direct evaluation covers ~5-10× the cutoff-sphere pairs) is
paid in near-free MXU FLOPs and *streaming* run DMAs at full HBM
bandwidth — ~2 GB/pass vs 8.8 GB of random gathers.

The backward stays row-local (no scatter), the same symmetrization as
ops/coulomb.py::_ccew_bwd:

    ∂L/∂b_m  = qw ⊙ (ct_m·Φ_m + S2_m),   S2 = (G ⊙ ct_j) · B_win
    ∂L/∂qw_c = Σ_m ct_m b_mc Φ_mc                       (host fold)
    ∂L/∂pos_m = Σ_j G'(d)·pd_mj·(ct_m+ct_j)/d · Δ_mj,  pd = (qw⊙b)·B_winᵀ

Precision: G is built in f32 on the VPU; every matmul runs an hi/lo bf16
split on BOTH operands (lo·lo dropped, O(2^-32)) — ~2^-16 relative, i.e.
f32-grade, with FLOPs that are negligible either way.  No tier split.

Masking discipline: a window slot is live iff its run is inside the
block/column's EXACT piece bounds (plan_stencil_windows returns the
pre-DMA-floor bounds precisely so floor junk and unused runs can never
alias a covered row) AND the row is a real atom — both folded into one
per-block [W] mask computed at rebuild time (``window_slot_mask``), so
the kernel applies a single multiply.  Self/coincident pairs are killed
by d² > 0 exactly as the list path's ``valid`` mask.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.cell_blocks import (
    CellBlockSpec,
    StencilWindowSpec,
    StencilWindows,
)

_DAMP_RC = 4.6
_INV_E = 0.36787944117144233


class CoulombWindows(NamedTuple):
    """Rebuild-time bundle the windowed head consumes (all sorted-space;
    built by :func:`make_coulomb_windows` from a ``StencilWindows`` plan)."""

    run_starts8: jnp.ndarray  # [n_blocks, 1, NR] int32, units of 8 rows
    nr_used: jnp.ndarray      # [n_blocks, 1, NSC] int32 — live runs/column
    slot_mask: jnp.ndarray    # [n_blocks, 1, W] f32 — piece-bounds ∧ real
    row_valid: jnp.ndarray    # [n_pad] f32 — real-atom mask of block rows
    box_diag: jnp.ndarray     # [1, 3] f32
    overflow: jnp.ndarray     # bool — run budget exceeded at plan time


def window_slot_mask(win: StencilWindows, wspec: StencilWindowSpec,
                     mask_rows, n_pad: int):
    """[n_blocks, W] f32: 1 where a window slot holds a live partner row.

    Folds (a) run-validity against the EXACT piece bounds (8-floor junk,
    gap rows between pieces, and unused runs are all excluded — the
    double-count guard), and (b) the real-atom mask of the addressed row.
    Pure XLA elementwise over the plan arrays; runs once per rebuild."""
    n_blocks, nr = win.run_starts.shape
    nsc, rpc, rlh = wspec.nsc, wspec.rpc, wspec.rlh
    rows = (win.run_starts[:, :, None]
            + jnp.arange(rlh, dtype=jnp.int32)[None, None, :])
    rows = rows.reshape(n_blocks, nsc, rpc, rlh)
    j = jnp.arange(rpc, dtype=jnp.int32)[None, None, :, None]
    nr1 = win.nr1[:, :, None, None]
    nr2 = win.nr2[:, :, None, None]
    in1 = (j < nr1) & (rows >= win.a1[:, :, None, None]) \
        & (rows < win.e1[:, :, None, None])
    in2 = (j >= nr1) & (j < nr1 + nr2) \
        & (rows >= win.a2[:, :, None, None]) \
        & (rows < win.e2[:, :, None, None])
    live = in1 | in2
    safe_rows = jnp.clip(rows, 0, n_pad - 1)
    live &= mask_rows[safe_rows.reshape(-1)].reshape(rows.shape)
    live &= rows < n_pad
    return live.reshape(n_blocks, nsc * rpc * rlh).astype(jnp.float32)


def make_coulomb_windows(win: StencilWindows, wspec: StencilWindowSpec,
                         mask_rows, box_diag, *,
                         spec: CellBlockSpec) -> CoulombWindows:
    """Package a stencil-window plan for :func:`windowed_coulomb_energy`.
    Run starts are clamped into the (rlh-padded) source so top-of-array
    runs cannot DMA out of bounds (their excess rows are junk the slot
    mask already excludes)."""
    n_pad = spec.n_pad
    rs = jnp.clip(win.run_starts, 0, n_pad)  # src is padded by rlh rows
    n_blocks = rs.shape[0]
    return CoulombWindows(
        run_starts8=(rs // 8).reshape(n_blocks, 1, wspec.nr),
        nr_used=(win.nr1 + win.nr2).astype(jnp.int32)
        .reshape(n_blocks, 1, wspec.nsc),
        slot_mask=window_slot_mask(win, wspec, mask_rows, n_pad)
        .reshape(n_blocks, 1, wspec.window),
        row_valid=mask_rows.astype(jnp.float32),
        box_diag=jnp.asarray(box_diag, jnp.float32).reshape(1, 3),
        overflow=win.overflow,
    )


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _g_and_gp(d, rc: float, eps: float, factor: float, need_gp: bool):
    """Reaction-field kernel G(d) and (optionally) G'(d), hand-derived —
    matches ops/coulomb.py::_g_kernel bit-for-bit in f32 elementwise."""
    t = jnp.clip(d / _DAMP_RC, 0.0, 1.0 - 1e-6)
    omt2 = 1.0 - t * t
    fexp = jnp.exp(-1.0 / omt2) / _INV_E
    k_rf = (1.0 / rc**3) * (eps - 1.0) / (2.0 * eps + 1.0)
    c_rf = (1.0 / rc) * (3.0 * eps) / (2.0 * eps + 1.0)
    inv_d = 1.0 / d
    rf = inv_d + k_rf * d * d - c_rf
    g = factor * (1.0 - fexp) * rf
    if not need_gp:
        return g, None
    # d/dd fexp = fexp · (−2t/(1−t²)²) / DAMP_RC, zero once t clips at 1⁻
    dfexp = fexp * (-2.0 * t / (omt2 * omt2)) * (1.0 / _DAMP_RC)
    dfexp = jnp.where(d < _DAMP_RC, dfexp, 0.0)
    rfp = -inv_d * inv_d + 2.0 * k_rf * d
    gp = factor * ((1.0 - fexp) * rfp - dfexp * rf)
    return g, gp


def _dma_runs(wspec: StencilWindowSpec, rs_ref, used_ref, rs_n_ref,
              used_n_ref, src_hbm, win2, sems2):
    """Double-buffered window fetch: HBM → VMEM, 8-row-floored starts
    (the ·8 is Mosaic's divisibility proof for tiled HBM slicing).

    Block i's compute overlaps block i+1's DMA: the NEXT block's run
    table rides in as a rolled copy of the SMEM refs (``rs_n_ref`` /
    ``used_n_ref`` hold block i+1's rows at grid step i), its copies
    land in the other half of the [2, W, nc] scratch, and the returned
    buffer index selects the half holding block i.  This removes the
    serial DMA-wait from the critical path (N=3000 probe was ~6× off
    the traffic floor, round-4 PERF.md roadmap #5).

    Runs beyond a column's live count are SKIPPED — at the 25k config
    the static run budget is ~1.9× the mean live count (max-over-blocks
    sizing), so the skip halves both DMA traffic and issue latency.
    Skipped slots hold stale (finite) VMEM from earlier blocks — masked
    by the slot mask; the one-time zero fill at block 0 keeps
    uninitialized-NaN out of the 0·NaN-poisonable matmuls."""
    nsc, rpc, rlh = wspec.nsc, wspec.rpc, wspec.rlh
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    cur = jax.lax.rem(i, 2)
    nxt = 1 - cur

    def _cp(buf, rs, r):
        start = rs[0, 0, r] * 8
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(start, rlh), :],
            win2.at[buf, pl.ds(r * rlh, rlh), :],
            sems2.at[buf, r],
        )

    def _issue(buf, rs, used_tbl):
        for s_ in range(nsc):
            used = used_tbl[0, 0, s_]
            for j in range(rpc):
                r = s_ * rpc + j

                @pl.when(j < used)
                def _(r=r):
                    _cp(buf, rs, r).start()

    @pl.when(i == 0)
    def _():
        win2[:] = jnp.zeros_like(win2)
        _issue(0, rs_ref, used_ref)

    @pl.when(i + 1 < nb)
    def _():
        _issue(nxt, rs_n_ref, used_n_ref)

    for s_ in range(nsc):
        used = used_ref[0, 0, s_]
        for j in range(rpc):
            r = s_ * rpc + j

            @pl.when(j < used)
            def _(r=r):
                _cp(cur, rs_ref, r).wait()
    return cur


def _sel(ncols: int, c: int):
    """[1, ncols] one-hot f32 channel selector (built from iota — no
    host-side constant operand needed)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1)
            == c).astype(jnp.float32)


def _chan_row(w, ncols: int, c: int):
    """window channel c as a [1, W] lane row: selᵀ contraction on the MXU
    (Mosaic has no [W,1]→[1,W] transpose; a one-hot f32 matmul at HIGHEST
    precision is an exact selection)."""
    return jax.lax.dot_general(
        _sel(ncols, c), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _chan_col(rows, ncols: int, c: int):
    """block-row channel c as a [cap, 1] column (lane offset 0, safe to
    lane-broadcast)."""
    return jax.lax.dot_general(
        rows, _sel(ncols, c), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _hilo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _hilo_dot(a, b, dims):
    """f32-grade matmul: hi/lo bf16 split on both operands, lo·lo dropped
    (O(2^-32)); f32 accumulation."""
    a_hi, a_lo = _hilo(a)
    b_hi, b_lo = _hilo(b)
    out = None
    for x, y in ((a_hi, b_hi), (a_hi, b_lo), (a_lo, b_hi)):
        part = jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out


def _pair_geometry(spec, wspec, ncols, rc, rows, w, wm, box_ref):
    """Masked pair distances for one block: returns (valid, safe_d,
    dx, dy, dz) as [cap, W] f32 planes (minimum-image wrapped)."""
    cap, wlen = spec.cap, wspec.window
    deltas = []
    d2 = None
    for c in range(3):
        pr = jnp.broadcast_to(_chan_col(rows, ncols, c), (cap, wlen))
        pw = jnp.broadcast_to(_chan_row(w, ncols, c), (cap, wlen))
        dc = pr - pw
        bx = box_ref[0, c]
        # minimum image: |dc/bx| < 1.5 after the sort's cell wrap, so a
        # single round suffices
        dc = dc - bx * jnp.round(dc * (1.0 / bx))
        deltas.append(dc)
        d2 = dc * dc if d2 is None else d2 + dc * dc
    wmb = jnp.broadcast_to(wm, (cap, wlen))
    valid = (wmb > 0.0) & (d2 > 1e-12) & (d2 < rc * rc)
    safe_d = jnp.sqrt(jnp.where(valid, d2, 1.0))
    return valid, safe_d, deltas


def _wc_fwd_kernel(spec: CellBlockSpec, wspec: StencilWindowSpec,
                   ncols: int, c: int, rc: float, eps: float,
                   factor: float, *refs):
    (rs_ref, used_ref, rs_n_ref, used_n_ref, box_ref, rows_ref, wm_ref,
     src_hbm, phi_ref, win2, sems2) = refs
    cur = _dma_runs(wspec, rs_ref, used_ref, rs_n_ref, used_n_ref,
                    src_hbm, win2, sems2)
    w = win2[cur]                                      # [W, ncols] f32
    rows = rows_ref[0]                                 # [cap, ncols]
    valid, safe_d, _ = _pair_geometry(
        spec, wspec, ncols, rc, rows, w, wm_ref[0], box_ref)
    g, _ = _g_and_gp(safe_d, rc, eps, factor, False)
    g = jnp.where(valid, g, 0.0)
    # Φ = G · B_win  (contraction over the window dim — MXU-native)
    phi_ref[0] = _hilo_dot(g, w[:, 3:3 + c], ((1,), (0,)))


def _wc_bwd_kernel(spec: CellBlockSpec, wspec: StencilWindowSpec,
                   ncols: int, c: int, rc: float, eps: float,
                   factor: float, *refs):
    (rs_ref, used_ref, rs_n_ref, used_n_ref, box_ref, rows_ref, wm_ref,
     qw_ref, src_hbm, dpos_ref, s2_ref, win2, sems2) = refs
    cap, wlen = spec.cap, wspec.window
    cur = _dma_runs(wspec, rs_ref, used_ref, rs_n_ref, used_n_ref,
                    src_hbm, win2, sems2)
    w = win2[cur]                                      # [W, ncols] f32
    rows = rows_ref[0]                                 # [cap, ncols]
    valid, safe_d, deltas = _pair_geometry(
        spec, wspec, ncols, rc, rows, w, wm_ref[0], box_ref)
    g, gp = _g_and_gp(safe_d, rc, eps, factor, True)
    g = jnp.where(valid, g, 0.0)
    gp = jnp.where(valid, gp, 0.0)

    bwin = w[:, 3:3 + c]                               # [W, C]
    ctw = jnp.broadcast_to(_chan_row(w, ncols, 3 + c), (cap, wlen))
    ctr = jnp.broadcast_to(_chan_col(rows, ncols, 3 + c), (cap, wlen))

    # S2 = (G ⊙ ct_j) · B_win — the reverse-edge charge cotangent
    s2_ref[0] = _hilo_dot(g * ctw, bwin, ((1,), (0,)))

    # pd = (qw ⊙ b_row) · B_winᵀ  (the one C-contraction)
    wb = rows[:, 3:3 + c] * jnp.broadcast_to(qw_ref[:], (cap, c))
    pd = _hilo_dot(wb, bwin, ((1,), (1,)))             # [cap, W]
    s = gp * pd * (ctr + ctw) / safe_d
    for ci in range(3):
        dpos_ref[0, :, ci:ci + 1] = jnp.sum(
            s * deltas[ci], axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _lane_pad(n: int) -> int:
    """Mosaic can only DMA-slice HBM at 128-lane-aligned widths — the
    window source carries zero junk channels up to the next multiple."""
    return ((n + 127) // 128) * 128


def _pad_src(x, rlh: int):
    """rlh junk rows below the source so clamped top-of-array runs stay
    in bounds (their rows are slot-masked), and 128-lane channel padding
    (the DMA alignment contract — see :func:`_lane_pad`)."""
    return jnp.pad(x, ((0, rlh), (0, _lane_pad(x.shape[1]) - x.shape[1])))


def _vmem_params():
    # [cap, W] f32 pair planes (geometry, kernel matrix, pd, masks) plus
    # the [W, 128] window scratch pass the 16 MB scoped default at the
    # 25k north-star window sizes (W≈5-6k)
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _common_specs(spec, wspec, ncols, cwin):
    nr, wlen = wspec.nr, wspec.window
    in_specs = [
        pl.BlockSpec((1, 1, nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, wspec.nsc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        # NEXT block's run table (host-side rolled copies) — the
        # double-buffer prefetch source at grid step i
        pl.BlockSpec((1, 1, nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, wspec.nsc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, spec.cap, ncols), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wlen), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((2, wlen, ncols), jnp.float32),
        pltpu.SemaphoreType.DMA((2, nr)),
    ]
    return in_specs, scratch


def _rolled_runs(cwin: CoulombWindows):
    """Block i+1's run table aligned to grid step i (the double-buffer
    prefetch operands; the final block's roll-around row is never issued
    — the kernel guards on ``i + 1 < num_programs``)."""
    return (jnp.roll(cwin.run_starts8, -1, axis=0),
            jnp.roll(cwin.nr_used, -1, axis=0))


@functools.lru_cache(maxsize=None)
def _make_wc_fwd(spec: CellBlockSpec, wspec: StencilWindowSpec, c: int,
                 rc: float, eps: float, factor: float, interpret: bool):
    ncols = _lane_pad(3 + c)
    n_blocks, cap = spec.n_blocks, spec.cap
    kernel = functools.partial(_wc_fwd_kernel, spec, wspec, ncols, c,
                               rc, eps, factor)
    in_specs, scratch = _common_specs(spec, wspec, ncols, None)

    def run(src, rows, cwin: CoulombWindows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_blocks,),
            in_specs=in_specs + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, cap, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        rs_n, used_n = _rolled_runs(cwin)
        phi = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, cap, c), jnp.float32),
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(cwin.run_starts8, cwin.nr_used, rs_n, used_n, cwin.box_diag,
          rows, cwin.slot_mask, src)
        return phi.reshape(spec.n_pad, c)

    return run


@functools.lru_cache(maxsize=None)
def _make_wc_bwd(spec: CellBlockSpec, wspec: StencilWindowSpec, c: int,
                 rc: float, eps: float, factor: float, interpret: bool):
    ncols = _lane_pad(4 + c)
    n_blocks, cap = spec.n_blocks, spec.cap
    kernel = functools.partial(_wc_bwd_kernel, spec, wspec, ncols, c,
                               rc, eps, factor)
    in_specs, scratch = _common_specs(spec, wspec, ncols, None)
    in_specs = in_specs + [
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]

    def run(src, rows, qw, cwin: CoulombWindows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, cap, 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cap, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        )
        dpos, s2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, cap, 3), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, cap, c), jnp.float32),
            ],
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(cwin.run_starts8, cwin.nr_used, *_rolled_runs(cwin),
          cwin.box_diag, rows, cwin.slot_mask, qw.reshape(1, c), src)
        return dpos.reshape(spec.n_pad, 3), s2.reshape(spec.n_pad, c)

    return run


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def windowed_coulomb_energy(pos_s, qw, b_s, cwin, spec, wspec,
                            rc, eps, factor, interpret=False):
    """Per-atom reaction-field Coulomb energy over stencil windows.

    ``pos_s``/``b_s`` are SORTED-space [n_pad, 3]/[n_pad, C] (the same
    sort ``cwin`` was planned over); returns e [n_pad] with ghost rows
    zeroed.  Matches ``coulomb_cutoff_energy_w`` on a complete neighbor
    list to f32 accuracy."""
    e, _ = _wce_fwd(pos_s, qw, b_s, cwin, spec, wspec, rc, eps, factor,
                    interpret)
    return e


def _wce_fwd(pos_s, qw, b_s, cwin, spec, wspec, rc, eps, factor,
             interpret):
    run = _make_wc_fwd(spec, wspec, b_s.shape[-1], float(rc), float(eps),
                       float(factor), bool(interpret))
    src = _pad_src(jnp.concatenate(
        [pos_s.astype(jnp.float32), b_s.astype(jnp.float32)], axis=1),
        wspec.rlh)
    phi = run(src, src[:spec.n_pad].reshape(spec.n_blocks, spec.cap, -1),
              cwin)
    e = jnp.sum(qw[None, :] * b_s * phi, axis=-1) * cwin.row_valid
    return e, (pos_s, qw, b_s, phi, cwin)


def _wce_bwd(spec, wspec, rc, eps, factor, interpret, res, ct):
    pos_s, qw, b_s, phi, cwin = res
    c = b_s.shape[-1]
    ct = ct * cwin.row_valid
    run = _make_wc_bwd(spec, wspec, c, float(rc), float(eps),
                       float(factor), bool(interpret))
    src = _pad_src(jnp.concatenate(
        [pos_s.astype(jnp.float32), b_s.astype(jnp.float32),
         ct[:, None].astype(jnp.float32)], axis=1), wspec.rlh)
    dpos, s2 = run(src, src[:spec.n_pad].reshape(spec.n_blocks, spec.cap, -1),
                   qw, cwin)
    rv = cwin.row_valid[:, None]
    dpos = dpos * rv
    db = (ct[:, None] * (qw[None, :] * phi) + qw[None, :] * s2) * rv
    dqw = jnp.sum((ct * cwin.row_valid)[:, None] * b_s * phi, axis=0)
    return dpos, dqw, db, None


windowed_coulomb_energy.defvjp(_wce_fwd, _wce_bwd)
