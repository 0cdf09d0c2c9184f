"""Cell-blocked Pallas message-passing kernels (the TPU answer to the
reference's Warp gather MP, ``torchmdnet/extensions/warp_kernels/
tensornet_mp.py:42-131``).

The XLA K-slot gather reads one 9F row per *edge* from HBM (~330 GB/s,
K× amplification).  Here, atoms are pre-sorted into cell-blocked order
(ops/cell_blocks.py); for each block of ``CAP`` rows the kernel DMAs the
block's window — ``NR`` contiguous runs of ``RLH`` rows — into VMEM
*once*, then performs the per-edge gather **on the MXU** as a one-hot
bf16 matmul:

    OT[w, e] = (rel[e] == w)            # [W, BK] one-hot, exact in bf16
    xj       = OTᵀ · window             # [BK, 9F] gathered neighbor rows
    prod     = xj ⊙ expand9(attr3f)     # per-channel edge weights (f32)
    out[c]   = Σ_{e in row c} prod[e]   # per-row segment sum

Mosaic (jax 0.9) has no in-VMEM gather primitive — `take_along_axis`
crashes the backend and arbitrary `vector.load` indices are rejected —
but the one-hot contraction needs only iota/compare/dot.  Its FLOPs are
``2·n_pad·K·W·9F`` — proportional to the *window* size W, so the spec's
run quantization is the performance knob (see make_cell_block_spec; the
round-2 rlh=16 spec tuned to W=1440 at 25k and lost to the XLA gather).

The window is DMA'd as **f32** (8-row run alignment — half the
quantization waste of bf16's 16-row tiles) and split to bf16 in-kernel:

* fast tier (default): one bf16 pass on the gathered features, f32
  accumulation — the TMDNET_MP_STORAGE=bf16 contract (~1e-3 relative
  force error).
* precise tier (``spec.precise``): hi/lo split — ``hi = bf16(x)``,
  ``lo = bf16(x − f32(hi))`` — two MXU passes recover x to ~2^-16
  relative (the one-hot matrix is exact in bf16), meeting the reference
  parity bar (rtol=atol=1e-4, ``tests/test_warp_ops.py:85-86``); the
  backward's cotangent fold gets the same split.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.cell_blocks import CellBlockSpec


def _dma_window(spec: CellBlockSpec, rs_ref, feats_hbm, win, sems):
    """Fetch this block's window: NR runs of RLH rows, HBM → VMEM.
    ``rs_ref`` is the block's [1, NR] SMEM row of run starts."""
    nr, rlh = spec.nr, spec.rlh
    copies = []
    for r in range(nr):
        # run starts arrive in units of 8 rows: the explicit ·8 is the
        # divisibility proof Mosaic needs to slice a tiled HBM ref at a
        # dynamic offset (f32 tiling is (8, 128)).
        start = rs_ref[0, 0, r] * 8
        cp = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, rlh), :],
            win.at[pl.ds(r * rlh, rlh), :],
            sems.at[r],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


def _split_window(spec: CellBlockSpec, win, hi, lo):
    """bf16(-pair) planes of the f32 window, built once per block."""
    w = win[:]
    hi[:] = w.astype(jnp.bfloat16)
    if spec.precise:
        lo[:] = (w - hi[:].astype(jnp.float32)).astype(jnp.bfloat16)
        return (hi, lo)
    return (hi,)


def _gather_dot(ot, wins, d, f):
    """xj_d = OTᵀ · window[:, dF:(d+1)F], summed over the hi/lo planes
    (one plane in fast mode).  f32 accumulation."""
    xj = None
    for win in wins:
        part = jax.lax.dot_general(
            ot, win[:, d * f:(d + 1) * f],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xj = part if xj is None else xj + part
    return xj


def _mp_kernel(spec: CellBlockSpec, f: int, n_pad: int, *refs):
    if spec.precise:
        (rs_ref, rel_ref, attr_ref, feats_hbm, out_ref,
         win, hi, lo, ot, sems) = refs
    else:
        (rs_ref, rel_ref, attr_ref, feats_hbm, out_ref,
         win, hi, ot, sems) = refs
        lo = None
    cap = spec.cap
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    # One-hot gather matrix, built once per block into a VMEM scratch
    # (recomputing it per irrep block would re-pay the [W, BK] compare 9×).
    rel = rel_ref[0]                                   # [1, BK] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot[:] = (iota_w == rel).astype(jnp.bfloat16)       # [W, BK]

    # Irrep-blocked: the full [BK, 9F] gathered/product tensors would not
    # fit VMEM at real window sizes — one F-wide block at a time keeps
    # peak VMEM ~an order of magnitude lower.
    attr = attr_ref[0]                                 # [BK, 3F] f32
    for d in range(9):
        widx = 0 if d == 0 else (1 if d < 4 else 2)
        xj_d = _gather_dot(ot[:], [p[:] for p in wins], d, f)
        prod = xj_d * attr[:, widx * f:(widx + 1) * f]
        # per-row segment sum over the K slots: rows are contiguous groups
        # of K edges, so a sublane-splitting reshape + sum keeps f32.
        out_ref[0, :, d * f:(d + 1) * f] = jnp.sum(
            prod.reshape(cap, k, f), axis=1)


def _mp_kernel_grouped(spec: CellBlockSpec, f: int, *refs):
    """Column-grouped forward: slots are statically partitioned per
    stencil column (spec.col_slots), so each column's one-hot contracts
    only that column's ``Wc = rpc·rlh`` window rows against its own
    ``cap·k_s`` edges — gather FLOPs ∝ W/9 instead of W.

    Edges arrive COLUMN-MAJOR (host pre-transpose: e = slot·cap + row):
    per-column slices are then static sublane/lane ranges — the row-major
    [cap, ks] → [cap·ks] flatten is a sublane-collapsing shape cast
    Mosaic cannot lower (measured 2026-08-19 on v5e)."""
    if spec.precise:
        (rs_ref, rel_ref, attr_ref, feats_hbm, out_ref,
         win, hi, lo, sems) = refs
    else:
        (rs_ref, rel_ref, attr_ref, feats_hbm, out_ref,
         win, hi, sems) = refs
        lo = None
    cap = spec.cap
    wc = spec.rpc * spec.rlh
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]                                   # [1, K'·cap] int32
    attr = attr_ref[0]                                 # [K'·cap, 3F] f32
    first = True
    off = 0
    for s, ks in enumerate(spec.col_slots):
        if ks == 0:
            continue
        bks = cap * ks
        rel_s = rel[:, off * cap:(off + ks) * cap] - s * wc   # [1, bks]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wc, bks), 0)
        ot_s = (iota_w == rel_s).astype(jnp.bfloat16)
        attr_s = attr[off * cap:(off + ks) * cap, :]          # [bks, 3F]
        for d in range(9):
            widx = 0 if d == 0 else (1 if d < 4 else 2)
            xj_d = None
            for p in wins:
                part = jax.lax.dot_general(
                    ot_s, p[s * wc:(s + 1) * wc, d * f:(d + 1) * f],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                xj_d = part if xj_d is None else xj_d + part
            prod = xj_d * attr_s[:, widx * f:(widx + 1) * f]
            # sublane-splitting reshape (slot-major edge order): sum
            # over this column's slots per row
            contrib = jnp.sum(prod.reshape(ks, cap, f), axis=0)
            if first:
                out_ref[0, :, d * f:(d + 1) * f] = contrib
            else:
                out_ref[0, :, d * f:(d + 1) * f] += contrib
        first = False
        off += ks


def blocked_neighbor_sum(attr3f, feats9, rel, run_starts, *,
                         spec: CellBlockSpec, interpret: bool = False):
    """msg[n] = Σ_k expand9(attr3f[n,k]) ⊙ feats9[window_rel_gather] for
    sorted-space inputs.  Shapes: attr3f [n_pad, K, 3F] (cutoff/pad mask
    already folded in), feats9 [n_pad, 9F], rel [n_pad, K],
    run_starts [n_blocks, NR].  Returns [n_pad, 9F] (f32 accumulation;
    gather precision set by ``spec.precise``; grouped lowering when
    ``spec.col_slots`` is set)."""
    n_pad, k, c3 = attr3f.shape
    f = c3 // 3
    c9 = 3 * c3
    cap = spec.cap
    n_blocks = spec.n_blocks
    bk = cap * k
    assert n_pad == spec.n_pad and feats9.shape == (n_pad, c9)

    grouped = spec.col_slots is not None
    if grouped:
        assert k == sum(spec.col_slots), (k, spec.col_slots)
        assert cap % 8 == 0, "grouped tier: cap must be 8-aligned (f32 " \
            "sublane slicing at off*cap offsets)"
        # column-major edge order (e = slot·cap + row): per-column slices
        # are static ranges in-kernel, no Mosaic-unsupported reshapes
        rel_r = rel.reshape(n_blocks, cap, k).transpose(0, 2, 1) \
                   .reshape(n_blocks, 1, k * cap)
        attr_r = attr3f.reshape(n_blocks, cap, k, c3) \
                       .transpose(0, 2, 1, 3).reshape(n_blocks, k * cap, c3)
        rel_spec = pl.BlockSpec((1, 1, k * cap), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        attr_spec = pl.BlockSpec((1, k * cap, c3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(_mp_kernel_grouped, spec, f)
    else:
        rel_r = rel.reshape(n_blocks, 1, bk)
        attr_r = attr3f.reshape(n_blocks, bk, c3)
        rel_spec = pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        attr_spec = pl.BlockSpec((1, bk, c3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(_mp_kernel, spec, f, n_pad)

    in_specs = [
        # run starts ride in SMEM one block-row at a time — a whole-
        # array scalar prefetch overflows the 1 MB SMEM at 25k blocks
        pl.BlockSpec((1, 1, spec.nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        rel_spec,
        attr_spec,
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((spec.window, c9), jnp.float32),
        pltpu.VMEM((spec.window, c9), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((spec.nr,)),
    ]
    if spec.precise:
        scratch.insert(2, pltpu.VMEM((spec.window, c9), jnp.bfloat16))
    if not grouped:
        # whole-window one-hot scratch, reused across the 9 irrep dots
        scratch.insert(-1, pltpu.VMEM((spec.window, bk), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cap, c9), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, cap, c9), jnp.float32),
        compiler_params=_cheb_vmem_params(spec, f),
        interpret=interpret,
    )(run_starts.reshape(n_blocks, 1, spec.nr) // 8,
      rel_r, attr_r, feats9.astype(jnp.float32))
    return out.reshape(n_pad, c9)


def _dattr_kernel(spec: CellBlockSpec, f: int, *refs):
    """dattr[e, c] = Σ_{b∈irrep block} g[row(e), b·F+c] · xj[e, b·F+c] —
    the fold of the output cotangent back over the irrep blocks
    (blocked analogue of message_passing._pns_dattr)."""
    if spec.precise:
        (rs_ref, rel_ref, g_ref, feats_hbm, out_ref,
         win, hi, lo, ot, sems) = refs
    else:
        (rs_ref, rel_ref, g_ref, feats_hbm, out_ref,
         win, hi, ot, sems) = refs
        lo = None
    cap = spec.cap
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]                                   # [1, BK]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot[:] = (iota_w == rel).astype(jnp.bfloat16)

    g_b = g_ref[0]                                     # [CAP, 9F] f32
    # per-edge row cotangent: repeat each of the CAP rows K times via a
    # 0/1 matmul (a broadcast+collapse reshape lowers to an unsupported
    # Mosaic gather).  In fast mode one bf16 pass on g is within the
    # storage-tier contract; precise mode adds the lo-plane pass.
    # Built once, reused for all 9 irrep blocks.
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (bk, cap), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bk, cap), 1)
    rep = (iota_e // k == iota_c).astype(jnp.bfloat16)  # [BK, CAP]
    for d in range(9):
        widx = 0 if d == 0 else (1 if d < 4 else 2)
        xj_d = _gather_dot(ot[:], [p[:] for p in wins], d, f)
        g_d = g_b[:, d * f:(d + 1) * f]
        g_hi = g_d.astype(jnp.bfloat16)
        g_e = jax.lax.dot_general(                     # [BK, F] f32
            rep, g_hi,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if spec.precise:
            g_e = g_e + jax.lax.dot_general(
                rep, (g_d - g_hi.astype(jnp.float32)).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        prod = g_e * xj_d
        if d == 0 or d == 1 or d == 4:
            out_ref[0, :, widx * f:(widx + 1) * f] = prod
        else:
            out_ref[0, :, widx * f:(widx + 1) * f] += prod


def _dattr_kernel_grouped(spec: CellBlockSpec, f: int, *refs):
    """Column-grouped dattr: per column, gather xj and fold the row
    cotangent (repeated per edge by a 0/1 matmul), writing that column's
    static lane slice of the [cap, K'·3F] output."""
    if spec.precise:
        (rs_ref, rel_ref, g_ref, feats_hbm, out_ref,
         win, hi, lo, sems) = refs
    else:
        (rs_ref, rel_ref, g_ref, feats_hbm, out_ref,
         win, hi, sems) = refs
        lo = None
    cap = spec.cap
    wc = spec.rpc * spec.rlh
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]                                   # [1, K'·cap]
    g_b = g_ref[0]                                     # [cap, 9F] f32
    off = 0
    for s, ks in enumerate(spec.col_slots):
        if ks == 0:
            continue
        bks = cap * ks
        rel_s = rel[:, off * cap:(off + ks) * cap] - s * wc   # [1, bks]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wc, bks), 0)
        ot_s = (iota_w == rel_s).astype(jnp.bfloat16)
        # row(e) = e % cap in the column-major edge order; build the
        # row-repeat 0/1 matrix from iota arithmetic (no modulo op)
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (bks, cap), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (bks, cap), 1)
        rep = (iota_e - (iota_e // cap) * cap == iota_c).astype(
            jnp.bfloat16)
        ch = [None, None, None]
        for d in range(9):
            widx = 0 if d == 0 else (1 if d < 4 else 2)
            xj_d = None
            for p in wins:
                part = jax.lax.dot_general(
                    ot_s, p[s * wc:(s + 1) * wc, d * f:(d + 1) * f],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                xj_d = part if xj_d is None else xj_d + part
            g_d = g_b[:, d * f:(d + 1) * f]
            g_hi = g_d.astype(jnp.bfloat16)
            g_e = jax.lax.dot_general(
                rep, g_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if spec.precise:
                g_e = g_e + jax.lax.dot_general(
                    rep,
                    (g_d - g_hi.astype(jnp.float32)).astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            prod = g_e * xj_d
            ch[widx] = prod if ch[widx] is None else ch[widx] + prod
        cat = jnp.concatenate(ch, axis=1)              # [BKs, 3F]
        out_ref[0, off * cap:(off + ks) * cap, :] = cat
        off += ks


def blocked_dattr(g9, feats9, rel, run_starts, *,
                  spec: CellBlockSpec, interpret: bool = False):
    """∂attr3f of :func:`blocked_neighbor_sum`: [n_pad, K, 3F].  Invalid
    slots (rel == window sentinel) come out exactly zero."""
    n_pad, c9 = g9.shape
    f = c9 // 9
    cap = spec.cap
    n_blocks = spec.n_blocks
    k = rel.shape[1]
    bk = cap * k

    g_r = g9.reshape(n_blocks, cap, c9)
    grouped = spec.col_slots is not None
    if grouped:
        assert k == sum(spec.col_slots), (k, spec.col_slots)
        assert cap % 8 == 0, "grouped tier: cap must be 8-aligned"
        rel_r = rel.reshape(n_blocks, cap, k).transpose(0, 2, 1) \
                   .reshape(n_blocks, 1, k * cap)
        rel_spec = pl.BlockSpec((1, 1, k * cap), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, k * cap, 3 * f), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, k * cap, 3 * f),
                                         jnp.float32)
        kernel = functools.partial(_dattr_kernel_grouped, spec, f)
    else:
        rel_r = rel.reshape(n_blocks, 1, bk)
        rel_spec = pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, bk, 3 * f), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, bk, 3 * f),
                                         jnp.float32)
        kernel = functools.partial(_dattr_kernel, spec, f)

    in_specs = [
        pl.BlockSpec((1, 1, spec.nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        rel_spec,
        pl.BlockSpec((1, cap, c9), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((spec.window, c9), jnp.float32),
        pltpu.VMEM((spec.window, c9), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((spec.nr,)),
    ]
    if spec.precise:
        scratch.insert(2, pltpu.VMEM((spec.window, c9), jnp.bfloat16))
    if not grouped:
        scratch.insert(-1, pltpu.VMEM((spec.window, bk), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=_cheb_vmem_params(spec, f),
        interpret=interpret,
    )(run_starts.reshape(n_blocks, 1, spec.nr) // 8,
      rel_r, g_r, feats9.astype(jnp.float32))
    if grouped:
        out = out.reshape(n_blocks, k, cap, 3 * f).transpose(0, 2, 1, 3)
    return out.reshape(n_pad, k, 3 * f)


# ---------------------------------------------------------------------------
# Differentiable wrappers (mirror message_passing's sym/asym contracts)
# ---------------------------------------------------------------------------
#
# First-order backward runs on the blocked kernels (the MD force pass).
# Second order (force training) falls back to the XLA packed ops — the
# blocked and packed ops compute the same function (up to the gather
# precision tier), and training batches are small-molecule workloads where
# the gather path is fine.


@functools.lru_cache(maxsize=None)
def _make_blocked_ops(spec: CellBlockSpec, interpret: bool):
    """Per-spec differentiable blocked ops (spec/interpret closed over —
    they are static compile parameters, not trace values)."""

    def _fwd(attr3f, feats9, rel, run_starts):
        return blocked_neighbor_sum(attr3f, feats9, rel, run_starts,
                                    spec=spec, interpret=interpret)

    @jax.custom_vjp
    def sym(attr3f, feats9, rel, run_starts):
        return _fwd(attr3f, feats9, rel, run_starts)

    def sym_fwd(attr3f, feats9, rel, run_starts):
        return _fwd(attr3f, feats9, rel, run_starts), (
            attr3f, feats9, rel, run_starts)

    def sym_bwd(res, g):
        attr3f, feats9, rel, run_starts = res
        dfeats = blocked_neighbor_sum(attr3f, g, rel, run_starts,
                                      spec=spec, interpret=interpret)
        dattr = blocked_dattr(g, feats9, rel, run_starts,
                              spec=spec, interpret=interpret)
        return dattr, dfeats, None, None

    sym.defvjp(sym_fwd, sym_bwd)

    @jax.custom_vjp
    def asym(attr3f, attr_rev, feats9, rel, run_starts):
        return _fwd(attr3f, feats9, rel, run_starts)

    def asym_fwd(attr3f, attr_rev, feats9, rel, run_starts):
        return _fwd(attr3f, feats9, rel, run_starts), (
            attr3f, attr_rev, feats9, rel, run_starts)

    def asym_bwd(res, g):
        attr3f, attr_rev, feats9, rel, run_starts = res
        dfeats = blocked_neighbor_sum(attr_rev, g, rel, run_starts,
                                      spec=spec, interpret=interpret)
        dattr = blocked_dattr(g, feats9, rel, run_starts,
                              spec=spec, interpret=interpret)
        return dattr, jnp.zeros_like(attr_rev), dfeats, None, None

    asym.defvjp(asym_fwd, asym_bwd)
    return sym, asym


def blocked_neighbor_sum_sym(attr3f, feats9, rel, run_starts,
                             spec: CellBlockSpec, interpret: bool = False):
    """Edge-symmetric weights (attr3f[i,s_ij] == attr3f[j,s_ji]): the
    feature backward is the forward operator itself (see
    message_passing.packed_neighbor_sum_sym).  First-order VJP only —
    the MD force path; force *training* uses the packed XLA ops."""
    sym, _ = _make_blocked_ops(spec, interpret)
    return sym(attr3f, feats9, rel, run_starts)


def blocked_neighbor_sum_asym(attr3f, attr_rev, feats9, rel, run_starts,
                              spec: CellBlockSpec,
                              interpret: bool = False):
    """Direction-dependent weights with caller-recomputed reverse-edge
    weights (see message_passing.packed_neighbor_sum_asym).  First-order
    VJP only."""
    _, asym = _make_blocked_ops(spec, interpret)
    return asym(attr3f, attr_rev, feats9, rel, run_starts)


# ---------------------------------------------------------------------------
# Fused Chebyshev-attr tier: the edge weights are evaluated IN-KERNEL from
# the tabulated series (ops/pallas_cheb.py semantics), so the [N, K, 3F]
# attr tensor never exists in HBM.  At the 25k/K=96 config that tensor is
# 3.8 GB written+read per MP pass (cheb filter 93 ms/step of the 634 ms
# gather trace); at the grouped layout's K' ≈ 3K it is 11.6 GB — beyond
# HBM — so this fusion is what makes the grouped tier *possible* at 25k.
#
# Layout discipline (everything derived to avoid Mosaic transposes):
# θ/fmask ride the same flat edge layout as rel ([1, BK] lane-major).
# The basis is built TRANSPOSED — basisT[j, e] = cos(j·θ_e) — by
# broadcasting θ over sublanes; the attr recovery
# ``attr = dot(basisT, coeffs, contract j)`` → [BK, 3F] gets the
# transpose for free inside the MXU contraction.  fmask is folded into
# basisT columns (scales attr rows).  The backward works entirely in
# transposed [3F, BK] form and reduces over sublanes to emit the
# d-cotangent as a lane vector.
#
# First-order VJP, MD-only contract: coeffs/dser receive ZERO gradients
# (MD differentiates positions only); force *training* uses the packed
# XLA path (tensornet.py picks this op only under ``blocked``).
# ---------------------------------------------------------------------------


def _basis_t(th_s, fm_s, T):
    """Masked transposed Chebyshev basis for one edge slice:
    [T, bks] = fm_e · cos(j·θ_e).  ``th_s``/``fm_s`` are [1, bks]."""
    _, bks = th_s.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (T, bks), 0).astype(jnp.float32)
    return jnp.cos(j * th_s) * fm_s


def _attr_prec(spec: CellBlockSpec):
    # fast tier: one bf16 MXU pass on the basis/coeffs dot (the basis is
    # O(1)-magnitude cosines; matches the window's storage contract).
    # precise tier: f32-accurate passes.
    return (jax.lax.Precision.HIGHEST if spec.precise
            else jax.lax.Precision.DEFAULT)


def _mp_kernel_cheb(spec: CellBlockSpec, f: int, T: int, *refs):
    """Whole-window fused forward (ungrouped): one-hot gather over the
    full window + in-kernel cheb attr."""
    if spec.precise:
        (rs_ref, th_ref, fm_ref, rel_ref, co_ref, feats_hbm, out_ref,
         win, hi, lo, ot, sems) = refs
    else:
        (rs_ref, th_ref, fm_ref, rel_ref, co_ref, feats_hbm, out_ref,
         win, hi, ot, sems) = refs
        lo = None
    cap = spec.cap
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]                                    # [1, BK]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot[:] = (iota_w == rel).astype(jnp.bfloat16)

    bT = _basis_t(th_ref[0], fm_ref[0], T)              # [T, BK]
    attr = jax.lax.dot_general(
        bT, co_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_attr_prec(spec))                     # [BK, 3F]
    for d in range(9):
        widx = 0 if d == 0 else (1 if d < 4 else 2)
        xj_d = _gather_dot(ot[:], [p[:] for p in wins], d, f)
        prod = xj_d * attr[:, widx * f:(widx + 1) * f]
        out_ref[0, :, d * f:(d + 1) * f] = jnp.sum(
            prod.reshape(cap, k, f), axis=1)


def _mp_kernel_grouped_cheb(spec: CellBlockSpec, f: int, T: int, *refs):
    """Column-grouped fused forward: per-column one-hot gather (FLOPs ∝
    W/9) + in-kernel cheb attr.  Edge arrays are column-major
    (e = slot·cap + row)."""
    if spec.precise:
        (rs_ref, th_ref, fm_ref, rel_ref, co_ref, feats_hbm, out_ref,
         win, hi, lo, sems) = refs
    else:
        (rs_ref, th_ref, fm_ref, rel_ref, co_ref, feats_hbm, out_ref,
         win, hi, sems) = refs
        lo = None
    cap = spec.cap
    wc = spec.rpc * spec.rlh
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]                                    # [1, K'·cap]
    th = th_ref[0]
    fm = fm_ref[0]
    first = True
    off = 0
    for s, ks in enumerate(spec.col_slots):
        if ks == 0:
            continue
        bks = cap * ks
        sl0, sl1 = off * cap, (off + ks) * cap
        rel_s = rel[:, sl0:sl1] - s * wc                # [1, bks]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wc, bks), 0)
        ot_s = (iota_w == rel_s).astype(jnp.bfloat16)
        bT = _basis_t(th[:, sl0:sl1], fm[:, sl0:sl1], T)
        attr_s = jax.lax.dot_general(
            bT, co_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_attr_prec(spec))                 # [bks, 3F]
        for d in range(9):
            widx = 0 if d == 0 else (1 if d < 4 else 2)
            xj_d = None
            for p in wins:
                part = jax.lax.dot_general(
                    ot_s, p[s * wc:(s + 1) * wc, d * f:(d + 1) * f],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                xj_d = part if xj_d is None else xj_d + part
            prod = xj_d * attr_s[:, widx * f:(widx + 1) * f]
            contrib = jnp.sum(prod.reshape(ks, cap, f), axis=0)
            if first:
                out_ref[0, :, d * f:(d + 1) * f] = contrib
            else:
                out_ref[0, :, d * f:(d + 1) * f] += contrib
        first = False
        off += ks


def _dd_kernel_cheb(spec: CellBlockSpec, f: int, T: int, *refs):
    """Whole-window fused d-cotangent: dd[e] = Σ_c dattr[e,c]·G'[e,c]
    computed in transposed [3F, BK] form; dattr = Σ_d g_row ⊙ xj (the
    _dattr_kernel fold), G' = dot(basisT, dser)."""
    if spec.precise:
        (rs_ref, th_ref, fm_ref, rel_ref, ds_ref, g_ref, feats_hbm,
         out_ref, win, hi, lo, ot, sems) = refs
    else:
        (rs_ref, th_ref, fm_ref, rel_ref, ds_ref, g_ref, feats_hbm,
         out_ref, win, hi, ot, sems) = refs
        lo = None
    cap = spec.cap
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot[:] = (iota_w == rel).astype(jnp.bfloat16)

    bT = _basis_t(th_ref[0], fm_ref[0], T)              # [T, BK]
    gpT = jax.lax.dot_general(
        ds_ref[:], bT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_attr_prec(spec))                     # [3F, BK]

    g_b = g_ref[0]                                      # [cap, 9F]
    # repT[c, e] = (row(e) == c), row(e) = e // k (row-major edge order)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, bk), 0)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (cap, bk), 1)
    repT = (iota_e // k == iota_c).astype(jnp.bfloat16)  # [cap, BK]
    ch = [None, None, None]
    for d in range(9):
        widx = 0 if d == 0 else (1 if d < 4 else 2)
        xj_dT = None
        for p in wins:
            part = jax.lax.dot_general(
                p[:, d * f:(d + 1) * f], ot[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [F, BK]
            xj_dT = part if xj_dT is None else xj_dT + part
        g_d = g_b[:, d * f:(d + 1) * f]                 # [cap, F]
        g_hi = g_d.astype(jnp.bfloat16)
        g_eT = jax.lax.dot_general(
            g_hi, repT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [F, BK]
        if spec.precise:
            g_eT = g_eT + jax.lax.dot_general(
                (g_d - g_hi.astype(jnp.float32)).astype(jnp.bfloat16),
                repT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        prodT = g_eT * xj_dT
        ch[widx] = prodT if ch[widx] is None else ch[widx] + prodT
    dattrT = jnp.concatenate(ch, axis=0)                # [3F, BK]
    out_ref[0] = jnp.sum(dattrT * gpT, axis=0, keepdims=True)


def _dd_kernel_grouped_cheb(spec: CellBlockSpec, f: int, T: int, *refs):
    """Column-grouped fused d-cotangent (column-major edge order)."""
    if spec.precise:
        (rs_ref, th_ref, fm_ref, rel_ref, ds_ref, g_ref, feats_hbm,
         out_ref, win, hi, lo, sems) = refs
    else:
        (rs_ref, th_ref, fm_ref, rel_ref, ds_ref, g_ref, feats_hbm,
         out_ref, win, hi, sems) = refs
        lo = None
    cap = spec.cap
    wc = spec.rpc * spec.rlh
    _dma_window(spec, rs_ref, feats_hbm, win, sems)
    wins = _split_window(spec, win, hi, lo)

    rel = rel_ref[0]
    th = th_ref[0]
    fm = fm_ref[0]
    g_b = g_ref[0]                                      # [cap, 9F]
    off = 0
    for s, ks in enumerate(spec.col_slots):
        if ks == 0:
            continue
        bks = cap * ks
        sl0, sl1 = off * cap, (off + ks) * cap
        rel_s = rel[:, sl0:sl1] - s * wc
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wc, bks), 0)
        ot_s = (iota_w == rel_s).astype(jnp.bfloat16)
        bT = _basis_t(th[:, sl0:sl1], fm[:, sl0:sl1], T)
        gpT = jax.lax.dot_general(
            ds_ref[:], bT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_attr_prec(spec))                 # [3F, bks]
        # row(e) = e % cap (column-major edge order)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, bks), 0)
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (cap, bks), 1)
        repT = (iota_e - (iota_e // cap) * cap == iota_c).astype(
            jnp.bfloat16)                               # [cap, bks]
        ch = [None, None, None]
        for d in range(9):
            widx = 0 if d == 0 else (1 if d < 4 else 2)
            xj_dT = None
            for p in wins:
                part = jax.lax.dot_general(
                    p[s * wc:(s + 1) * wc, d * f:(d + 1) * f], ot_s,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [F, bks]
                xj_dT = part if xj_dT is None else xj_dT + part
            g_d = g_b[:, d * f:(d + 1) * f]
            g_hi = g_d.astype(jnp.bfloat16)
            g_eT = jax.lax.dot_general(
                g_hi, repT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if spec.precise:
                g_eT = g_eT + jax.lax.dot_general(
                    (g_d - g_hi.astype(jnp.float32)).astype(jnp.bfloat16),
                    repT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            prodT = g_eT * xj_dT
            ch[widx] = prodT if ch[widx] is None else ch[widx] + prodT
        dattrT = jnp.concatenate(ch, axis=0)            # [3F, bks]
        out_ref[0, :, sl0:sl1] = jnp.sum(dattrT * gpT, axis=0,
                                         keepdims=True)
        off += ks


def _cheb_vmem_params(spec: CellBlockSpec, f: int):
    # whole-window one-hot [W, BK] bf16 + window planes + transposed
    # intermediates routinely pass the 16 MB default at real specs
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _cheb_edge_layout(x, spec: CellBlockSpec, k):
    """[n_pad, K] edge array → per-block flat layout matching rel:
    row-major [n_blocks, 1, BK] (ungrouped) or column-major
    [n_blocks, 1, K·cap] (grouped)."""
    n_blocks, cap = spec.n_blocks, spec.cap
    if spec.col_slots is not None:
        return x.reshape(n_blocks, cap, k).transpose(0, 2, 1) \
                .reshape(n_blocks, 1, k * cap)
    return x.reshape(n_blocks, 1, cap * k)


def blocked_neighbor_sum_cheb(coeffs, theta, fmask, feats9, rel,
                              run_starts, *, spec: CellBlockSpec,
                              interpret: bool = False):
    """msg[n] = Σ_k (fm·cheb(θ))[n,k,·] ⊙ feats9[window gather] with the
    attr evaluated in-kernel.  ``coeffs`` [T, 3F] (T Chebyshev terms),
    ``theta``/``fmask`` [n_pad, K] f32 (θ = arccos of the scaled
    distance, computed by XLA — Mosaic has no acos)."""
    n_pad, k = rel.shape
    T, c3 = coeffs.shape
    f = c3 // 3
    c9 = 3 * c3
    cap = spec.cap
    n_blocks = spec.n_blocks
    bk = cap * k
    assert feats9.shape == (n_pad, c9) and n_pad == spec.n_pad

    grouped = spec.col_slots is not None
    if grouped:
        assert k == sum(spec.col_slots) and cap % 8 == 0
        kernel = functools.partial(_mp_kernel_grouped_cheb, spec, f, T)
    else:
        kernel = functools.partial(_mp_kernel_cheb, spec, f, T)
    flat_spec = pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, spec.nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        flat_spec, flat_spec, flat_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),   # coeffs whole
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((spec.window, c9), jnp.float32),
        pltpu.VMEM((spec.window, c9), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((spec.nr,)),
    ]
    if spec.precise:
        scratch.insert(2, pltpu.VMEM((spec.window, c9), jnp.bfloat16))
    if not grouped:
        scratch.insert(-1, pltpu.VMEM((spec.window, bk), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cap, c9), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, cap, c9), jnp.float32),
        compiler_params=_cheb_vmem_params(spec, f),
        interpret=interpret,
    )(run_starts.reshape(n_blocks, 1, spec.nr) // 8,
      _cheb_edge_layout(theta.astype(jnp.float32), spec, k),
      _cheb_edge_layout(fmask.astype(jnp.float32), spec, k),
      _cheb_edge_layout(rel, spec, k),
      coeffs.astype(jnp.float32),
      feats9.astype(jnp.float32))
    return out.reshape(n_pad, c9)


def blocked_dd_cheb(dser, theta, fmask, g9, feats9, rel, run_starts, *,
                    spec: CellBlockSpec, interpret: bool = False):
    """x-cotangent of :func:`blocked_neighbor_sum_cheb` w.r.t. the scaled
    distance: dd[n,k] = Σ_c dattr[n,k,c]·(Σ_j dser[j]·cos(jθ))[c]·fm —
    the caller applies the 2/(hi−lo) chain factor.  ``dser`` [T, 3F] from
    ``ops.pallas_cheb.cheb_deriv_coeffs``."""
    n_pad, c9 = g9.shape
    f = c9 // 9
    T = dser.shape[0]
    cap = spec.cap
    n_blocks = spec.n_blocks
    k = rel.shape[1]
    bk = cap * k

    grouped = spec.col_slots is not None
    if grouped:
        assert k == sum(spec.col_slots) and cap % 8 == 0
        kernel = functools.partial(_dd_kernel_grouped_cheb, spec, f, T)
    else:
        kernel = functools.partial(_dd_kernel_cheb, spec, f, T)
    flat_spec = pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, spec.nr), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        flat_spec, flat_spec, flat_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),   # dser whole
        pl.BlockSpec((1, cap, c9), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((spec.window, c9), jnp.float32),
        pltpu.VMEM((spec.window, c9), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((spec.nr,)),
    ]
    if spec.precise:
        scratch.insert(2, pltpu.VMEM((spec.window, c9), jnp.bfloat16))
    if not grouped:
        scratch.insert(-1, pltpu.VMEM((spec.window, bk), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, bk), jnp.float32),
        compiler_params=_cheb_vmem_params(spec, f),
        interpret=interpret,
    )(run_starts.reshape(n_blocks, 1, spec.nr) // 8,
      _cheb_edge_layout(theta.astype(jnp.float32), spec, k),
      _cheb_edge_layout(fmask.astype(jnp.float32), spec, k),
      _cheb_edge_layout(rel, spec, k),
      dser.astype(jnp.float32),
      g9.reshape(n_blocks, cap, c9),
      feats9.astype(jnp.float32))
    if grouped:
        return out.reshape(n_blocks, k, cap).transpose(0, 2, 1) \
                  .reshape(n_pad, k)
    return out.reshape(n_pad, k)


@functools.lru_cache(maxsize=None)
def _make_blocked_cheb_op(spec: CellBlockSpec, lo: float, hi: float,
                          interpret: bool):
    """Differentiable fused-cheb symmetric MP (first-order, MD force
    path).  Gradients flow to the DISTANCE argument and the features
    only; coeffs are treated as constants (zero cotangent) — parameter
    training uses the packed XLA path."""
    from torchmdnet_tpu.ops.pallas_cheb import cheb_deriv_coeffs

    def _theta(d):
        x = jnp.clip(2.0 * (d.astype(jnp.float32) - lo) / (hi - lo) - 1.0,
                     -1.0, 1.0)
        return jnp.arccos(x)

    def _fwd(coeffs, d, fmask, feats9, rel, run_starts):
        return blocked_neighbor_sum_cheb(
            coeffs, _theta(d), fmask, feats9, rel, run_starts,
            spec=spec, interpret=interpret)

    @jax.custom_vjp
    def sym_cheb(coeffs, d, fmask, feats9, rel, run_starts):
        return _fwd(coeffs, d, fmask, feats9, rel, run_starts)

    def fwd(coeffs, d, fmask, feats9, rel, run_starts):
        return _fwd(coeffs, d, fmask, feats9, rel, run_starts), (
            coeffs, d, fmask, feats9, rel, run_starts)

    def bwd(res, g):
        coeffs, d, fmask, feats9, rel, run_starts = res
        # edge-symmetric weights: the feature backward is the forward
        # operator applied to the cotangent (see blocked_neighbor_sum_sym)
        dfeats = _fwd(coeffs, d, fmask, g, rel, run_starts)
        dd = blocked_dd_cheb(
            cheb_deriv_coeffs(coeffs), _theta(d), fmask, g, feats9, rel,
            run_starts, spec=spec, interpret=interpret)
        dd = (dd * (2.0 / (hi - lo))).astype(d.dtype)
        return jnp.zeros_like(coeffs), dd, None, dfeats, None, None

    sym_cheb.defvjp(fwd, bwd)
    return sym_cheb


def blocked_neighbor_sum_sym_cheb(coeffs, d, fmask, feats9, rel,
                                  run_starts, spec: CellBlockSpec,
                                  lo: float, hi: float,
                                  interpret: bool = False):
    """Symmetric blocked MP with in-kernel tabulated edge weights:
    functionally ``blocked_neighbor_sum_sym(fm·cheb_filter(coeffs, d),
    feats9, ...)`` with no [N, K, 3F] materialization.  First-order VJP
    (positions + features); coeffs get zero gradient — MD only."""
    return _make_blocked_cheb_op(spec, float(lo), float(hi), interpret)(
        coeffs, d, fmask, feats9, rel, run_starts)
