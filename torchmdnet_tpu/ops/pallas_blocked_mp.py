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
but the one-hot contraction needs only iota/compare/dot, and on the MXU
it runs ~7× faster than the XLA HBM gather at the 25k north-star shapes
(measured 2026-08-17: 10.8 ms vs 76.8 ms for the W=256 probe).

Numerics: gathered features pass through bf16 once (the dot's operand),
accumulation is f32 — the same contract as the TMDNET_MP_STORAGE=bf16
tier (~1e-3 relative force error).  Edge weights stay f32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.cell_blocks import CellBlockSpec


def _mp_kernel(spec: CellBlockSpec, f: int, n_pad: int,
               rs_ref, rel_ref, attr_ref, feats_hbm, out_ref,
               win, sems):
    cap, nr, rlh = spec.cap, spec.nr, spec.rlh
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    b = pl.program_id(0)

    copies = []
    for r in range(nr):
        start = rs_ref[b, r]
        cp = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, rlh), :],
            win.at[pl.ds(r * rlh, rlh), :],
            sems.at[r],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    rel = rel_ref[0]                                   # [1, BK] int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot = (iota_w == rel).astype(jnp.bfloat16)          # [W, BK]
    xj = jax.lax.dot_general(                          # [BK, 9F] f32
        ot, win[:].astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    attr = attr_ref[0]                                 # [BK, 3F] f32
    w0 = attr[:, :f]
    w1 = attr[:, f:2 * f]
    w2 = attr[:, 2 * f:]
    blocks = [xj[:, :f] * w0]
    for d in range(3):
        blocks.append(xj[:, (1 + d) * f:(2 + d) * f] * w1)
    for c in range(5):
        blocks.append(xj[:, (4 + c) * f:(5 + c) * f] * w2)
    prod = jnp.concatenate(blocks, axis=-1)            # [BK, 9F] f32

    # per-row segment sum over the K slots via a 0/1 matmul (rows are
    # contiguous groups of K edges; bf16 is exact on 0/1 but prod must be
    # rounded — the f32 path would need a 3-pass MXU dot).  The reshape
    # [BK, 9F] -> [CAP, K, 9F] + sum(axis=1) keeps f32 but needs a
    # sublane-splitting shape cast; prefer it when Mosaic accepts it.
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, bk), 0)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (cap, bk), 1)
    summ = (iota_e // k == iota_c).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        summ, prod.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def blocked_neighbor_sum(attr3f, feats9, rel, run_starts, *,
                         spec: CellBlockSpec, interpret: bool = False):
    """msg[n] = Σ_k expand9(attr3f[n,k]) ⊙ feats9[window_rel_gather] for
    sorted-space inputs.  Shapes: attr3f [n_pad, K, 3F] (cutoff/pad mask
    already folded in), feats9 [n_pad, 9F], rel [n_pad, K],
    run_starts [n_blocks, NR].  Returns [n_pad, 9F] (f32 accumulation,
    one bf16 pass on the gathered features)."""
    n_pad, k, c3 = attr3f.shape
    f = c3 // 3
    c9 = 3 * c3
    cap = spec.cap
    n_blocks = spec.n_blocks
    bk = cap * k
    assert n_pad == spec.n_pad and feats9.shape == (n_pad, c9)

    rel_r = rel.reshape(n_blocks, 1, bk)
    attr_r = attr3f.reshape(n_blocks, bk, c3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda i, rs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c3), lambda i, rs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cap, c9), lambda i, rs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((spec.window, c9), jnp.float32),
            pltpu.SemaphoreType.DMA((spec.nr,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mp_kernel, spec, f, n_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, cap, c9), jnp.float32),
        interpret=interpret,
    )(run_starts, rel_r, attr_r, feats9)
    return out.reshape(n_pad, c9)


def _dattr_kernel(spec: CellBlockSpec, f: int,
                  rs_ref, rel_ref, g_ref, feats_hbm, out_ref, win, sems):
    """dattr[e, c] = Σ_{b∈irrep block} g[row(e), b·F+c] · xj[e, b·F+c] —
    the fold of the output cotangent back over the irrep blocks
    (blocked analogue of message_passing._pns_dattr)."""
    cap, nr, rlh = spec.cap, spec.nr, spec.rlh
    w = spec.window
    bk = rel_ref.shape[-1]
    k = bk // cap
    b = pl.program_id(0)

    copies = []
    for r in range(nr):
        start = rs_ref[b, r]
        cp = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, rlh), :],
            win.at[pl.ds(r * rlh, rlh), :],
            sems.at[r],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    rel = rel_ref[0]                                   # [1, BK]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    ot = (iota_w == rel).astype(jnp.bfloat16)
    xj = jax.lax.dot_general(                          # [BK, 9F] f32
        ot, win[:].astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # per-edge row cotangent: repeat each of the CAP rows K times via a
    # 0/1 matmul (one bf16 pass on g — same storage-tier contract)
    g_b = g_ref[0]                                     # [CAP, 9F]
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (bk, cap), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bk, cap), 1)
    rep = (iota_e // k == iota_c).astype(jnp.bfloat16)  # [BK, CAP]
    g_e = jax.lax.dot_general(
        rep, g_b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BK, 9F]

    prod = g_e * xj
    d0 = prod[:, :f]
    d1 = prod[:, f:2 * f] + prod[:, 2 * f:3 * f] + prod[:, 3 * f:4 * f]
    d2 = (prod[:, 4 * f:5 * f] + prod[:, 5 * f:6 * f]
          + prod[:, 6 * f:7 * f] + prod[:, 7 * f:8 * f] + prod[:, 8 * f:])
    out_ref[0] = jnp.concatenate([d0, d1, d2], axis=-1)


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

    rel_r = rel.reshape(n_blocks, 1, bk)
    g_r = g9.reshape(n_blocks, cap, c9)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda i, rs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, c9), lambda i, rs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bk, 3 * f), lambda i, rs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((spec.window, c9), jnp.float32),
            pltpu.SemaphoreType.DMA((spec.nr,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_dattr_kernel, spec, f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, bk, 3 * f), jnp.float32),
        interpret=interpret,
    )(run_starts, rel_r, g_r, feats9)
    return out.reshape(n_pad, k, 3 * f)


# ---------------------------------------------------------------------------
# Differentiable wrappers (mirror message_passing's sym/asym contracts)
# ---------------------------------------------------------------------------
#
# First-order backward runs on the blocked kernels (the MD force pass).
# Second order (force training) falls back to the XLA packed ops — the
# blocked and packed ops compute the same function (up to the bf16
# storage pass), and training batches are small-molecule workloads where
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
