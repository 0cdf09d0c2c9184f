"""Scatter-free neighbor gathers for message passing.

All message passing here reduces to ``x[idx[n,k]]`` gathers over the dense
neighbor matrix followed by masked weighted sums.  The autodiff transpose
of a gather is an XLA scatter-add — slow on TPU with duplicate indices.
The reference avoids atomics in its backward kernels by iterating the
column-CSR instead of the row-CSR (``warp_kernels/tensornet_mp.py:80-131``);
the dense-matrix equivalent exploits that the edge set is **symmetric**
(``include_transpose`` semantics: row i contains j ⇔ row j contains i):

* ``rev_slot[n,k]`` = the slot of ``n`` in row ``idx[n,k]``.  The map
  ``(n,k) → (idx[n,k], rev_slot[n,k])`` is an **involution** on valid
  slots.
* transpose of the masked gather = sum over k of the masked *reverse*
  gather — itself a gather, and self-adjoint, so every derivative order
  (forces, force-training double backward) stays scatter-free.
"""

import jax
import jax.numpy as jnp


def reverse_slots(idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """rev_slot[n,k] = position of n in row idx[n,k] (0 on invalid slots).

    The match is restricted to VALID slots of the reverse row: padding
    slots store the row index (idx = row), which aliases the self edge —
    with a valid-first slot layout the first match happened to be right,
    but column-partitioned layouts (ops/neighbors.py column_partition)
    interleave padding before the valid self slot, so the mask must
    participate.  The [C,K,K] comparison block is chunked over rows with
    ``lax.map`` so the transient stays bounded (unchunked it is N·K²·4 B —
    0.9 GB at the 25k/K=96 MD config).
    """
    n, k = idx.shape
    chunk = _row_chunks(n, k, k, budget_bytes=128 * 1024 * 1024)
    me = jnp.arange(n, dtype=idx.dtype)

    def one(args):
        idx_c, me_c = args
        rows = jnp.take(idx, idx_c, axis=0)  # [C, K, K]
        rmask = jnp.take(mask, idx_c, axis=0)
        return jnp.argmax(
            (rows == me_c[:, None, None]) & rmask, axis=-1
        ).astype(jnp.int32)

    slot = _map_rows(one, (idx, me), n, chunk)
    return jnp.where(mask, slot, 0)


@jax.custom_vjp
def gather_rev(g: jnp.ndarray, idx, rev_slot, mask):
    """Masked reverse gather ``g[idx[n,k], rev_slot[n,k]]`` — self-adjoint
    (an involution on the valid slot set)."""
    out = g[idx, rev_slot]
    return jnp.where(mask[..., None], out, 0.0)


def _grev_fwd(g, idx, rev_slot, mask):
    return gather_rev(g, idx, rev_slot, mask), (idx, rev_slot, mask)


def _grev_bwd(res, ct):
    idx, rev_slot, mask = res
    return gather_rev(ct, idx, rev_slot, mask), None, None, None


gather_rev.defvjp(_grev_fwd, _grev_bwd)


@jax.custom_vjp
def gather_pair_deltas(pos: jnp.ndarray, idx, rev_slot, mask):
    """``delta[i,k] = pos[i] - pos[idx[i,k]]`` with a scatter-free VJP.

    The default transpose of ``pos[idx]`` is an XLA scatter-add with
    duplicate indices (~1.2 ms at dhfr scale in the force pass); with the
    slot involution it is the row sum of the (self-adjoint) reverse gather:
    ``dpos[j] = Σ_k ct[j,k] - Σ_k ct[idx[j,k], rev_slot[j,k]]``.
    """
    return pos[:, None, :] - pos[idx]


def _gpd_fwd(pos, idx, rev_slot, mask):
    return gather_pair_deltas(pos, idx, rev_slot, mask), (
        idx, rev_slot, mask
    )


def _gpd_bwd(res, ct):
    idx, rev_slot, mask = res
    # ct on invalid slots must not contribute to the reverse term (their
    # forward value is pos[i] - pos[i] but downstream zeroes them, so any
    # nonzero ct there would corrupt dpos through the unmasked gather).
    ct = jnp.where(mask[..., None], ct, 0.0)
    dpos = jnp.sum(ct, axis=1) - jnp.sum(
        gather_rev(ct, idx, rev_slot, mask), axis=1
    )
    return dpos, None, None, None


gather_pair_deltas.defvjp(_gpd_fwd, _gpd_bwd)


@jax.custom_vjp
def gather_nodes(x: jnp.ndarray, idx, rev_slot, mask):
    """Masked node-feature gather ``x[idx]`` → [N, K, C] (0 on invalid
    slots), with a gather-based transpose."""
    return jnp.where(mask[..., None], x[idx], 0.0)


def _gn_fwd(x, idx, rev_slot, mask):
    return gather_nodes(x, idx, rev_slot, mask), (idx, rev_slot, mask)


def _gn_bwd(res, ct):
    idx, rev_slot, mask = res
    # transpose of the masked gather: Σ_k ct[idx[j,k'], rev_slot[j,k'], :]
    return jnp.sum(gather_rev(ct, idx, rev_slot, mask), axis=1), None, None, None


def _cast_like(x, ref_dtype):
    return x if x.dtype == ref_dtype else x.astype(ref_dtype)


gather_nodes.defvjp(_gn_fwd, _gn_bwd)


def gather_nodes_ref(x, idx, mask):
    """Oracle with the default scatter-add transpose (tests / asymmetric
    edge sets)."""
    return jnp.where(mask[..., None], x[idx], 0.0)


# ---------------------------------------------------------------------------
# Fused packed neighbor sum (TensorNet message passing at scale)
# ---------------------------------------------------------------------------

def _expand_w9(attr3f):
    """[..., 3F] edge factors → [..., 9F] irrep-block weights
    (I×1, A×3, S×5)."""
    f = attr3f.shape[-1] // 3
    w0 = attr3f[..., :f]
    w1 = attr3f[..., f:2 * f]
    w2 = attr3f[..., 2 * f:]
    return jnp.concatenate([w0, w1, w1, w1, w2, w2, w2, w2, w2], axis=-1)


# Below this gather-source size the whole reduction runs UNCHUNKED: one
# fused XLA computation with no lax.map while-loop around it.  The win is
# the staging, not cache residency: chunk operands/results round-trip
# through scratch copies (copy-start/slice-start pairs in the profile) and
# the loop serializes overlap; at dhfr scale unchunking the MP paths was
# worth ~25% of the whole fwd+force step (measured 2026-08-16, device
# trace).  Above the threshold transients must stay bounded (a full
# [N,K,9F] block is 11 GB at the 25k/K=96 MD config).
_VMEM_RESIDENT_BYTES = 64 * 1024 * 1024

# Transient budget for the row-chunked reductions.  Bigger chunks mean
# fewer lax.map steps (each step pays operand staging + serialization);
# 512 MB measured best at the 25k MD config (643.7 vs 656.6 ms/step at
# 256 MB; 1 GB regressed).  Overridable via TMDNET_MP_BUDGET_MB.
import os as _os

_CHUNK_BUDGET_BYTES = int(
    _os.environ.get("TMDNET_MP_BUDGET_MB", "512")
) * 1024 * 1024

# dattr backward lowering: "temp" (one [C,K,9F] gather + slice folds),
# "blocked" (9 per-block gathers — wins 7%/MD-step in the chunked large-N
# regime but loses ~3 ms at dhfr where it flips global layouts), "einsum"
# (block gathers fused into dot_generals).  "auto" = blocked when
# row-chunking is active, temp otherwise.
_DATTR_MODE = _os.environ.get("TMDNET_DATTR", "auto")

# Gather-storage tier (TMDNET_MP_STORAGE=bf16): the MP row gathers run at
# ~330 GB/s and dominate the 25k MD step; storing the *gathered operands*
# (node features and backward cotangents) in bf16 halves that traffic while
# every reduction still accumulates in f32 (the einsum output dtype).  Edge
# weights (attr3f) stay f32 — they are read contiguously at full bandwidth,
# so rounding them buys little and costs accuracy.  Expected error ~1e-3
# relative on forces (vs ~2e-2 for the full-bf16 `precision: 16` tier);
# validated by tests/test_mp_storage.py.
def _gather_cast(x):
    """Cast a gather *source* to the storage-tier dtype (f32 inputs only —
    f64 gradcheck paths and explicit bf16 models pass through).  Read at
    trace time so tests/benches can toggle the tier per jit compilation."""
    if (_os.environ.get("TMDNET_MP_STORAGE", "f32") == "bf16"
            and x.dtype == jnp.float32):
        return x.astype(jnp.bfloat16)
    return x


def _row_chunks(n, k, c9, budget_bytes=None, src_bytes=None):
    """Rows per chunk so the transient [C, K, 9F] block stays in budget.

    The chunk does NOT have to divide n — map the chunks with
    :func:`_map_rows`, which handles the remainder with a tail call.
    (Requiring a divisor degenerates to chunk=1 for prime n: 25087
    sequential map steps.)

    ``src_bytes``: size of the array the rows gather from; when it fits in
    VMEM (``_VMEM_RESIDENT_BYTES``) chunking is skipped entirely.
    """
    if budget_bytes is None:
        budget_bytes = _CHUNK_BUDGET_BYTES
    if src_bytes is not None and src_bytes <= _VMEM_RESIDENT_BYTES:
        return n
    per_row = k * c9 * 4
    c = max(budget_bytes // per_row, 8)
    if c >= n:
        return n
    # Prefer a divisor of n within [c/2, c]: a non-dividing chunk forces
    # _map_rows to slice off the main block — a full copy of the operand
    # (4 × 10.9 ms of [25088,96,384] slice copies per MD step at 25k).
    for d in range(c, max(c // 2, 7), -1):
        if n % d == 0:
            return d
    return c


def _map_rows(fn, arrays, n, chunk):
    """``lax.map`` ``fn`` over row-chunks of ``arrays`` (leading dim n),
    handling a non-dividing remainder with one extra ``fn`` call on the
    tail rows (zero-padding n up to a chunk multiple copies the *entire*
    operand — a 4.7 GB pad per MP pass at the 25k/K=128 MD config).

    With ``chunk >= n`` the map (and its HBM staging of operands) is
    skipped and ``fn`` runs on the full arrays."""
    if chunk >= n:
        return fn(arrays)
    main = n - n % chunk
    out = jax.lax.map(
        fn,
        tuple(a[:main].reshape((main // chunk, chunk) + a.shape[1:])
              for a in arrays),
    )
    out = jax.tree.map(
        lambda o: o.reshape((main,) + o.shape[2:]), out
    )
    if main == n:
        return out
    tail = fn(tuple(a[main:] for a in arrays))
    return jax.tree.map(
        lambda o, t: jnp.concatenate([o, t], axis=0), out, tail
    )


@jax.custom_vjp
def packed_neighbor_sum(attr3f, feats9, idx, rev_slot, mask):
    """msg[n] = Σ_k expand9(attr3f[n,k]) ⊙ feats9[idx[n,k]]  → [N, 9F].

    The [N, K, 9F] edge block never materializes globally: the reduction is
    chunked over output rows with ``lax.map`` (≤256 MB transients), and the
    backward uses the same reverse-gather trick as :func:`gather_nodes`, so
    this scales to the 25k-atom MD systems without OOM and without scatter.
    ``attr3f`` must already carry the cutoff/pad mask.
    """
    return _pns_impl(attr3f, feats9, idx, rev_slot, mask)


def _pns_impl(attr3f, feats9, idx, rev_slot, mask):
    if attr3f.dtype != feats9.dtype:
        ct = jnp.promote_types(attr3f.dtype, feats9.dtype)
        attr3f = attr3f.astype(ct)
        feats9 = feats9.astype(ct)
    n, k, c3 = attr3f.shape
    f = c3 // 3
    chunk = _row_chunks(n, k, 3 * c3, src_bytes=feats9.size * feats9.dtype.itemsize)

    # Blockwise EINSUMS (dot_generals), row-chunked: expressing each
    # F-block's weighted neighbor sum as a dot lets XLA fuse the block's
    # gather into the reduction instead of materializing + tree-reducing
    # on the VPU — 84 → 52 ms/layer fwd at the 25k/K=96 MD config
    # (measured 2026-08-16; un-chunked is no faster and lets XLA keep the
    # per-layer [N,K,3F] residents alive under remat → OOM at 25k).
    # ``attr3f`` already carries the cutoff/pad mask; padding slots gather
    # the row itself (finite), weight 0.
    feats9_g = _gather_cast(feats9)
    acc_t = attr3f.dtype

    def one(args):
        attr_c, idx_c = args
        xj = feats9_g[idx_c]
        w0 = attr_c[..., :f]
        w1 = attr_c[..., f:2 * f]
        w2 = attr_c[..., 2 * f:]
        blocks = [jnp.einsum("nkf,nkf->nf", w0, xj[..., :f],
                             preferred_element_type=acc_t)]
        for d in range(3):
            blocks.append(
                jnp.einsum("nkf,nkf->nf", w1,
                           xj[..., (1 + d) * f:(2 + d) * f],
                           preferred_element_type=acc_t)
            )
        for c in range(5):
            blocks.append(
                jnp.einsum("nkf,nkf->nf", w2,
                           xj[..., (4 + c) * f:(5 + c) * f],
                           preferred_element_type=acc_t)
            )
        return jnp.concatenate(blocks, axis=-1)

    return _map_rows(one, (attr3f, idx), n, chunk)


def _pns_fwd(attr3f, feats9, idx, rev_slot, mask):
    return packed_neighbor_sum(attr3f, feats9, idx, rev_slot, mask), (
        attr3f, feats9, idx, rev_slot, mask
    )


@jax.custom_vjp
def _pns_bwd_pair(attr3f, feats9, g, idx, rev_slot, mask):
    """Fused (∂attr, ∂feats) of the general packed neighbor sum.

    One row-chunked pass sharing the idx/rev gathers (unlike the forward,
    the gathered blocks here feed elementwise consumers and XLA
    materializes them — un-chunked that is an [N·K, 9F] temp, 10.3 GB at
    the 25k MD config, OOM; measured 2026-08-16).

    Wrapped in its own custom_vjp so *force training* — which
    differentiates through this backward — stays scatter-free: the
    second-order transpose decomposes onto :func:`packed_neighbor_sum`,
    :func:`_pns_dattr` and :func:`gather_rev`, all of which have
    gather-only VJPs to every order.
    """
    n, k, c3 = attr3f.shape
    f = c3 // 3
    # bwd gathers rows from feats9, attr3f AND g — all must be resident to
    # skip chunking (attr3f is [N,K,3F]: at dhfr scale 252 MB ⇒ chunked).
    src = max(feats9.size * feats9.dtype.itemsize,
              attr3f.size * attr3f.dtype.itemsize,
              g.size * g.dtype.itemsize)
    chunk = _row_chunks(n, k, 3 * c3, src_bytes=src)

    feats9_g = _gather_cast(feats9)
    attr3f_g = _gather_cast(attr3f)  # element-granular w_rev fetch
    g_g = _gather_cast(g)
    acc_t = attr3f.dtype

    def one(args):
        attr_c, idx_c, rev_c, mask_c, g_c = args
        # ∂attr: g[n] ⊙ feats[idx[n,k]], folded back over the irrep blocks
        xj = jnp.where(mask_c[..., None], feats9_g[idx_c], 0.0)
        gb = [g_c[:, None, b * f:(b + 1) * f] for b in range(9)]
        d0 = gb[0] * xj[..., :f]
        d1 = sum(gb[1 + d] * xj[..., (1 + d) * f:(2 + d) * f]
                 for d in range(3))
        d2 = sum(gb[4 + c] * xj[..., (4 + c) * f:(5 + c) * f]
                 for c in range(5))
        dattr_c = jnp.concatenate([d0, d1, d2], axis=-1)
        # ∂feats[j] = Σ_k' w9[i, s] ⊙ g[i],  (i, s) = reverse of (j, k')
        w_rev = attr3f_g[idx_c, rev_c]  # [C, K, 3F]
        g_rev = g_g[idx_c]  # [C, K, 9F]
        mask_e = mask_c[..., None]
        w0 = jnp.where(mask_e, w_rev[..., :f], 0.0)
        w1 = jnp.where(mask_e, w_rev[..., f:2 * f], 0.0)
        w2 = jnp.where(mask_e, w_rev[..., 2 * f:], 0.0)
        blocks = [jnp.einsum("nkf,nkf->nf", w0, g_rev[..., :f],
                             preferred_element_type=acc_t)]
        for d in range(3):
            blocks.append(
                jnp.einsum("nkf,nkf->nf", w1,
                           g_rev[..., (1 + d) * f:(2 + d) * f],
                           preferred_element_type=acc_t)
            )
        for c in range(5):
            blocks.append(
                jnp.einsum("nkf,nkf->nf", w2,
                           g_rev[..., (4 + c) * f:(5 + c) * f],
                           preferred_element_type=acc_t)
            )
        dfeats_c = jnp.concatenate(blocks, axis=-1)
        return dattr_c, dfeats_c

    return _map_rows(one, (attr3f, idx, rev_slot, mask, g), n, chunk)


def _pns_bwd_pair_fwd(attr3f, feats9, g, idx, rev_slot, mask):
    return _pns_bwd_pair(attr3f, feats9, g, idx, rev_slot, mask), (
        attr3f, feats9, g, idx, rev_slot, mask
    )


def _pns_bwd_pair_bwd(res, cts):
    # Transpose of the fused backward, on scatter-free primitives only.
    # Branch 1, dattr[n,k] = fold9(g[n] ⊙ feats9[idx[n,k]]) (= _pns_dattr):
    #   ∂g      += Σ_k expand9(ct_da)·feats9[idx]      = pns(ct_da, feats9)
    #   ∂feats9 += pns(gather_rev(ct_da), g)           (slot involution)
    # Branch 2, dfeats[j] = Σ_k expand9(attr3f[rev])·g[idx] :
    #   ∂attr3f[i,s] = fold9(g[i] ⊙ ct_df[idx[i,s]])   = _pns_dattr(g, ct_df)
    #   ∂g      += Σ_s expand9(attr3f[i,s])·ct_df[idx] = pns(attr3f, ct_df)
    attr3f, feats9, g, idx, rev_slot, mask = res
    ct_da, ct_df = cts
    ct_da = jnp.where(mask[..., None], ct_da, 0.0)
    dattr = _pns_dattr(g, ct_df, idx, rev_slot, mask)
    dg = (
        packed_neighbor_sum(ct_da, feats9, idx, rev_slot, mask)
        + packed_neighbor_sum(attr3f, ct_df, idx, rev_slot, mask)
    )
    ct_rev = gather_rev(ct_da, idx, rev_slot, mask)
    dfeats = packed_neighbor_sum(ct_rev, g, idx, rev_slot, mask)
    return (
        _cast_like(dattr, attr3f.dtype),
        _cast_like(dfeats, feats9.dtype),
        _cast_like(dg, g.dtype),
        None,
        None,
        None,
    )


_pns_bwd_pair.defvjp(_pns_bwd_pair_fwd, _pns_bwd_pair_bwd)


def _pns_bwd(res, g):
    attr3f, feats9, idx, rev_slot, mask = res
    dattr, dfeats = _pns_bwd_pair(attr3f, feats9, g, idx, rev_slot, mask)
    return (
        _cast_like(dattr, attr3f.dtype),
        _cast_like(dfeats, feats9.dtype),
        None,
        None,
        None,
    )


packed_neighbor_sum.defvjp(_pns_fwd, _pns_bwd)


# ---------------------------------------------------------------------------
# Symmetric-weight fast path (TensorNet interaction layers)
# ---------------------------------------------------------------------------
#
# In the interaction layers the per-edge weights are functions of the edge
# *distance* only (MLP(rbf(d))·C(d)·mask, ``models/tensornet.py::Interaction``;
# reference ``tensornet.py:739-743``), so both directions of a pair carry the
# same weight: attr3f[i, s_ij] == attr3f[j, s_ji].  Per channel the message
# operator Y = A_w·X is then a *symmetric* matrix, and its transpose — the
# entire backward w.r.t. features — is the forward operator itself.  No
# reverse gathers, no element-granular ``attr3f[idx, rev_slot]`` fetch: the
# feature backward costs exactly one forward (measured 2026-08-16: the
# general _pns_bwd was ~9.5 ms/layer at dhfr scale vs ~2.7 ms for a forward).
#
# NOT valid when the edge features are direction-dependent (TensorNet2's
# (q_i, q_j) pairs, the embedding's Zij) — those use the general op above.
# Like the general op, exact transposition assumes the edge set itself is
# symmetric (true below the overflow threshold; overflow drops pairs
# one-sidedly and degrades both paths identically).


def _pns_dattr_impl(g9, feats9, idx, mask):
    """∂/∂attr3f of the packed neighbor sum: fold the [N,9F] cotangent back
    over the irrep blocks.  out[n,k,bF+f] = Σ_{c∈block b} g9[n,c]·feats9[idx[n,k],c]."""
    n, k = idx.shape
    c9 = g9.shape[-1]
    f = c9 // 9
    src = max(feats9.size * feats9.dtype.itemsize,
              g9.size * g9.dtype.itemsize)
    chunk = _row_chunks(n, k, c9, src_bytes=src)

    mode = _DATTR_MODE
    if mode == "auto":
        mode = "blocked" if chunk < n else "temp"
    feats9_g = _gather_cast(feats9)
    acc_t = g9.dtype

    def one(args):
        g_c, idx_c, mask_c = args
        if mode == "einsum":
            c = idx_c.shape[0]
            x0 = feats9_g[:, :f][idx_c]
            x1 = feats9_g[:, f:4 * f][idx_c].reshape(c, -1, 3, f)
            x2 = feats9_g[:, 4 * f:][idx_c].reshape(c, -1, 5, f)
            d0 = g_c[:, None, :f] * x0
            d1 = jnp.einsum("cdf,ckdf->ckf",
                            g_c[:, f:4 * f].reshape(c, 3, f), x1,
                            preferred_element_type=acc_t)
            d2 = jnp.einsum("cdf,ckdf->ckf",
                            g_c[:, 4 * f:].reshape(c, 5, f), x2,
                            preferred_element_type=acc_t)
            return jnp.where(
                mask_c[..., None], jnp.concatenate([d0, d1, d2], axis=-1),
                0.0,
            )
        if mode == "blocked":
            maskf = mask_c[..., None]

            def blk(b):
                xjb = jnp.where(
                    maskf, feats9_g[:, b * f:(b + 1) * f][idx_c], 0.0)
                return g_c[:, None, b * f:(b + 1) * f] * xjb

            d0 = blk(0)
            d1 = blk(1) + blk(2) + blk(3)
            d2 = blk(4) + blk(5) + blk(6) + blk(7) + blk(8)
            return jnp.concatenate([d0, d1, d2], axis=-1)
        xj = jnp.where(mask_c[..., None], feats9_g[idx_c], 0.0)  # [C,K,9F]
        gb = g_c[:, None, :]
        prod = gb * xj
        d0 = prod[..., :f]
        d1 = prod[..., f:2 * f] + prod[..., 2 * f:3 * f] + prod[..., 3 * f:4 * f]
        d2 = (prod[..., 4 * f:5 * f] + prod[..., 5 * f:6 * f]
              + prod[..., 6 * f:7 * f] + prod[..., 7 * f:8 * f]
              + prod[..., 8 * f:])
        return jnp.concatenate([d0, d1, d2], axis=-1)

    return _map_rows(one, (g9, idx, mask), n, chunk)


@jax.custom_vjp
def _pns_dattr(g9, feats9, idx, rev_slot, mask):
    return _pns_dattr_impl(g9, feats9, idx, mask)


def _pns_dattr_fwd(g9, feats9, idx, rev_slot, mask):
    return _pns_dattr(g9, feats9, idx, rev_slot, mask), (
        g9, feats9, idx, rev_slot, mask
    )


def _pns_dattr_bwd(res, ct):
    # ct: [N,K,3F] cotangent of dattr.  Both pieces reduce to the general
    # packed sum (row gathers only): ∂g9 = Σ_k expand9(ct)·feats9[idx]
    # — i.e. packed_neighbor_sum(ct, feats9); ∂feats9[j] picks up, from
    # each incoming edge (i,s)↦j, expand9(ct)[i,s]·g9[i] — by the slot
    # involution that is packed_neighbor_sum(gather_rev(ct), g9).
    g9, feats9, idx, rev_slot, mask = res
    dg = packed_neighbor_sum(ct, feats9, idx, rev_slot, mask)
    ctrev = gather_rev(ct, idx, rev_slot, mask)
    dfeats = packed_neighbor_sum(ctrev, g9, idx, rev_slot, mask)
    return (
        _cast_like(dg, g9.dtype),
        _cast_like(dfeats, feats9.dtype),
        None,
        None,
        None,
    )


_pns_dattr.defvjp(_pns_dattr_fwd, _pns_dattr_bwd)


@jax.custom_vjp
def packed_neighbor_sum_sym(attr3f, feats9, idx, rev_slot, mask):
    """:func:`packed_neighbor_sum` for edge-symmetric weights
    (attr3f[i, s_ij] == attr3f[j, s_ji]): identical forward, but the
    feature backward is the forward operator itself (symmetric A_w)."""
    return _pns_impl(attr3f, feats9, idx, rev_slot, mask)


def _pns_sym_fwd(attr3f, feats9, idx, rev_slot, mask):
    return packed_neighbor_sum_sym(attr3f, feats9, idx, rev_slot, mask), (
        attr3f, feats9, idx, rev_slot, mask
    )


def _pns_sym_bwd(res, g):
    attr3f, feats9, idx, rev_slot, mask = res
    # A_w symmetric ⇒ ∂feats = A_w·g — one more forward, recursively
    # differentiable (force-training double backward reuses the same path).
    dfeats = packed_neighbor_sum_sym(attr3f, g, idx, rev_slot, mask)
    dattr = _pns_dattr(g, feats9, idx, rev_slot, mask)
    return (
        _cast_like(dattr, attr3f.dtype),
        _cast_like(dfeats, feats9.dtype),
        None,
        None,
        None,
    )


packed_neighbor_sum_sym.defvjp(_pns_sym_fwd, _pns_sym_bwd)


# ---------------------------------------------------------------------------
# Asymmetric weights with *recomputed* reverse weights (TensorNet2)
# ---------------------------------------------------------------------------
#
# TensorNet2's edge weights depend on (d, q_i, q_j) and are direction-
# dependent, so the feature backward needs the weight of each edge's
# REVERSE: the general ``_pns_bwd_pair`` fetches it element-granularly as
# ``attr3f[idx, rev_slot]`` — an N·K·3F-element arbitrary gather that XLA
# lowers to scalar loads (the dominant cost of the TensorNet2 MP backward
# at 25k atoms, device trace 2026-08-17).  But the reverse weight is
# *computable*: it is the same edge MLP evaluated with the (q_i, q_j)
# roles swapped (the distance factor is symmetric).  The model passes that
# ``attr_rev`` in; the backward then needs only ROW gathers:
#
# * ∂attr[i,k]  = fold9(g[i] ⊙ feats9[idx[i,k]])      (= _pns_dattr)
# * ∂feats9[j]  = Σ_k expand9(attr_rev[j,k]) ⊙ g[idx[j,k]]
#                 (= packed_neighbor_sum(attr_rev, g))
#
# ``attr_rev`` gets a zero first-order cotangent (the op's output does not
# depend on it), but it participates in the backward through the
# recursively differentiable packed sum, so force-training second order
# picks up the real ∂w_rev/∂θ term — and stays scatter-free to all orders.
# Under the selective-remat policy attr_rev is not saved, so its forward
# evaluation is dead code outside the backward pass.


@jax.custom_vjp
def packed_neighbor_sum_asym(attr3f, attr_rev, feats9, idx, rev_slot, mask):
    """:func:`packed_neighbor_sum` for direction-dependent weights whose
    reverse-edge weights ``attr_rev[j,k] = attr3f[idx[j,k], rev_slot[j,k]]``
    are recomputed by the caller (swapped-argument edge MLP) instead of
    fetched element-granularly."""
    return _pns_impl(attr3f, feats9, idx, rev_slot, mask)


def _pns_asym_fwd(attr3f, attr_rev, feats9, idx, rev_slot, mask):
    return packed_neighbor_sum_asym(
        attr3f, attr_rev, feats9, idx, rev_slot, mask
    ), (attr3f, attr_rev, feats9, idx, rev_slot, mask)


def _pns_asym_bwd(res, g):
    attr3f, attr_rev, feats9, idx, rev_slot, mask = res
    dattr = _pns_dattr(g, feats9, idx, rev_slot, mask)
    dfeats = packed_neighbor_sum(attr_rev, g, idx, rev_slot, mask)
    return (
        _cast_like(dattr, attr3f.dtype),
        jnp.zeros_like(attr_rev),
        _cast_like(dfeats, feats9.dtype),
        None,
        None,
        None,
    )


packed_neighbor_sum_asym.defvjp(_pns_asym_fwd, _pns_asym_bwd)


# ---------------------------------------------------------------------------
# Symmetric weighted pair dot (Coulomb head at scale)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def symmetric_weighted_pair_dot(w, a, b, idx, mask):
    """``out[n] = Σ_k w[n,k] · (a[n] · b[idx[n,k]])`` with a gather-only
    first-order VJP (reference Coulomb reduction,
    ``output_modules.py:566-588``).

    Contract: the edge set is symmetric (both directions present) and
    ``w`` is edge-symmetric (a function of the pair distance only) — then
    the transpose w.r.t. ``b`` folds onto *row* gathers through the edge
    involution, with no ``rev_slot`` needed:

    * ``∂a[n]   = Σ_k (ct[n]·w[n,k]) b[j]``
    * ``∂b[m]   = Σ_k w[m,k] (ct·a)[j]``   (edges into m ↔ edges from m)
    * ``∂w[n,k] = ct[n] · (a[n]·b[j])``

    Higher orders fall back to XLA's default gather transpose; training
    molecules are small, so that is acceptable where MD is not.
    """
    return _swpd_impl(w, a, b, idx, mask)[0]


def _swpd_impl(w, a, b, idx, mask):
    wm = jnp.where(mask, w, 0.0)
    # contraction fused into the gather consumer: only [N,K] materializes
    pd = jnp.einsum("nc,nkc->nk", a, b[idx])
    return jnp.sum(wm * pd, axis=1), pd


def _swpd_fwd(w, a, b, idx, mask):
    out, pd = _swpd_impl(w, a, b, idx, mask)
    return out, (w, a, b, idx, mask, pd)


def _swpd_bwd(res, ct):
    w, a, b, idx, mask, pd = res
    wm = jnp.where(mask, w, 0.0)
    ctw = ct[:, None] * wm  # [N, K]
    da = jnp.einsum("nk,nkc->nc", ctw, b[idx])
    db = jnp.einsum("nk,nkc->nc", wm, (ct[:, None] * a)[idx])
    dw = jnp.where(mask, ct[:, None] * pd, 0.0)
    return dw, da, db, None, None


symmetric_weighted_pair_dot.defvjp(_swpd_fwd, _swpd_bwd)
