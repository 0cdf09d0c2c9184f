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

    Valid slots are stored ascending-j first (ops.neighbors contract), so
    the first match is the valid one even when padding slots alias the row
    index.  Cost: one [N,K,K] gather — transient, recomputed per neighbor
    build.
    """
    rows = jnp.take(idx, idx, axis=0)  # [N, K, K]
    me = jnp.arange(idx.shape[0], dtype=idx.dtype)[:, None, None]
    slot = jnp.argmax(rows == me, axis=-1).astype(jnp.int32)
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


def _row_chunks(n, k, c9, budget_bytes=256 * 1024 * 1024):
    """Rows per chunk so the transient [C, K, 9F] block stays in budget."""
    per_row = k * c9 * 4
    c = max(budget_bytes // per_row, 8)
    c = min(c, n)
    while n % c:
        c -= 1
    return c


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
    c9 = 3 * c3
    chunk = _row_chunks(n, k, c9)

    f = c3 // 3

    def one(args):
        attr_c, idx_c, mask_c = args
        xj = jnp.where(mask_c[..., None], feats9[idx_c], 0.0)
        w0 = attr_c[..., :f]
        w1 = attr_c[..., f:2 * f]
        w2 = attr_c[..., 2 * f:]
        # blockwise multiply-reduce — building the [C, K, 9F] w9 tensor
        # would add a 2× HBM round-trip over the largest array here
        blocks = [jnp.sum(w0 * xj[..., :f], axis=1)]
        for d in range(3):
            blocks.append(
                jnp.sum(w1 * xj[..., (1 + d) * f:(2 + d) * f], axis=1)
            )
        for c in range(5):
            blocks.append(
                jnp.sum(w2 * xj[..., (4 + c) * f:(5 + c) * f], axis=1)
            )
        return jnp.concatenate(blocks, axis=-1)

    out = jax.lax.map(
        one,
        (
            attr3f.reshape(n // chunk, chunk, k, c3),
            idx.reshape(n // chunk, chunk, k),
            mask.reshape(n // chunk, chunk, k),
        ),
    )
    return out.reshape(n, c9)


def _pns_fwd(attr3f, feats9, idx, rev_slot, mask):
    return packed_neighbor_sum(attr3f, feats9, idx, rev_slot, mask), (
        attr3f, feats9, idx, rev_slot, mask
    )


def _pns_bwd(res, g):
    attr3f, feats9, idx, rev_slot, mask = res
    n, k, c3 = attr3f.shape
    f = c3 // 3
    chunk = _row_chunks(n, k, 3 * c3)

    def one(args):
        attr_c, idx_c, rev_c, mask_c, g_c = args
        # ∂attr: g[n] ⊙ feats[idx[n,k]], folded back over the irrep blocks
        xj = jnp.where(mask_c[..., None], feats9[idx_c], 0.0)
        gb = [g_c[:, None, b * f:(b + 1) * f] for b in range(9)]
        d0 = gb[0] * xj[..., :f]
        d1 = sum(gb[1 + d] * xj[..., (1 + d) * f:(2 + d) * f]
                 for d in range(3))
        d2 = sum(gb[4 + c] * xj[..., (4 + c) * f:(5 + c) * f]
                 for c in range(5))
        dattr_c = jnp.concatenate([d0, d1, d2], axis=-1)
        # ∂feats[j] = Σ_k' w9[i, s] ⊙ g[i],  (i, s) = reverse of (j, k')
        w_rev = attr3f[idx_c, rev_c]  # [C, K, 3F]
        g_rev = g[idx_c]  # [C, K, 9F]
        mask_e = mask_c[..., None]
        w0 = jnp.where(mask_e, w_rev[..., :f], 0.0)
        w1 = jnp.where(mask_e, w_rev[..., f:2 * f], 0.0)
        w2 = jnp.where(mask_e, w_rev[..., 2 * f:], 0.0)
        blocks = [jnp.sum(w0 * g_rev[..., :f], axis=1)]
        for d in range(3):
            blocks.append(
                jnp.sum(w1 * g_rev[..., (1 + d) * f:(2 + d) * f], axis=1)
            )
        for c in range(5):
            blocks.append(
                jnp.sum(w2 * g_rev[..., (4 + c) * f:(5 + c) * f], axis=1)
            )
        dfeats_c = jnp.concatenate(blocks, axis=-1)
        return dattr_c, dfeats_c

    dattr, dfeats = jax.lax.map(
        one,
        (
            attr3f.reshape(n // chunk, chunk, k, c3),
            idx.reshape(n // chunk, chunk, k),
            rev_slot.reshape(n // chunk, chunk, k),
            mask.reshape(n // chunk, chunk, k),
            g.reshape(n // chunk, chunk, -1),
        ),
    )
    return (
        _cast_like(dattr.reshape(n, k, c3), attr3f.dtype),
        _cast_like(dfeats.reshape(n, -1), feats9.dtype),
        None,
        None,
        None,
    )


packed_neighbor_sum.defvjp(_pns_fwd, _pns_bwd)
