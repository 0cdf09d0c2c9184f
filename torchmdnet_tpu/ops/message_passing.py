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


gather_nodes.defvjp(_gn_fwd, _gn_bwd)


def gather_nodes_ref(x, idx, mask):
    """Oracle with the default scatter-add transpose (tests / asymmetric
    edge sets)."""
    return jnp.where(mask[..., None], x[idx], 0.0)
