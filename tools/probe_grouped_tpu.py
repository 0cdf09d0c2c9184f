"""Probe: compile each grouped (column-partitioned) blocked kernel on the
real TPU at a small liquid system and report pass/fail per kernel.

The grouped tiers were validated in interpret mode (tests/test_cell_blocks)
but Mosaic's layout rules (lane-offset broadcasts, offset dot operands)
only bite on hardware — this probe is the fast iteration loop.  Usage:
``python tools/probe_grouped_tpu.py [fwd|cheb|q|qgrad|all]``.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from torchmdnet_tpu.ops.cell_blocks import (
    make_cell_block_spec, plan_cell_blocks, edge_rel, tune_column_slots,
)
from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix
from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"
n, cutoff, f, r, T = 600, 3.2, 128, 32, 128
PRECISE = os.environ.get("PROBE_PRECISE", "0") == "1"

rng = np.random.RandomState(0)
L = (n / 0.1) ** (1.0 / 3.0)
pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
box = np.diag([L, L, L]).astype(np.float32)
bd = jnp.diag(jnp.asarray(box))
spec = make_cell_block_spec(np.diag(box), cutoff, n, cap=8, precise=PRECISE)
blocks = plan_cell_blocks(jnp.asarray(pos), bd, spec)
assert not bool(blocks.overflow)
perm = np.asarray(blocks.perm)
ghost = perm >= n
pos_s = jnp.asarray(np.where(ghost[:, None], 0.0, pos[np.minimum(perm, n - 1)]))
am = jnp.asarray(~ghost)
probe = build_neighbor_matrix(pos_s, strategy="brute", k_max=64,
                              cutoff_upper=cutoff, loop=True,
                              box=jnp.asarray(box), atom_mask=am)
assert not bool(probe.overflow)
col_slots = tune_column_slots(blocks, probe.idx, probe.mask, pos_s, bd)
spec = spec._replace(col_slots=col_slots)
blocks = plan_cell_blocks(jnp.asarray(pos), bd, spec)
nz = max(int(L // cutoff), 3)
occ = n / (spec.nx * spec.ny * nz)
nbr = build_neighbor_matrix(
    pos_s, strategy="cell", k_max=sum(col_slots), cutoff_upper=cutoff,
    loop=True, box=jnp.asarray(box), atom_mask=am,
    cells_per_dim=(spec.nx, spec.ny, nz),
    cell_capacity=int(np.ceil(occ * 4)) + 8, column_partition=col_slots)
assert not bool(nbr.overflow)
rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, pos_s, bd)
assert not bool(eov)
n_pad, k = rel.shape
print(f"spec: {spec} window={spec.window} K'={k}", flush=True)

attr = jnp.asarray(rng.randn(n_pad, k, 3 * f).astype(np.float32))
attr = jnp.where(nbr.mask[..., None], attr, 0.0)
feats = jnp.asarray(rng.randn(n_pad, 9 * f).astype(np.float32))


def run(name, fn):
    t0 = time.time()
    try:
        out = jax.block_until_ready(fn())
        leaves = jax.tree.leaves(out)
        ok = all(np.isfinite(np.asarray(x)).all() for x in leaves)
        print(f"PROBE {name}: {'ok' if ok else 'NON-FINITE'} "
              f"({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).split("\n")
        key = next((ln for ln in msg if "Mosaic" in ln or "layout" in ln
                    or "INTERNAL" in ln), msg[0])
        print(f"PROBE {name}: FAIL ({time.time()-t0:.0f}s): {key[:300]}",
              flush=True)


if WHICH in ("fwd", "all"):
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum

    run("grouped_plain_fwd", jax.jit(
        lambda: blocked_neighbor_sum(attr, feats, rel, blocks.run_starts,
                                     spec=spec)))

if WHICH in ("dattr", "all"):
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_dattr

    g9 = jnp.asarray(rng.randn(n_pad, 9 * f).astype(np.float32))
    run("grouped_dattr", jax.jit(
        lambda: blocked_dattr(g9, feats, rel, blocks.run_starts, spec=spec)))

if WHICH in ("cheb", "all"):
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum_cheb

    coeffs = jnp.asarray(rng.randn(T, 3 * f).astype(np.float32) * 0.1)
    theta = jnp.asarray(rng.rand(n_pad, k).astype(np.float32) * 3.0)
    fmask = nbr.mask.astype(jnp.float32)
    run("grouped_cheb_fwd", jax.jit(
        lambda: blocked_neighbor_sum_cheb(coeffs, theta, fmask, feats, rel,
                                          blocks.run_starts, spec=spec)))

if WHICH in ("q", "qgrad", "all"):
    from torchmdnet_tpu.ops.pallas_blocked_mp import (
        blocked_neighbor_sum_asym_q,
    )

    edge_attr = jnp.asarray(rng.randn(n_pad, k, r).astype(np.float32))
    cwfm = jnp.asarray(
        (rng.rand(n_pad, k) * np.asarray(nbr.mask)).astype(np.float32))
    u_i = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    u_j = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    w1a = jnp.asarray(rng.randn(r, f).astype(np.float32) / np.sqrt(r))
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) / np.sqrt(f))
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(
        rng.randn(2 * f, 3 * f).astype(np.float32) / np.sqrt(2 * f))
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    def q_fwd():
        return blocked_neighbor_sum_asym_q(
            edge_attr, cwfm, u_i, u_j, feats, nbr.mask, nbr.idx,
            nbr.rev_slot, rel, blocks.run_starts, w1a, w2, b2, w3, b3,
            spec, False)

    if WHICH in ("q", "all"):
        run("grouped_q_fwd", jax.jit(q_fwd))

    if WHICH in ("qgrad", "all"):
        def q_loss(ea, cw, ui, uj, x):
            out = blocked_neighbor_sum_asym_q(
                ea, cw, ui, uj, x, nbr.mask, nbr.idx, nbr.rev_slot,
                rel, blocks.run_starts, w1a, w2, b2, w3, b3, spec, False)
            return jnp.sum(out * out)

        run("grouped_q_grad", jax.jit(
            lambda: jax.grad(q_loss, argnums=(0, 1, 2, 3, 4))(
                edge_attr, cwfm, u_i, u_j, feats)))
