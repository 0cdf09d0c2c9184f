"""Micro-probe: windowed direct-pair Coulomb kernel on the real TPU.

Times forward and forward+backward of ``windowed_coulomb_energy`` at a
liquid-density PBC config (default N=3000, rc=6 Å — the round-4 probe
shape whose fwd measured 3.3 ms vs a 0.56 ms traffic floor), and checks
the energy against the list-path oracle.  Used to measure the
double-buffered window DMA (round-5).

Env: PROBE_N (3000), PROBE_RC (6.0), PROBE_ITERS (50).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from torchmdnet_tpu.ops.cell_blocks import (
    plan_cell_blocks,
    plan_stencil_windows,
    tune_cell_block_spec,
    tune_stencil_window_spec,
)
from torchmdnet_tpu.ops.coulomb import coulomb_cutoff_energy_w
from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix
from torchmdnet_tpu.ops.pallas_coulomb import (
    make_coulomb_windows,
    windowed_coulomb_energy,
)
from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

N = int(os.environ.get("PROBE_N", 3000))
RC = float(os.environ.get("PROBE_RC", 6.0))
ITERS = int(os.environ.get("PROBE_ITERS", 50))
EPS, FACTOR = 78.3, 7.199822
C = 8

rng = np.random.RandomState(0)
box = np.array([(N / 0.1) ** (1 / 3.0)] * 3)
pos = rng.uniform(0, 1, (N, 3)) * box
bdiag = jnp.asarray(box, jnp.float32)
spec = tune_cell_block_spec(jnp.asarray(pos, jnp.float32), bdiag, 4.5, cap=8)
wspec = tune_stencil_window_spec(
    jnp.asarray(pos, jnp.float32), bdiag, spec, RC)
print(f"spec: n_pad={spec.n_pad} cap={spec.cap}; wspec: s={wspec.s} "
      f"rpc={wspec.rpc} rlh={wspec.rlh} window={wspec.window}", flush=True)
blocks = plan_cell_blocks(jnp.asarray(pos, jnp.float32), bdiag, spec)
win = plan_stencil_windows(jnp.asarray(pos, jnp.float32), bdiag, spec, wspec)
assert not bool(win.overflow)

perm = np.asarray(blocks.perm)
mask_rows = np.asarray(blocks.mask_rows)
pos_s = np.zeros((spec.n_pad, 3), np.float32)
pos_s[mask_rows] = pos[np.minimum(perm, N - 1)[mask_rows]]
b = rng.randn(spec.n_pad, C).astype(np.float32)
qw = rng.randn(C).astype(np.float32)
cwin = make_coulomb_windows(win, wspec, blocks.mask_rows, bdiag, spec=spec)
pos_s, b, qw = map(jnp.asarray, (pos_s, b, qw))
mask_j = jnp.asarray(mask_rows)

interp = jax.default_backend() not in ("tpu", "axon")


@jax.jit
def fwd(p):
    return jnp.sum(windowed_coulomb_energy(
        p, qw, b, cwin, spec, wspec, RC, EPS, FACTOR, interp))


grad = jax.jit(jax.grad(lambda p: fwd(p)))

# correctness vs the list path
nbr = build_neighbor_matrix(
    pos_s, strategy="brute", k_max=256, cutoff_upper=RC, loop=False,
    box=jnp.diag(bdiag), atom_mask=mask_j)
assert not bool(nbr.overflow)
e_list = jnp.where(mask_j, coulomb_cutoff_energy_w(
    pos_s, qw, b, nbr.idx, nbr.mask, RC, EPS, FACTOR,
    jnp.diag(bdiag), None), 0.0)
e_win = jnp.sum(windowed_coulomb_energy(
    pos_s, qw, b, cwin, spec, wspec, RC, EPS, FACTOR, interp))
err = abs(float(e_win) - float(jnp.sum(e_list)))
print(f"energy: win={float(e_win):.6f} list={float(jnp.sum(e_list)):.6f} "
      f"|err|={err:.2e}", flush=True)
assert err < 5e-3 * max(1.0, abs(float(jnp.sum(e_list)))), "energy mismatch"

for name, f in (("fwd", fwd), ("fwd+bwd", grad)):
    out = f(pos_s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(pos_s)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name}: {dt:.3f} ms", flush=True)
