"""On-device kloop-vs-scatter compaction benchmark for the cell-list
rebuild at the 25k north-star scale (VERDICT round-2 #6: the kloop default
shipped with only a CPU bit-equality test + a trace comment; this records
the device numbers that justify — or revert — the default).

Run on the real TPU: ``python tools/bench_compaction.py``.
Env: CB_N (25088), CB_K (96), CB_ITERS (20).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix
from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

N = int(os.environ.get("CB_N", 25088))
K = int(os.environ.get("CB_K", 96))
ITERS = int(os.environ.get("CB_ITERS", 20))
CUTOFF = 5.5  # model cutoff 4.5 + MD skin 1.0 (the rebuild config)

rng = np.random.RandomState(0)
L = (N / 0.1) ** (1.0 / 3.0)
pos = rng.uniform(0, L, (N, 3)).astype(np.float32)
box = np.diag([L, L, L]).astype(np.float32)
batch = jnp.zeros((N,), jnp.int32)
dims = max(int(np.floor(L / CUTOFF)), 3)
occ = N / dims**3
pj, bj = jnp.asarray(pos), jnp.asarray(box)

print(f"device={jax.devices()[0]} N={N} K={K} cutoff={CUTOFF} "
      f"dims={dims} occ={occ:.1f}")
ref = None
for compact in ("kloop", "scatter"):
    @jax.jit
    def build(p, compact=compact):
        nbr = build_neighbor_matrix(
            p, batch, strategy="cell", k_max=K, cutoff_upper=CUTOFF,
            loop=True, box=bj, cells_per_dim=(dims, dims, dims),
            cell_capacity=int(np.ceil(occ * 2.5)), compact=compact)
        return nbr.idx, nbr.mask, nbr.overflow

    idx, mask, ov = jax.block_until_ready(build(pj))
    t0 = time.time()
    for _ in range(ITERS):
        out = build(pj)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / ITERS * 1e3
    print(f"  compact={compact:>8}: {ms:8.2f} ms/build  "
          f"overflow={bool(ov)}", flush=True)
    cur = (np.asarray(idx), np.asarray(mask))
    if ref is None:
        ref = cur
    else:
        same = (np.array_equal(ref[0], cur[0])
                and np.array_equal(ref[1], cur[1]))
        print(f"  lowering outputs bit-identical: {same}")
