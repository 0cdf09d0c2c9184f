"""Neighbor-list build benchmark (reference ``benchmarks/neighbors.py:78-256``).

Times ``build_neighbor_matrix`` (brute and cell strategies) on random
periodic systems across a size ladder, batched and single-system, at a
target mean neighbor count — the same protocol as the reference harness
(density-derived cutoff, ±2× batch-size jitter).  Prints a table of
µs/build; run on the real TPU (driver env) or CPU.

Env knobs: NB_SIZES (comma list, default "1k ladder"), NB_BATCHES,
NB_DENSITY (atoms/Å³, 0.1), NB_MEAN_NEIGHBORS (32), NB_ITERS (20).
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

DENSITY = float(os.environ.get("NB_DENSITY", 0.1))
MEAN_NEIGHBORS = int(os.environ.get("NB_MEAN_NEIGHBORS", 32))
ITERS = int(os.environ.get("NB_ITERS", 20))
SIZES = [int(float(s)) for s in os.environ.get(
    "NB_SIZES", "1000,4000,16000,32000,64000").split(",")]
N_BATCHES = [int(s) for s in os.environ.get("NB_BATCHES", "1,32").split(",")]

# density-derived cutoff for the target mean neighbor count
CUTOFF = float(np.cbrt(3 * MEAN_NEIGHBORS / (4 * np.pi * DENSITY)))


def make_system(total_n, n_batches, seed=0):
    """Random uniform boxes, per-batch sizes jittered ±2× around the mean
    (reference ``benchmark_neighbors`` setup)."""
    rng = np.random.RandomState(seed)
    per = total_n // n_batches
    sizes = rng.randint(max(per // 2, 1), per * 2, n_batches)
    sizes = np.maximum(sizes + (total_n - sizes.sum()) // n_batches, 1)
    sizes[-1] += total_n - sizes.sum()
    lbox = float(np.cbrt(per / DENSITY))
    batch = np.repeat(np.arange(n_batches, dtype=np.int32), sizes)
    pos = rng.rand(int(sizes.sum()), 3).astype(np.float32) * lbox
    box = (np.eye(3) * lbox).astype(np.float32)
    return pos, batch, box, lbox


def bench(strategy, total_n, n_batches):
    pos, batch, box, lbox = make_system(total_n, n_batches)
    n = pos.shape[0]
    k_max = MEAN_NEIGHBORS * 4  # Poisson-tail headroom
    kwargs = dict(
        k_max=k_max, cutoff_upper=CUTOFF, cutoff_lower=0.0, loop=False,
        box=jnp.asarray(box),
    )
    if strategy == "cell":
        dims = max(int(np.floor(lbox / CUTOFF)), 3)
        if dims < 3:
            return None
        occ = (total_n / n_batches) / dims**3
        kwargs.update(cells_per_dim=(dims, dims, dims),
                      cell_capacity=int(np.ceil(max(occ, 1) * 3)) + 8)

    pj, bj = jnp.asarray(pos), jnp.asarray(batch)

    @jax.jit
    def build(p):
        nbr = build_neighbor_matrix(p, bj, strategy=strategy, **kwargs)
        return nbr.idx, nbr.mask, nbr.overflow

    idx, mask, overflow = jax.block_until_ready(build(pj))
    if bool(overflow):
        return float("nan")
    t0 = time.time()
    for _ in range(ITERS):
        out = build(pj)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    n_pairs = int(np.asarray(mask).sum())
    return dt * 1e6, n_pairs / max(n, 1)


def main():
    dev = jax.devices()[0]
    print(f"device={dev}  cutoff={CUTOFF:.2f} Å  density={DENSITY} "
          f"target<k>={MEAN_NEIGHBORS}")
    print(f"{'N':>8} {'batches':>8} {'strategy':>9} {'us/build':>12} "
          f"{'<k>':>6}")
    for total_n in SIZES:
        for nb in N_BATCHES:
            if total_n // max(nb, 1) < 8:
                continue
            for strategy in ("brute", "cell"):
                if strategy == "brute" and total_n > 16000:
                    continue  # O(N²) memory wall (reference caps similarly)
                if strategy == "cell" and nb > 1:
                    continue  # cell path is single-system (per-box grid)
                try:
                    res = bench(strategy, total_n, nb)
                except Exception as exc:  # report, keep the table going
                    print(f"{total_n:>8} {nb:>8} {strategy:>9}  error: {exc}")
                    continue
                if res is None:
                    continue
                us, mean_k = res
                print(f"{total_n:>8} {nb:>8} {strategy:>9} {us:>12.1f} "
                      f"{mean_k:>6.1f}", flush=True)


if __name__ == "__main__":
    main()
