"""Mosaic in-VMEM gather probe (re-run on every jax bump).

The cell-blocked MP kernels currently emulate the per-window gather with a
one-hot MXU matmul because Mosaic exposes no usable in-VMEM gather
(docs/PERF.md negative results, 2026-08-17).  If/when a real gather lands,
the blocked tier's FLOPs drop from 2·N·K·W·9F (∝ window size) to the
HBM-traffic floor — the ~3× MP unlock.  This probe tries every known
lowering shape at the production window geometry and prints a dated
verdict per variant; grep `PROBE_RESULT` and paste the table into
docs/PERF.md.

Run: python tools/probe_mosaic_gather.py   (needs the real TPU; each
variant is compiled in a subprocess so a backend crash doesn't kill the
sweep).
"""

import functools
import json
import subprocess
import sys

VARIANTS = [
    "take_same_shape",      # take_along_axis, M == W (documented crash)
    "take_narrow",          # take_along_axis, M != W ("Shape mismatch")
    "onehot_reference",     # the production fallback (always works)
    "dynamic_slice_loop",   # fori_loop of dynamic_slice rows (scalar idx)
    "lax_gather_rows",      # lax.gather with row-offset dims
]


def _build(variant, W, M, F):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(idx_ref, x_ref, o_ref):
        x = x_ref[...]            # [W, F] window in VMEM
        idx = idx_ref[...]        # [M] int32 (or [M, F] for take)
        if variant == "take_same_shape":
            # M == W: the only take_along_axis Mosaic accepts shape-wise
            g = jnp.take_along_axis(
                x, idx.reshape(W, 1).astype(jnp.int32), axis=0)
            o_ref[...] = g
        elif variant == "take_narrow":
            g = jnp.take_along_axis(
                x, idx.reshape(M, 1).astype(jnp.int32), axis=0)
            o_ref[...] = g
        elif variant == "onehot_reference":
            oh = (idx[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (M, W), 1)).astype(jnp.float32)
            o_ref[...] = oh @ x
        elif variant == "dynamic_slice_loop":
            def body(i, _):
                row = jax.lax.dynamic_slice(
                    x, (idx[i], 0), (1, F))
                o_ref[i, :] = row[0]
                return 0
            jax.lax.fori_loop(0, M, body, 0)
        elif variant == "lax_gather_rows":
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,))
            g = jax.lax.gather(
                x, idx[:, None].astype(jnp.int32), dn, (1, F))
            o_ref[...] = g

    M_out = W if variant == "take_same_shape" else M

    @jax.jit
    def run(idx, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M_out, F), jnp.float32),
        )(idx, x)

    return run, M_out


def probe_one(variant, W=1024, M=128, F=128):
    import numpy as np

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, F).astype(np.float32))
    run, M_out = _build(variant, W, M, F)
    idx = jnp.asarray(rng.randint(0, W, (M_out,)).astype(np.int32))
    out = run(idx, x)
    out = np.asarray(jax.block_until_ready(out))
    ref = np.asarray(x)[np.asarray(idx)]
    err = float(np.abs(out - ref).max())
    return err


if __name__ == "__main__":
    if len(sys.argv) > 1:
        # child mode: probe one variant, print err or raise
        v = sys.argv[1]
        err = probe_one(v)
        print(json.dumps({"variant": v, "max_err": err}))
        sys.exit(0)
    import datetime

    stamp = datetime.date.today().isoformat()
    for v in VARIANTS:
        try:
            r = subprocess.run(
                [sys.executable, __file__, v],
                capture_output=True, text=True, timeout=600)
            if r.returncode == 0:
                res = json.loads(r.stdout.strip().splitlines()[-1])
                verdict = ("OK err=%.1e" % res["max_err"]
                           if res["max_err"] < 1e-6 else
                           "WRONG err=%.1e" % res["max_err"])
            else:
                sig = [ln for ln in (r.stderr or "").splitlines()
                       if ln.strip()][-3:]
                verdict = "FAIL: " + (" | ".join(sig))[-300:]
        except subprocess.TimeoutExpired:
            verdict = "TIMEOUT"
        print(f"PROBE_RESULT {stamp} {v}: {verdict}", flush=True)
