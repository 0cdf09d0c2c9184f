"""Headline benchmark (driver-run on real TPU).

Mirrors the reference benchmark harness (``benchmarks/inference.py``:
fwd+force ms/step, mean over timed iters, on the benchmark systems of
``benchmarks/README.md``) on the dhfr-scale system (2489 atoms), with the
flagship TensorNet config (2 layers × 128 channels, the paper's benchmark
point).

Baseline anchor: the reference publishes no absolute numbers in-tree
(BASELINE.md); the paper-scale anchor used here is ~9 ms/step for
TensorNet 2L/128d fwd+bwd on a dhfr-scale system on an A100-class GPU
(arXiv 2402.17660 ballpark).  ``vs_baseline > 1`` means faster than that
anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time
from functools import partial

import numpy as np

ASSUMED_A100_MS_PER_STEP = 9.0
N_ATOMS = int(os.environ.get("BENCH_NATOMS", 2489))
N_PAD = int(np.ceil(N_ATOMS / 128) * 128)
TIMED_ITERS = int(os.environ.get("BENCH_ITERS", 30))


def build_system(n_atoms, n_pad, density=0.1, seed=0):
    """Liquid-density periodic system (water-like 0.1 atoms/Å³)."""
    rng = np.random.RandomState(seed)
    L = (n_atoms / density) ** (1.0 / 3.0)
    # padding rows are masked out of every list/window, but they DO ride
    # the cell-block sort — spread them through the box (a co-located
    # ghost pile at the origin overflows that cell's capacity/window)
    pos = rng.uniform(0, L, (n_pad, 3)).astype(np.float32)
    pos[:n_atoms] = rng.uniform(0, L, (n_atoms, 3))
    z = np.zeros(n_pad, np.int32)
    z[:n_atoms] = rng.choice([1, 1, 6, 7, 8], n_atoms)
    seg = np.ones(n_pad, np.int32)
    seg[:n_atoms] = 0
    box = np.diag([L, L, L]).astype(np.float32)
    return z, pos, seg, box


def main():
    import jax
    import jax.numpy as jnp

    from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    # bf16_3x matmuls (~1e-6 relative): parity with the A100 anchor's
    # TF32 torch defaults; the reference-parity 1e-4 bar holds with two
    # orders of margin.  BENCH_MATMUL=highest restores f32-exact.
    from torchmdnet_tpu.ops.config import set_matmul_precision
    set_matmul_precision(os.environ.get("BENCH_MATMUL", "high"))

    from torchmdnet_tpu.models.model import create_model

    args = dict(
        model="tensornet",
        embedding_dimension=128,
        num_layers=2,
        num_rbf=32,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=4.5,
        max_z=128,
        max_num_neighbors=64,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
        # Chebyshev-tabulated edge filters (ops/pallas_cheb.py): ~17%
        # faster than the fused-MLP Pallas kernel at this scale, force
        # deviation ~2e-6 eV/Å vs the exact path.
        tabulated_edge_mlp=128,
    )
    z, pos, seg, box = build_system(N_ATOMS, N_PAD)
    if N_ATOMS > 4096:
        # O(N²) brute neighbor search is super-linear overhead at factorIX
        # scale and OOMs at stmv scale; bin per step with the cell list.
        dims = max(int(np.floor(box[0, 0] / args["cutoff_upper"])), 3)
        occ = N_ATOMS / dims**3
        args.update(
            neighbor_strategy="cell",
            cells_per_dim=(dims, dims, dims),
            cell_capacity=int(np.ceil(occ * 2.5)),
        )
    # Cell-blocked Pallas MP tier for the headline chain (BENCH_BLOCKED=1):
    # per-step block planning + sorted-space evaluation — the same work the
    # gather path's per-step neighbor rebuild does, so the comparison is
    # honest.  BENCH_GROUPED=1 adds the column-partitioned slot layout
    # (gather FLOPs ∝ W/9); BENCH_PRECISE=1 the hi/lo production-force
    # gathers.
    blocked = os.environ.get("BENCH_BLOCKED", "0") == "1"
    spec = None
    if blocked:
        import jax.numpy as _jnp

        from torchmdnet_tpu.ops.cell_blocks import tune_cell_block_spec

        spec = tune_cell_block_spec(
            _jnp.asarray(pos), _jnp.asarray(np.diag(box)),
            args["cutoff_upper"],
            cap=int(os.environ.get("BENCH_CAP", 16)),
            precise=os.environ.get("BENCH_PRECISE", "0") == "1",
            column_slots=os.environ.get("BENCH_GROUPED", "1") == "1")
        args.update(cell_block_spec=spec)
    pot = create_model(args)
    zj, pj, sj, bj = map(jnp.asarray, (z, pos, seg, box))

    variables = jax.jit(partial(pot.init, num_mols=1))(
        jax.random.PRNGKey(0), zj, pj, sj, box=bj
    )

    if blocked:
        from torchmdnet_tpu.ops.cell_blocks import (
            BlockedMP,
            edge_rel,
            plan_cell_blocks,
        )
        from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix

        bd = jnp.diag(bj)
        nbr_kw = dict(strategy="brute", k_max=args["max_num_neighbors"],
                      cutoff_upper=args["cutoff_upper"], loop=True, box=bj)
        if spec.col_slots is not None:
            nz = max(int(box[2, 2] // args["cutoff_upper"]), 3)
            occ = N_ATOMS / (spec.nx * spec.ny * nz)
            nbr_kw = dict(
                strategy="cell", k_max=sum(spec.col_slots),
                cutoff_upper=args["cutoff_upper"], loop=True, box=bj,
                cells_per_dim=(spec.nx, spec.ny, nz),
                cell_capacity=int(np.ceil(occ * 2.5)) + 8,
                column_partition=spec.col_slots)

        def blocked_eval(params, p):
            """Mirror of the MD integrator's blocked _rebuild + eval
            (md/integrators.py), per step.  Returns (y, forces in the
            ORIGINAL atom order) so the chain feedback stays comparable."""
            blocks = plan_cell_blocks(p, bd, spec)
            perm_safe = jnp.minimum(blocks.perm, N_PAD - 1)
            batch_perm = sj[perm_safe]
            am_s = blocks.mask_rows & (batch_perm < 1)
            pos_s = jnp.where(am_s[:, None], p[perm_safe], 0.0)
            zs = jnp.where(am_s, zj[perm_safe], 0)
            batchs = jnp.where(am_s, batch_perm, 1)
            nbr = build_neighbor_matrix(pos_s, batchs, atom_mask=am_s,
                                        **nbr_kw)
            rel, _ = edge_rel(blocks, nbr.idx, nbr.mask, pos_s, bd)
            y, neg_dy = pot.apply(
                params, zs, pos_s, batchs, box=bj, num_mols=1, nbr=nbr,
                blocked=BlockedMP(rel, blocks.run_starts))
            return y, neg_dy[blocks.inv_perm]

        eval_fn = blocked_eval
    else:
        def eval_fn(params, p):
            return pot.apply(params, zj, p, sj, box=bj, num_mols=1)

    step = jax.jit(eval_fn)

    t0 = time.time()
    y, f = step(variables, pj)
    jax.block_until_ready((y, f))
    compile_s = time.time() - t0

    # timed loop: chained steps fully on device (positions feed back, as in
    # the on-device MD loop) — excludes host↔device round-trip latency
    @jax.jit
    def chain(params, pos0, iters):
        def body(i, p):
            _, fstep = eval_fn(params, p)
            # non-foldable feedback: `0.0 * fstep` can be constant-folded
            # into an identity loop by XLA (observed with the cell
            # strategy); 1e-24·F keeps the dependency with no physical
            # motion.
            return p + 1e-24 * fstep
        return jax.lax.fori_loop(0, iters, body, pos0)

    out = chain(variables, pj, 2)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain(variables, pj, TIMED_ITERS)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / TIMED_ITERS * 1000.0

    result = {
        "metric": f"tensornet_2L128d_fwd_force_ms_{N_ATOMS}atoms",
        "value": round(ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(ASSUMED_A100_MS_PER_STEP / ms, 3),
        "extra": {
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "n_pad": N_PAD,
            "energy": float(np.asarray(y)[0, 0]),
        },
    }
    print(json.dumps(result), flush=True)


def bench_northstar():
    """North-star metric (BASELINE.md config #5): TensorNet2 +
    ScalarPlusWeightedCoulomb(10 Å) full on-device MD step at 25k atoms —
    the AceFF-2.0 PBC recipe (reference
    ``examples/aceff_examples/ase_aceff_PBC.py`` uses coulomb_cutoff=10.0),
    condensed-matter occupancy (jittered lattice), cell-list rebuild every
    25 steps with a 1 Å skin, Langevin integrator, everything jitted on one
    chip (the TPU answer to the reference CUDA-graph MD path,
    ``calculators.py:150-169``).

    Anchor: the dhfr-scale A100 anchor (~9 ms for TensorNet 2L/128d at
    2489 atoms) scaled linearly to 25088 atoms ≈ 90.7 ms/step.  The real
    A100 TensorNet2+Coulomb cost would be higher (charge equilibration +
    10 Å Coulomb head), so ``vs_baseline`` here is conservative.
    """
    import jax
    import jax.numpy as jnp

    from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    # chunk budget measured best at 25k (docs/PERF.md); read at trace time
    os.environ.setdefault("TMDNET_MP_BUDGET_MB", "512")
    # Set the matmul precision HERE (not only in main()) so the metric is
    # the same whether this runs standalone (--northstar-only) or after
    # the dhfr chain.  Default "high" = bf16_3x, TF32-parity with the A100
    # anchor's torch defaults; recorded in the JSON extra below.
    from torchmdnet_tpu.ops.config import set_matmul_precision
    matmul_prec = os.environ.get("BENCH_MATMUL", "high")
    set_matmul_precision(matmul_prec)

    from torchmdnet_tpu.md.integrators import make_md_step
    from torchmdnet_tpu.models.model import create_model
    from torchmdnet_tpu.ops.neighbors import pick_cell_grid

    n = int(os.environ.get("BENCH_MD_NATOMS", 25088))
    anchor_ms = ASSUMED_A100_MS_PER_STEP * n / 2489.0
    k = 96
    rebuild = 25
    coulomb_rc = 10.0
    rng = np.random.RandomState(0)
    L = (n / 0.1) ** (1.0 / 3.0)
    # jittered cubic lattice at liquid density: bounded local occupancy
    # (a random gas needs K=128 purely from Poisson tails — docs/PERF.md)
    dims = _near_cubic_dims(n)
    gx = [np.arange(d) for d in dims]
    g = (np.stack(np.meshgrid(*gx, indexing="ij"), -1)
         .reshape(-1, 3)[:n] + 0.5)
    a = L / np.array(dims, np.float64)
    pos = (g * a + rng.uniform(-0.3 * a.min(), 0.3 * a.min(), (n, 3))
           ).astype(np.float32)
    z = rng.choice([1, 1, 6, 7, 8], n).astype(np.int32)
    masses = np.where(z == 1, 1.008, 12.011).astype(np.float64)
    box = np.diag([L, L, L]).astype(np.float32)

    qdim = 16
    cd, cs, cc = pick_cell_grid([L] * 3, coulomb_rc, n)
    args = dict(
        model="tensornet2", embedding_dimension=128, num_layers=2,
        num_rbf=32, rbf_type="expnorm", trainable_rbf=False,
        activation="silu", cutoff_lower=0.0, cutoff_upper=4.5, max_z=128,
        max_num_neighbors=k, derivative=True, prior_model=None,
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        remat=True, pallas_embedding=True, pallas_edge_mlp=True,
        q_dim=qdim,
        output_model="ScalarPlusWeightedCoulomb",
        q_weights=[[1.0] * qdim] * 3,
        coulomb_cutoff=coulomb_rc,
        coulomb_neighbor_strategy="cell",
        coulomb_cells_per_dim=list(cd),
        coulomb_cell_stencil=cs,
        coulomb_cell_capacity=cc,
    )
    # Cell-blocked fused q-tier ON by default — the measured winner at the
    # 25k north-star (2026-08-20, real v5e): blocked fast ungrouped cap=16
    # 904.7 ms/step vs 1195.6 gather.  Grouped (column-partitioned) specs
    # OOM HBM at this scale (col_slots sum K'=320 inflates every [N,K']
    # edge array 3.3x) — ungrouped is the production tier here.
    cell_block_spec = None
    if os.environ.get("BENCH_MD_BLOCKED", "1") == "1":
        from torchmdnet_tpu.ops.cell_blocks import tune_cell_block_spec

        cell_block_spec = tune_cell_block_spec(
            jnp.asarray(pos), jnp.asarray(np.diag(box)), 4.5 + 1.0,
            cap=int(os.environ.get("BENCH_MD_CAP", 16)),
            precise=os.environ.get("BENCH_MD_PRECISE", "0") == "1",
            column_slots=os.environ.get("BENCH_MD_GROUPED", "0") == "1")
        args.update(cell_block_spec=cell_block_spec)
    pot = create_model(args)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    batch = jnp.zeros((n,), jnp.int32)
    q = jnp.zeros((1,), jnp.float32)
    t0 = time.time()
    variables = jax.jit(
        lambda key, z_, p_, b_: pot.init(key, z_, p_, b_, num_mols=1,
                                         box=bj, q=q)
    )(jax.random.PRNGKey(0), zj, pj, batch)
    jax.block_until_ready(variables)
    # Windowed direct-pair Coulomb tier (ops/pallas_coulomb.py): the
    # round-4 measured winner (904.7 -> 763.0 ms at 25k) — replaces the
    # skin-cached ~770-slot Coulomb list and its rebuild with stencil
    # windows over the SAME cell-block sort.  BENCH_MD_CWIN=0 restores
    # the list path.
    cwin = (cell_block_spec is not None
            and os.environ.get("BENCH_MD_CWIN", "1") == "1")
    init_state, chunk, _ = make_md_step(
        pot, variables, zj, batch, masses, dt=0.05, num_mols=1, box=bj,
        q=q, rebuild_every=rebuild, skin=1.0, temperature=300.0,
        neighbor_strategy="cell", cell_block_spec=cell_block_spec,
        coulomb_window_spec="auto" if cwin else None)
    state = init_state(pos, seed=1)
    state = chunk(state)
    jax.block_until_ready(state.pos)
    compile_s = time.time() - t0
    n_chunks = int(os.environ.get("BENCH_MD_CHUNKS", 4))
    t0 = time.time()
    for _ in range(n_chunks):
        state = chunk(state)
    jax.block_until_ready(state.pos)
    ms = (time.time() - t0) / (n_chunks * rebuild) * 1000.0
    print(json.dumps({
        "metric": f"tensornet2_coulomb10A_md_ms_{n}atoms",
        "value": round(ms, 3),
        "unit": "ms/MD-step",
        "vs_baseline": round(anchor_ms / ms, 3),
        "extra": {
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "steps_per_sec": round(1000.0 / ms, 2),
            "blocked": cell_block_spec is not None,
            "cwin": cwin,
            "matmul": matmul_prec,
            "precise": os.environ.get("BENCH_MD_PRECISE", "0") == "1",
            "grouped": os.environ.get("BENCH_MD_GROUPED", "0") == "1",
            "overflow": bool(state.overflow),
            "anchor_ms": round(anchor_ms, 1),
        },
    }), flush=True)


def _near_cubic_dims(n):
    """Factor ``n`` into near-cubic grid dims that fill the box exactly
    (a partially-filled ceil-grid leaves a vacuum slab — docs/PERF.md)."""
    best = None
    for nx in range(2, int(round(n ** (1 / 3))) + 9):
        if n % nx:
            continue
        m = n // nx
        for ny in range(2, int(np.sqrt(m)) + 2):
            if m % ny:
                continue
            nz = m // ny
            spread = max(nx, ny, nz) / min(nx, ny, nz)
            if best is None or spread < best[0]:
                best = (spread, (nx, ny, nz))
    if best and best[0] < 2.0:
        return best[1]
    npd = int(np.ceil(n ** (1.0 / 3.0)))
    return (npd, npd, npd)


def bench_train():
    """Extras mode (``python bench.py --train``): training throughput,
    samples/sec on QM9-scale molecules (TensorNet 2L×128, energy+force
    loss, AdamW) through the real jitted train step."""
    import jax
    import jax.numpy as jnp

    from torchmdnet_tpu.models.model import create_model
    from torchmdnet_tpu.train.step import create_train_state, make_train_step
    from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    batch_mols = int(os.environ.get("BENCH_TRAIN_MOLS", 64))
    atoms_per_mol = 24
    n = batch_mols * atoms_per_mol
    n_pad = int(np.ceil((n + 1) / 128) * 128)

    args = dict(
        model="tensornet", embedding_dimension=128, num_layers=2,
        num_rbf=32, rbf_type="expnorm", trainable_rbf=False,
        activation="silu", cutoff_lower=0.0, cutoff_upper=5.0, max_z=128,
        max_num_neighbors=40, derivative=True, prior_model=None,
        output_model="Scalar", reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        pallas_edge_mlp=False,
        tabulated_edge_mlp=int(os.environ.get("BENCH_TRAIN_TAB", 0)),
    )
    pot = create_model(args)

    rng = np.random.RandomState(0)
    z = np.zeros(n_pad, np.int32)
    batch = np.full(n_pad, batch_mols, np.int32)  # ghost segment
    pos = np.zeros((n_pad, 3), np.float32)
    for m in range(batch_mols):
        s = slice(m * atoms_per_mol, (m + 1) * atoms_per_mol)
        z[s] = rng.choice([1, 1, 6, 7, 8], atoms_per_mol)
        batch[s] = m
        pos[s] = rng.uniform(-4, 4, (atoms_per_mol, 3)) + m  # separate mols
    db = {
        "z": jnp.asarray(z), "pos": jnp.asarray(pos),
        "batch": jnp.asarray(batch),
        "y": jnp.asarray(rng.randn(batch_mols, 1).astype(np.float32)),
        "neg_dy": jnp.asarray(rng.randn(n_pad, 3).astype(np.float32)),
        "mol_mask": jnp.ones((batch_mols,), bool),
    }

    variables = jax.jit(partial(pot.init, num_mols=batch_mols))(
        jax.random.PRNGKey(0), db["z"], db["pos"], db["batch"]
    )
    state = create_train_state(variables["params"], lr=1e-4)
    step = jax.jit(
        make_train_step(pot, num_mols=batch_mols, lr=1e-4),
        donate_argnums=0,
    )

    state, _ = step(state, db)  # compile
    jax.block_until_ready(state.params)
    # 200-iter chains measured ~1.81 ms/step vs 1.99 at 20 iters (host
    # dispatch amortization); 100 keeps the run short but stable
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", 100))
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, db)
    jax.block_until_ready(metrics["loss"])
    sec = (time.time() - t0) / iters
    print(json.dumps({
        "metric": "tensornet_2L128d_train_samples_per_sec",
        "value": round(batch_mols / sec, 1),
        "unit": "mol/s",
        "vs_baseline": None,
        "extra": {"ms_per_step": round(sec * 1000, 2),
                  "batch_mols": batch_mols, "atoms_per_mol": atoms_per_mol,
                  "loss": float(np.asarray(metrics["loss"]))},
    }))


if __name__ == "__main__":
    import sys

    if "--train" in sys.argv:
        bench_train()
    elif "--dhfr-only" in sys.argv:
        main()
    elif "--northstar-only" in sys.argv:
        bench_northstar()
    else:
        # Two metric lines; the north-star (BASELINE.json target) prints
        # LAST so the driver's tail-JSON parse records it as primary.
        main()
        bench_northstar()
