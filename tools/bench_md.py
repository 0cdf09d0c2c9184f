"""North-star MD benchmark (BASELINE.md config #5): periodic system at
liquid density, full on-device MD loop (cell rebuilds + Langevin), one real
TPU chip.

Since round 2 the default model is the north-star configuration itself:
**TensorNet2 + ScalarPlusWeightedCoulomb(coulomb_cutoff=10 Å)** — the
AceFF-2.0 PBC recipe (reference ``examples/aceff_examples/ase_aceff_PBC.py``
uses coulomb_cutoff=10.0).  ``MD_MODEL=tensornet`` reproduces the round-1
metric.

Env knobs: MD_N (atoms, default 25088), MD_K (neighbor slots, 96),
MD_TAB (Chebyshev terms for tensornet, 128), MD_REBUILD (25), MD_REMAT (1),
MD_EMB (fused radial-embedding kernel, 1), MD_MODEL (tensornet2),
MD_PALLAS (fused edge MLP for tensornet2, 1), MD_QDIM (16),
MD_COULOMB_RC (10.0; 0 disables the Coulomb head → plain Scalar),
MD_SYS (lattice|gas), MD_PREC (32), MD_BLOCKED (cell-blocked Pallas MP
tier, 1 — the measured 25k winner), MD_CAP (rows/block, 16),
MD_CWIN (windowed direct-pair Coulomb kernel, 1 when blocked),
MD_GROUPED (column-partitioned slots, 0 — OOMs at 25k),
MD_PRECISE (hi/lo production-force gathers, 0).
Numbers recorded in docs/PERF.md.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.md.integrators import make_md_step
from torchmdnet_tpu.ops.config import set_matmul_precision
from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
# TF32-parity matmuls (see bench.py note); MD_MATMUL=highest restores
# f32-exact
set_matmul_precision(os.environ.get("MD_MATMUL", "high"))

N = int(os.environ.get("MD_N", 25088))
TAB = int(os.environ.get("MD_TAB", 128))
K = int(os.environ.get("MD_K", 96))
REBUILD = int(os.environ.get("MD_REBUILD", 25))
MODEL = os.environ.get("MD_MODEL", "tensornet2")
QDIM = int(os.environ.get("MD_QDIM", 16))
COULOMB_RC = float(os.environ.get("MD_COULOMB_RC", 10.0))
rng = np.random.RandomState(0)
L = (N / 0.1) ** (1.0 / 3.0)
if os.environ.get("MD_SYS", "lattice") == "lattice":
    # Condensed-matter-like: jittered cubic lattice at the same density.
    # Bounded local occupancy (like a real solvated system) ⇒ K=96 is
    # honest; the ideal-gas system needs K=128 purely from Poisson tails.
    # Factor N into near-cubic grid dims that fill the box EXACTLY — a
    # partially-filled ceil(N^(1/3))³ grid leaves a vacuum slab, so the
    # occupied region sits at higher-than-nominal density and the honest
    # K rises (observed: 25088 in a 30³ grid ⇒ 92.9% fill ⇒ max count
    # >96 at 5.5 Å where a uniform lattice needs ~88).
    def _near_cubic_dims(n):
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
        return best[1] if best and best[0] < 2.0 else None

    dims = _near_cubic_dims(N)
    if dims is None:  # awkward N: fall back to ceil-grid (vacuum slab)
        npd = int(np.ceil(N ** (1.0 / 3.0)))
        dims = (npd, npd, npd)
    gx = [np.arange(d) for d in dims]
    g = (np.stack(np.meshgrid(*gx, indexing="ij"), -1)
         .reshape(-1, 3)[:N] + 0.5)
    a = L / np.array(dims, np.float64)
    pos = (g * a + rng.uniform(-0.3 * a.min(), 0.3 * a.min(), (N, 3))
           ).astype(np.float32)
else:
    pos = rng.uniform(0, L, (N, 3)).astype(np.float32)
z = rng.choice([1, 1, 6, 7, 8], N).astype(np.int32)
masses = np.where(z == 1, 1.008, 12.011).astype(np.float64)
box = np.diag([L, L, L]).astype(np.float32)

args = dict(
    model=MODEL, embedding_dimension=128, num_layers=2, num_rbf=32,
    rbf_type="expnorm", trainable_rbf=False, activation="silu",
    cutoff_lower=0.0, cutoff_upper=4.5, max_z=128, max_num_neighbors=K,
    derivative=True, prior_model=None, output_model="Scalar",
    reduce_op="sum", precision=int(os.environ.get("MD_PREC", 32)),
    equivariance_invariance_group="O(3)",
    atom_filter=-1, remat=os.environ.get("MD_REMAT", "1") == "1",
    pallas_embedding=os.environ.get("MD_EMB", "1") == "1",
)
if MODEL == "tensornet":
    args.update(tabulated_edge_mlp=TAB)
else:
    args.update(
        q_dim=QDIM,
        pallas_edge_mlp=os.environ.get("MD_PALLAS", "1") == "1",
        # θ-tabulated q-tier base terms (0 = exact rbf operand)
        q_tab=int(os.environ.get("MD_QTAB", 64)),
    )
    if COULOMB_RC > 0:
        from torchmdnet_tpu.ops.neighbors import pick_cell_grid

        _cd, _cs, _cc = pick_cell_grid([L] * 3, COULOMB_RC, N)
        args.update(
            output_model="ScalarPlusWeightedCoulomb",
            q_weights=[[1.0] * QDIM] * (args["num_layers"] + 1),
            coulomb_cutoff=COULOMB_RC,
            coulomb_neighbor_strategy="cell",
            coulomb_cells_per_dim=list(_cd),
            coulomb_cell_stencil=_cs,
            coulomb_cell_capacity=_cc,
        )
BLOCKED = os.environ.get("MD_BLOCKED", "1") == "1"
cell_block_spec = None
if BLOCKED:
    from torchmdnet_tpu.ops.cell_blocks import tune_cell_block_spec

    # tune for the skin-padded cutoff (the rebuild list is built at
    # cutoff+skin and every listed edge must be window-covered).
    # MD_GROUPED=1: column-partitioned slots (default 0 — measured
    # LOSER at 25k even with the dual embedding list: 1158.9 vs 659.5
    # ungrouped-packed, the max-sized column budgets K'~3.3K waste
    # edge-MLP work); MD_PRECISE=1: hi/lo bf16 split (production
    # forces).  Defaults = the measured 25k winner (2026-08-20):
    # ungrouped cap=16 packed-runs fast tier + fused embedding,
    # 643.6 ms/step.
    cell_block_spec = tune_cell_block_spec(
        pos, np.diag(box), 4.5 + 1.0,
        cap=int(os.environ.get("MD_CAP", 16)),
        precise=os.environ.get("MD_PRECISE", "0") == "1",
        column_slots=os.environ.get("MD_GROUPED", "0") == "1")
    print(f"blocked spec: {cell_block_spec} window="
          f"{cell_block_spec.window}", flush=True)
    args.update(cell_block_spec=cell_block_spec)
pot = create_model(args)
zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
batch = jnp.zeros((N,), jnp.int32)
q = jnp.zeros((1,), jnp.float32) if MODEL == "tensornet2" else None
t0 = time.time()
variables = jax.jit(
    lambda k, z_, p_, b_: pot.init(k, z_, p_, b_, num_mols=1, box=bj, q=q)
)(jax.random.PRNGKey(0), zj, pj, batch)
jax.block_until_ready(variables)
print(f"init compile {time.time()-t0:.0f}s", flush=True)

# dt default 0.05 fs: the benchmark potential has RANDOM weights, so its
# forces are unphysical — at dt=0.5 the lattice clusters within ~100 steps
# and the honest K=96 list overflows.  Timing is shape-static (dt cannot
# change the measured cost); the small dt just keeps the overflow surface
# clean over the measured window.
# Windowed direct-pair Coulomb (ops/pallas_coulomb.py): default on
# whenever the blocked tier + Coulomb head are active — it replaces the
# skin-cached ~770-slot list (and its rebuild) with stencil-window
# Pallas kernels.  MD_CWIN=0 restores the list path.
CWIN = (BLOCKED and MODEL == "tensornet2" and COULOMB_RC > 0
        and os.environ.get("MD_CWIN", "1") == "1")
init_state, chunk, energy_fn = make_md_step(
    pot, variables, zj, batch, masses,
    dt=float(os.environ.get("MD_DT", 0.05)), num_mols=1, box=bj, q=q,
    rebuild_every=REBUILD, skin=1.0, temperature=300.0,
    neighbor_strategy="cell", cell_block_spec=cell_block_spec,
    coulomb_window_spec="auto" if CWIN else None)
t0 = time.time()
state = init_state(pos, seed=1)
jax.block_until_ready(state.pos)
print(f"init_state (incl nbr compile) {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
state = chunk(state)
jax.block_until_ready(state.pos)
print(f"first chunk (compile) {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
n_chunks = 4
if os.environ.get("MD_PROFILE"):
    with jax.profiler.trace(os.environ.get("MD_PROFILE_DIR",
                                           "/tmp/md_trace")):
        state = chunk(state)
        jax.block_until_ready(state.pos)
    n_chunks = 1
    t0 = time.time()
    state = chunk(state)
else:
    for _ in range(n_chunks):
        state = chunk(state)
jax.block_until_ready(state.pos)
dt = (time.time() - t0) / (n_chunks * REBUILD) * 1000
print(f"model={MODEL} N={N} K={K} coulomb_rc="
      f"{COULOMB_RC if MODEL != 'tensornet' else '-'}: "
      f"{dt:.1f} ms/MD-step ({1000.0/dt:.2f} steps/s), "
      f"overflow={bool(state.overflow)}", flush=True)
if bool(state.overflow):
    # identify which list overflowed (mask rows at capacity)
    mrow = np.asarray(jnp.sum(state.nbr_mask, axis=1))
    print(f"  main list: max row {mrow.max()}/{state.nbr_idx.shape[1]}",
          flush=True)
    if state.cnbr_idx is not None:
        crow = np.asarray(jnp.sum(state.cnbr_mask, axis=1))
        print(f"  coulomb list: max row {crow.max()}/"
              f"{state.cnbr_idx.shape[1]}", flush=True)
