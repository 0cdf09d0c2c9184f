"""End-to-end blocked-MP tier: TensorNet/TensorNet2 energies + forces in
sorted space vs the packed-gather path (interpret mode on CPU).

The blocked kernels pass the gathered features through bf16 once
(storage-tier contract), so parity tolerance is ~1e-2 relative.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.ops.cell_blocks import (
    BlockedMP,
    edge_rel,
    permute_rows,
    plan_cell_blocks,
    tune_cell_block_spec,
)
from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix


def _system(n=400, density=0.08, seed=0):
    rng = np.random.RandomState(seed)
    L = (n / density) ** (1.0 / 3.0)
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    z = rng.choice([1, 6, 8], n).astype(np.int32)
    box = np.diag([L, L, L]).astype(np.float32)
    return z, pos, box, L


def _args(model, cutoff, k):
    a = dict(
        model=model, embedding_dimension=32, num_layers=2, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=cutoff, max_z=100,
        max_num_neighbors=k, derivative=True, prior_model=None,
        output_model="Scalar", reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
    )
    if model == "tensornet2":
        a.update(q_dim=4)
    return a


@pytest.mark.parametrize("model", ["tensornet", "tensornet2"])
def test_blocked_tier_matches_packed_path(model):
    cutoff, k = 3.2, 48
    z, pos, box, L = _system()
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    q = jnp.zeros((1,), jnp.float32) if model == "tensornet2" else None

    pot = create_model(_args(model, cutoff, k))
    variables = pot.init(jax.random.PRNGKey(0), zj, pj, batch, num_mols=1,
                         box=bj, q=q)

    # reference: packed path, original order, brute list
    nbr = build_neighbor_matrix(
        pj, batch, strategy="brute", k_max=k, cutoff_upper=cutoff,
        loop=True, box=bj)
    assert not bool(nbr.overflow)

    def e_ref(p):
        return jnp.sum(pot.energy(variables, zj, p, batch, num_mols=1,
                                  box=bj, q=q, nbr=nbr))

    e0, f0 = jax.value_and_grad(e_ref)(pj)

    # blocked: sorted space
    bd = jnp.diag(bj)
    spec = tune_cell_block_spec(pj, bd, cutoff, cap=8)
    pot_b = create_model(dict(_args(model, cutoff, k),
                              cell_block_spec=spec))
    blocks = plan_cell_blocks(pj, bd, spec)
    assert not bool(blocks.overflow)
    perm_safe = jnp.minimum(blocks.perm, n - 1)
    am_s = blocks.mask_rows
    pos_s0 = jnp.where(am_s[:, None], pj[perm_safe], 0.0)
    zs = jnp.where(am_s, zj[perm_safe], 0)
    batchs = jnp.where(am_s, batch[perm_safe], 1)
    nbr_s = build_neighbor_matrix(
        pos_s0, batchs, strategy="brute", k_max=k, cutoff_upper=cutoff,
        loop=True, box=bj, atom_mask=am_s)
    assert not bool(nbr_s.overflow)
    rel, eov = edge_rel(blocks, nbr_s.idx, nbr_s.mask, pos_s0, bd)
    assert not bool(eov)

    def e_blk(p):
        p_s = permute_rows(p, perm_safe, am_s, blocks.inv_perm)
        return jnp.sum(pot_b.energy(
            variables, zs, p_s, batchs, num_mols=1, box=bj, q=q, nbr=nbr_s,
            blocked=BlockedMP(rel, blocks.run_starts)))

    e1, f1 = jax.value_and_grad(e_blk)(pj)

    e0, e1 = float(e0), float(e1)
    assert abs(e1 - e0) / (abs(e0) + 1e-6) < 1e-2
    f0, f1 = np.asarray(f0), np.asarray(f1)
    scale = np.abs(f0).max() + 1e-30
    assert np.abs(f1 - f0).max() / scale < 2e-2


def test_md_blocked_smoke():
    """make_md_step with cell_block_spec: a few steps run, forces at t=0
    match the non-blocked integrator, no overflow."""
    from torchmdnet_tpu.md.integrators import make_md_step

    cutoff, k = 3.2, 48
    z, pos, box, L = _system(n=300)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    masses = np.full((n,), 12.0)

    args = _args("tensornet", cutoff, k)
    pot = create_model(args)
    variables = pot.init(jax.random.PRNGKey(0), zj, pj, batch, num_mols=1,
                         box=bj)

    kw = dict(dt=0.2, num_mols=1, box=bj, rebuild_every=3, skin=0.5,
              temperature=None)
    init_a, chunk_a, _ = make_md_step(pot, variables, zj, batch, masses,
                                      **kw)
    spec = tune_cell_block_spec(pj, jnp.diag(bj), cutoff + 0.5, cap=8)
    pot_b = create_model(dict(args, cell_block_spec=spec))
    init_b, chunk_b, _ = make_md_step(pot_b, variables, zj, batch, masses,
                                      cell_block_spec=spec, **kw)

    sa = init_a(pos, seed=1)
    sb = init_b(pos, seed=1)
    assert not bool(sb.overflow)
    fa, fb = np.asarray(sa.force), np.asarray(sb.force)
    scale = np.abs(fa).max() + 1e-30
    assert np.abs(fb - fa).max() / scale < 2e-2

    sb = chunk_b(sb)
    assert not bool(sb.overflow)
    assert np.isfinite(np.asarray(sb.pos)).all()


def test_md_grouped_blocked_smoke():
    """Grouped (column-partitioned) + precise blocked tier through the
    full MD integrator: t=0 forces match the exact gather path to the
    production 1e-3 bar, steps run clean."""
    from torchmdnet_tpu.md.integrators import make_md_step

    cutoff, k = 3.2, 48
    z, pos, box, L = _system(n=300)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    masses = np.full((n,), 12.0)

    args = _args("tensornet", cutoff, k)
    pot = create_model(args)
    variables = pot.init(jax.random.PRNGKey(0), zj, pj, batch, num_mols=1,
                         box=bj)

    kw = dict(dt=0.2, num_mols=1, box=bj, rebuild_every=3, skin=0.5,
              temperature=None)
    init_a, _, _ = make_md_step(pot, variables, zj, batch, masses, **kw)
    spec = tune_cell_block_spec(pj, jnp.diag(bj), cutoff + 0.5, cap=8,
                                precise=True, column_slots=True)
    assert spec.col_slots is not None and len(spec.col_slots) == 9
    pot_b = create_model(dict(args, cell_block_spec=spec))
    init_b, chunk_b, _ = make_md_step(pot_b, variables, zj, batch, masses,
                                      cell_block_spec=spec, **kw)

    sa = init_a(pos, seed=1)
    sb = init_b(pos, seed=1)
    assert not bool(sb.overflow)
    fa, fb = np.asarray(sa.force), np.asarray(sb.force)
    scale = np.abs(fa).max() + 1e-30
    assert np.abs(fb - fa).max() / scale < 1e-3

    sb = chunk_b(sb)
    assert not bool(sb.overflow)
    assert np.isfinite(np.asarray(sb.pos)).all()


def test_adaptive_md_respec_on_density_spike():
    """make_adaptive_md_step survives a spec-busting configuration: the
    spec is tuned on a uniform system, then MD starts from a density-spiked
    configuration (all atoms compressed into the lower half of z) whose
    windows exceed the tuned run budget.  The engine must re-spec on the
    live geometry (logged warning), produce correct forces (vs the exact
    gather path), and carry NO sticky overflow (VERDICT round-2 weak #6)."""
    import warnings

    from torchmdnet_tpu.md.integrators import (
        make_adaptive_md_step,
        make_md_step,
    )

    cutoff, k = 3.2, 80
    z, pos, box, L = _system(n=260, seed=5)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, bj = jnp.asarray(z), jnp.asarray(box)
    masses = np.full((n,), 12.0)

    # spec tuned on the UNIFORM geometry...
    spec = tune_cell_block_spec(jnp.asarray(pos), jnp.diag(bj),
                                cutoff + 0.5, cap=8, precise=True)
    # ...but MD starts with 100 atoms rearranged onto a dense z-line in a
    # single xy-column: that column's window needs ~100 rows (≫ the
    # uniformly-tuned run budget) while per-atom neighbor counts stay
    # under K (window rows ∝ line length, neighbors ∝ local spacing) —
    # the window overflow must fire WITHOUT the sticky K overflow
    spiked = pos.copy()
    nline = 80
    spiked[:nline, 0] = 0.125 * L
    spiked[:nline, 1] = 0.125 * L
    spiked[:nline, 2] = np.linspace(0.1, L - 0.1, nline)
    blocks = plan_cell_blocks(jnp.asarray(spiked), jnp.diag(bj), spec)
    assert bool(blocks.overflow), "fixture must actually bust the spec"

    args = dict(_args("tensornet", cutoff, k),
                embedding_dimension=16, num_layers=1, num_rbf=4)
    pot_b = create_model(dict(args, cell_block_spec=spec))
    variables = pot_b.init(jax.random.PRNGKey(0), zj, jnp.asarray(spiked),
                           batch, num_mols=1, box=bj)
    kw = dict(dt=0.2, num_mols=1, box=bj, rebuild_every=2, skin=0.5,
              temperature=None)
    init_b, chunk_b, _ = make_adaptive_md_step(
        pot_b, variables, zj, batch, masses, cell_block_spec=spec, **kw)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sb = init_b(spiked, seed=1)
    assert any("re-spec" in str(w.message) for w in rec), (
        [str(w.message) for w in rec])
    assert not bool(sb.overflow)

    # forces after the respec must match the exact gather path
    pot_a = create_model(args)
    init_a, _, _ = make_md_step(pot_a, variables, zj, batch, masses, **kw)
    sa = init_a(spiked, seed=1)
    fa, fb = np.asarray(sa.force), np.asarray(sb.force)
    scale = np.abs(fa).max() + 1e-30
    assert np.abs(fb - fa).max() / scale < 1e-3  # precise tier

    sb = chunk_b(sb)
    assert not bool(sb.overflow)
    assert np.isfinite(np.asarray(sb.pos)).all()


@pytest.mark.slow
def test_md_blocked_precise_nve_drift():
    """NVE energy conservation on the precise (hi/lo split) blocked tier
    (round-2 VERDICT weak #5: the bf16-storage tier had only a t=0 parity
    smoke).  Drift over 50 steps must be small AND within 2x of the exact
    gather path's drift on the same trajectory — i.e. the gather-precision
    tier contributes no extra non-conservation at the integration scale."""
    from torchmdnet_tpu.md.integrators import kinetic_energy, make_md_step

    cutoff, k = 3.2, 48
    z, pos, box, L = _system(n=260, seed=3)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, bj = jnp.asarray(z), jnp.asarray(box)
    masses = np.full((n,), 12.0)
    mj = jnp.asarray(masses)

    args = dict(_args("tensornet", cutoff, k),
                embedding_dimension=16, num_layers=1, num_rbf=4)
    kw = dict(dt=0.1, num_mols=1, box=bj, rebuild_every=5, skin=0.5,
              temperature=None)
    vel0 = np.random.RandomState(4).randn(n, 3).astype(np.float32) * 0.003

    pot_a = create_model(args)
    variables = pot_a.init(jax.random.PRNGKey(0), zj, jnp.asarray(pos),
                           batch, num_mols=1, box=bj)
    init_a, chunk_a, efn_a = make_md_step(pot_a, variables, zj, batch,
                                          masses, **kw)

    spec = tune_cell_block_spec(jnp.asarray(pos), jnp.diag(bj),
                                cutoff + 0.5, cap=8, precise=True,
                                column_slots=True)
    pot_b = create_model(dict(args, cell_block_spec=spec))
    init_b, chunk_b, efn_b = make_md_step(pot_b, variables, zj, batch,
                                          masses, cell_block_spec=spec,
                                          **kw)

    def drift(init, chunk, efn, blocked):
        st = init(pos, vel=vel0)
        def etot(s):
            if blocked:
                pe = float(efn(s.pos, s))
            else:
                pe = float(efn(s.pos, s.nbr_idx, s.nbr_mask, s.nbr_rev))
            return pe + float(kinetic_energy(s.vel, mj))
        e0 = etot(st)
        for _ in range(10):
            st = chunk(st)
        assert not bool(st.overflow)
        return abs(etot(st) - e0) / n

    da = drift(init_a, chunk_a, efn_a, False)
    db = drift(init_b, chunk_b, efn_b, True)
    # absolute bar: eV/atom over 50 NVE steps at dt=0.1
    assert db < 5e-4, (da, db)
    # relative bar: blocked-precise adds no drift beyond integration error
    assert db < 2.0 * da + 1e-5, (da, db)


def test_blocked_tensornet2_precise_absolute_force_bar():
    """Production-force certification for the north-star model: the
    precise (hi/lo) fused charge-fold tier's forces must match the f32
    gather path to <= 1e-4 eV/A ABSOLUTE max deviation at a liquid-density
    config — the BASELINE.md bar in its own units (reference parity:
    rtol=atol=1e-4, ``tests/test_warp_ops.py:85-86``)."""
    cutoff, k = 3.2, 48
    z, pos, box, L = _system(n=400, seed=7)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    q = jnp.zeros((1,), jnp.float32)

    args = _args("tensornet2", cutoff, k)
    pot = create_model(args)
    variables = pot.init(jax.random.PRNGKey(0), zj, pj, batch, num_mols=1,
                         box=bj, q=q)

    nbr = build_neighbor_matrix(
        pj, batch, strategy="brute", k_max=k, cutoff_upper=cutoff,
        loop=True, box=bj)
    assert not bool(nbr.overflow)

    def e_ref(p):
        return jnp.sum(pot.energy(variables, zj, p, batch, num_mols=1,
                                  box=bj, q=q, nbr=nbr))

    f0 = jax.grad(e_ref)(pj)

    bd = jnp.diag(bj)
    spec = tune_cell_block_spec(pj, bd, cutoff, cap=8, precise=True)
    pot_b = create_model(dict(args, cell_block_spec=spec))
    blocks = plan_cell_blocks(pj, bd, spec)
    assert not bool(blocks.overflow)
    perm_safe = jnp.minimum(blocks.perm, n - 1)
    am_s = blocks.mask_rows
    pos_s0 = jnp.where(am_s[:, None], pj[perm_safe], 0.0)
    zs = jnp.where(am_s, zj[perm_safe], 0)
    batchs = jnp.where(am_s, batch[perm_safe], 1)
    nbr_s = build_neighbor_matrix(
        pos_s0, batchs, strategy="brute", k_max=k, cutoff_upper=cutoff,
        loop=True, box=bj, atom_mask=am_s)
    assert not bool(nbr_s.overflow)
    rel, eov = edge_rel(blocks, nbr_s.idx, nbr_s.mask, pos_s0, bd)
    assert not bool(eov)

    def e_blk(p):
        p_s = permute_rows(p, perm_safe, am_s, blocks.inv_perm)
        return jnp.sum(pot_b.energy(
            variables, zs, p_s, batchs, num_mols=1, box=bj, q=q, nbr=nbr_s,
            blocked=BlockedMP(rel, blocks.run_starts)))

    f1 = jax.grad(e_blk)(pj)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    dev = np.abs(f1 - f0).max()
    # sanity: random-weight force scale must be O(0.1..10) so the absolute
    # bar is meaningful, not vacuous
    assert np.abs(f0).max() > 1e-2, np.abs(f0).max()
    assert dev < 1e-4, (dev, np.abs(f0).max())


def test_md_windowed_coulomb_matches_list_path():
    """Blocked TensorNet2+Coulomb MD with the windowed direct-pair tier
    (coulomb_window_spec="auto"): t=0 energy/forces match the blocked
    run with the skin-cached Coulomb LIST to f32 accuracy (the two runs
    share the MP tier, so the diff isolates ops/pallas_coulomb.py), and
    chunks advance identically."""
    from torchmdnet_tpu.md.integrators import make_md_step

    cutoff, k = 3.2, 48
    rc = 4.0
    z, pos, box, L = _system(n=500)
    n = len(z)
    batch = jnp.zeros((n,), jnp.int32)
    zj, pj, bj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(box)
    masses = np.full((n,), 12.0)
    q = jnp.zeros((1,), jnp.float32)

    args = _args("tensornet2", cutoff, k)
    args.update(
        output_model="ScalarPlusWeightedCoulomb",
        q_weights=[[1.0] * 4] * 3,
        coulomb_cutoff=rc, coulomb_max_num_neighbors=64,
    )
    spec = tune_cell_block_spec(pj, jnp.diag(bj), cutoff + 0.5, cap=8)
    pot_b = create_model(dict(args, cell_block_spec=spec))
    variables = pot_b.init(jax.random.PRNGKey(0), zj, pj, batch,
                           num_mols=1, box=bj, q=q)

    kw = dict(dt=0.2, num_mols=1, box=bj, q=q, rebuild_every=3, skin=0.5,
              temperature=None)
    init_l, chunk_l, _ = make_md_step(pot_b, variables, zj, batch, masses,
                                      cell_block_spec=spec, **kw)
    init_w, chunk_w, _ = make_md_step(pot_b, variables, zj, batch, masses,
                                      cell_block_spec=spec,
                                      coulomb_window_spec="auto", **kw)

    sl = init_l(pos, seed=1)
    sw = init_w(pos, seed=1)
    assert sl.cnbr_idx is not None and sw.cnbr_idx is None
    assert sw.cwin_rs is not None
    assert not bool(sl.overflow) and not bool(sw.overflow)
    fl, fw = np.asarray(sl.force), np.asarray(sw.force)
    scale = np.abs(fl).max() + 1e-30
    assert np.abs(fw - fl).max() / scale < 3e-5, \
        np.abs(fw - fl).max() / scale
    # BASELINE bar in its own units: <= 1e-4 eV/A ABSOLUTE deviation of
    # the windowed-Coulomb forces vs the f32 list path (reference parity
    # contract rtol=atol=1e-4, ``tests/test_warp_ops.py:85-86``)
    assert np.abs(fl).max() > 1e-2  # non-vacuous scale
    assert np.abs(fw - fl).max() < 1e-4, np.abs(fw - fl).max()

    sl, sw = chunk_l(sl), chunk_w(sw)
    assert not bool(sw.overflow)
    dp = np.abs(np.asarray(sw.pos) - np.asarray(sl.pos)).max()
    assert dp < 1e-4, dp
    assert np.isfinite(np.asarray(sw.pos)).all()
