"""MD engine tests: NVE energy conservation, Langevin stability, External
calculator parity with direct apply (reference tests/test_calculator.py
check the graph/eager paths agree)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchmdnet_tpu.md.calculators import External
from torchmdnet_tpu.md.integrators import (
    kinetic_energy,
    make_md_step,
    run_md,
)
from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.utils.periodic_table import ATOMIC_MASSES

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _potential(**kw):
    args = dict(
        model="tensornet",
        embedding_dimension=16,
        num_layers=1,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=20,
        max_num_neighbors=16,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
    )
    args.update(kw)
    return create_model(args)


def _system(n=8, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    masses = ATOMIC_MASSES[z].astype(np.float32)
    return z, pos, masses


def test_nve_energy_conservation():
    pot = _potential()
    z, pos, masses = _system()
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(len(z), jnp.int32), num_mols=1,
    )
    init_state, chunk, energy_fn = make_md_step(
        pot, variables, jnp.asarray(z), jnp.zeros(len(z), jnp.int32),
        masses, dt=0.1, rebuild_every=10, skin=1.5,
    )
    # small initial velocities
    state = init_state(pos, vel=np.random.RandomState(1).randn(
        len(z), 3).astype(np.float32) * 0.005)
    e0 = float(
        energy_fn(state.pos, state.nbr_idx, state.nbr_mask, state.nbr_rev)
    ) + float(kinetic_energy(state.vel, jnp.asarray(masses)))
    for _ in range(10):
        state = chunk(state)
    e1 = float(
        energy_fn(state.pos, state.nbr_idx, state.nbr_mask, state.nbr_rev)
    ) + float(kinetic_energy(state.vel, jnp.asarray(masses)))
    assert not bool(state.overflow)
    assert int(state.step) == 100
    # total energy drift small relative to kinetic scale
    assert abs(e1 - e0) < 5e-3, (e0, e1)


def test_run_md_multi_molecule_forces_all_segments():
    """run_md with a packed multi-molecule batch + ghost padding: every
    real molecule must feel forces (regression: num_mols defaulted to 1 so
    segments >= 1 saw zero force), and ghosts must not trip overflow."""
    pot = _potential(max_num_neighbors=16)
    rng = np.random.RandomState(7)
    n1, n2, n_pad = 5, 6, 16
    z = np.zeros(n_pad, np.int32)
    pos = np.zeros((n_pad, 3), np.float32)
    seg = np.full(n_pad, 2, np.int32)
    z[:n1] = rng.randint(1, 9, n1)
    pos[:n1] = rng.uniform(-1.5, 1.5, (n1, 3))
    seg[:n1] = 0
    z[n1:n1 + n2] = rng.randint(1, 9, n2)
    pos[n1:n1 + n2] = rng.uniform(-1.5, 1.5, (n2, 3)) + 50.0
    seg[n1:n1 + n2] = 1
    masses = np.where(z == 0, 1.0, ATOMIC_MASSES[z]).astype(np.float32)

    state = run_md(
        pot,
        pot.init(jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
                 jnp.asarray(seg), num_mols=2),
        z, pos, masses, n_steps=10, dt=0.5, batch=jnp.asarray(seg),
        num_mols=2, temperature=None, rebuild_every=5, skin=1.0,
    )
    assert not bool(state.overflow)
    moved2 = np.abs(np.asarray(state.pos)[n1:n1 + n2] -
                    pos[n1:n1 + n2]).max()
    assert moved2 > 1e-5, "molecule 1 saw no forces"
    ghost_moved = np.abs(np.asarray(state.pos)[n1 + n2:] -
                         pos[n1 + n2:]).max()
    assert ghost_moved == 0.0


def test_run_md_cell_strategy_infers_grid():
    """run_md with neighbor_strategy='cell' must work WITHOUT an explicit
    cells_per_dim: the static grid dims are derived from the concrete box
    before jit (regression: TracerArrayConversionError inside the chunk)."""
    pot = _potential(max_num_neighbors=32)
    rng = np.random.RandomState(5)
    m = 5
    spacing = 3.2
    g = np.arange(m) * spacing + spacing / 2
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pos = (pos + rng.uniform(-0.1, 0.1, pos.shape)).astype(np.float32)
    n = len(pos)
    z = rng.randint(1, 9, n).astype(np.int32)
    masses = ATOMIC_MASSES[z].astype(np.float32)
    box = np.diag([m * spacing] * 3).astype(np.float32)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(n, jnp.int32), num_mols=1, box=jnp.asarray(box),
    )
    state = run_md(
        pot, variables, z, pos, masses, n_steps=20, dt=0.2,
        box=jnp.asarray(box), temperature=None, rebuild_every=10,
        skin=1.0, neighbor_strategy="cell",
    )
    assert np.isfinite(np.asarray(state.pos)).all()
    assert not bool(state.overflow)


def test_langevin_runs_and_thermalizes():
    pot = _potential()
    z, pos, masses = _system(seed=3)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(len(z), jnp.int32), num_mols=1,
    )
    state = run_md(
        pot, variables, z, pos, masses, n_steps=50, dt=0.5,
        temperature=300.0, gamma=0.05, rebuild_every=10, skin=1.5,
    )
    assert np.isfinite(np.asarray(state.pos)).all()
    assert not bool(state.overflow)
    ke = float(kinetic_energy(state.vel, jnp.asarray(masses)))
    assert ke > 0.0


def test_external_calculator_matches_direct_apply():
    pot = _potential()
    z, pos, masses = _system(seed=5)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(len(z), jnp.int32), num_mols=1,
    )
    ext = External((pot, variables), z[None])
    e, f = ext.calculate(pos)
    y, neg_dy = pot.apply(
        variables, jnp.asarray(z), jnp.asarray(pos),
        jnp.zeros(len(z), jnp.int32), num_mols=1,
    )
    np.testing.assert_allclose(e, np.asarray(y).reshape(-1), rtol=1e-5)
    np.testing.assert_allclose(f[0], np.asarray(neg_dy), rtol=1e-5,
                               atol=1e-6)

    # batched replicas: energies identical for identical replicas
    ext2 = External((pot, variables), np.stack([z, z]))
    e2, f2 = ext2.calculate(np.concatenate([pos, pos]))
    np.testing.assert_allclose(e2[0], e2[1], rtol=1e-5)

    # unit transform
    ext3 = External((pot, variables), z[None],
                    output_transform="eV/A -> kcal/mol/A")
    e3, f3 = ext3.calculate(pos)
    np.testing.assert_allclose(e3, e * 23.0609, rtol=1e-6)


def test_md_cached_coulomb_list_matches_standalone():
    """TensorNet2+Coulomb MD: the skin-cached Coulomb neighbor list carried
    in MDState must give the same energy as the head's standalone per-call
    build (the op re-masks beyond-cutoff edges, so the skin is invisible)."""
    n = 12
    rng = np.random.RandomState(3)
    z = rng.randint(1, 9, n).astype(np.int32)
    pos = rng.uniform(0, 6, (n, 3)).astype(np.float32)
    masses = ATOMIC_MASSES[z].astype(np.float32)
    pot = _potential(
        model="tensornet2", q_dim=4,
        output_model="ScalarPlusWeightedCoulomb",
        q_weights=[[1.0] * 4] * 2,
        coulomb_cutoff=4.0, coulomb_max_num_neighbors=n,
    )
    batch = jnp.zeros(n, jnp.int32)
    q = jnp.zeros((1,), jnp.float32)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos), batch,
        num_mols=1, q=q,
    )
    init_state, chunk, energy_fn = make_md_step(
        pot, variables, jnp.asarray(z), batch, masses, dt=0.5, num_mols=1,
        q=q, rebuild_every=3, skin=1.0,
    )
    state = init_state(pos)
    assert state.cnbr_idx is not None  # Coulomb list is carried
    assert not bool(state.overflow)
    # energy through the cached (skin-padded) list
    e_cached = float(energy_fn(state.pos, state.nbr_idx, state.nbr_mask,
                               state.nbr_rev, state.cnbr_idx,
                               state.cnbr_mask))
    # energy through the head's own standalone build
    y, _ = pot.apply(variables, jnp.asarray(z), state.pos, batch,
                     num_mols=1, q=q)
    np.testing.assert_allclose(e_cached, float(jnp.sum(y)), rtol=1e-5,
                               atol=1e-5)
    # and a few steps run without NaNs
    state = chunk(state)
    assert np.isfinite(np.asarray(state.pos)).all()


@pytest.mark.slow
def test_md_coulomb_10A_liquid_density():
    """The AceFF-PBC shape the MD bench runs (VERDICT round-2 #9): a
    liquid-density periodic system with the 10 Å Coulomb cutoff, cell-list
    strategy with a ``pick_cell_grid`` stencil > 1, skin-cached list vs
    standalone-rebuild parity, and the ``k_max`` heuristic validated
    against the measured row occupancy.

    Reference analog: ``output_modules.py:566-588`` (cutoff+RF Coulomb)
    driven by ``examples/aceff_examples/ase_aceff_PBC.py`` (rc=10)."""
    from torchmdnet_tpu.ops.neighbors import pick_cell_grid

    n = 2048
    rho = 0.1
    L = (n / rho) ** (1.0 / 3.0)
    rng = np.random.RandomState(11)
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    z = rng.choice([1, 1, 6, 7, 8], n).astype(np.int32)
    masses = ATOMIC_MASSES[z].astype(np.float32)
    box = np.diag([L, L, L]).astype(np.float32)
    rc = 10.0

    dims, S, cap = pick_cell_grid([L] * 3, rc + 1.0, n)
    assert S > 1, (dims, S, cap)  # the large-cutoff grid is the point

    pot = _potential(
        model="tensornet2", q_dim=4, embedding_dimension=16, num_layers=1,
        # At liquid density the skin-padded 6 Å main list holds ~90
        # neighbors/row (ρ·4πr³/3); the default K=16 budget has
        # overflowed since this test was written (reproduced at commit
        # 8ab4be1 — the flag was simply never asserted green by a CI
        # run of this file).  160 covers the Poisson tail.
        max_num_neighbors=160,
        output_model="ScalarPlusWeightedCoulomb",
        q_weights=[[1.0] * 4] * 2,
        coulomb_cutoff=rc,
        coulomb_neighbor_strategy="cell",
        coulomb_cells_per_dim=list(dims),
        coulomb_cell_stencil=S,
        coulomb_cell_capacity=cap,
    )
    batch = jnp.zeros(n, jnp.int32)
    q = jnp.zeros((1,), jnp.float32)
    bj = jnp.asarray(box)
    variables = pot.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(pos), batch,
        num_mols=1, q=q, box=bj,
    )
    init_state, chunk, energy_fn = make_md_step(
        pot, variables, jnp.asarray(z), batch, masses, dt=0.2, num_mols=1,
        q=q, box=bj, rebuild_every=2, skin=1.0,
        neighbor_strategy="cell",
    )
    state = init_state(pos)
    assert state.cnbr_idx is not None
    assert not bool(state.overflow)

    # k_max heuristic vs measured occupancy: must hold all rows with
    # margin but not be grossly oversized (≤3x the max row)
    occ = np.asarray(jnp.sum(state.cnbr_mask, axis=1))
    k_budget = state.cnbr_idx.shape[1]
    assert occ.max() < k_budget, (occ.max(), k_budget)
    assert k_budget < 3.0 * occ.max(), (occ.max(), k_budget)

    # skin-cached list parity vs the head's standalone build
    e_cached = float(energy_fn(state.pos, state.nbr_idx, state.nbr_mask,
                               state.nbr_rev, state.cnbr_idx,
                               state.cnbr_mask))
    y, _ = pot.apply(variables, jnp.asarray(z), state.pos, batch,
                     num_mols=1, q=q, box=bj)
    np.testing.assert_allclose(e_cached, float(jnp.sum(y)), rtol=2e-5,
                               atol=2e-5)

    state = chunk(state)
    assert not bool(state.overflow)
    assert np.isfinite(np.asarray(state.pos)).all()
