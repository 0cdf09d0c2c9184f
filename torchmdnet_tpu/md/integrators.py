"""On-device MD engine.

The reference's fastest MD path captures forward+grad in a CUDA graph and
replays it with in-place position updates (``calculators.py:117-169``); the
TPU-native equivalent goes further: the *entire* MD loop — neighbor
rebuilds, model evaluation, integration — runs inside jit via
``lax.fori_loop`` chunks, so positions never leave the chip
(SURVEY §3.3 note).

Integrators: velocity Verlet (NVE) and Langevin (velocity-Verlet + OU
thermostat).  The neighbor matrix is rebuilt every ``rebuild_every`` steps
with a ``skin`` added to the cutoff; between rebuilds the model consumes
the cached index set (edges beyond the true cutoff contribute exactly zero
through the cosine-cutoff windows), and geometry is recomputed
differentiably every step.

Units: Å, eV, amu, fs.  ``ACC_FACTOR`` converts (eV/Å)/amu → Å/fs².
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

ACC_FACTOR = 9.648533212331024e-3  # (eV/Å)/amu → Å/fs²
KB_EV = 8.617333262e-5  # Boltzmann constant, eV/K
# velocity variance at temperature T: v² ~ kT/m with kT in eV → Å²/fs²
VEL2_FACTOR = KB_EV * ACC_FACTOR


class MDState(NamedTuple):
    pos: jnp.ndarray  # [N, 3] Å
    vel: jnp.ndarray  # [N, 3] Å/fs
    force: jnp.ndarray  # [N, 3] eV/Å at ``pos`` (carried: 1 grad/step)
    nbr_idx: jnp.ndarray
    nbr_mask: jnp.ndarray
    nbr_rev: jnp.ndarray
    key: jnp.ndarray
    step: jnp.ndarray
    overflow: jnp.ndarray
    # skin-cached Coulomb-head neighbor list ([N, 0] when the potential has
    # no cutoff-Coulomb output module)
    cnbr_idx: jnp.ndarray = None
    cnbr_mask: jnp.ndarray = None
    # cell-blocked Pallas MP tier (ops/cell_blocks.py): sorted-space
    # permutation + window structure, refreshed at every rebuild.  The
    # neighbor lists above are then in *sorted* row space; pos/vel/force
    # stay in the original atom order.
    perm: jnp.ndarray = None       # [n_pad] sorted row -> original (safe)
    inv_perm: jnp.ndarray = None   # [N] original -> sorted row
    mask_rows: jnp.ndarray = None  # [n_pad] real-atom rows
    rel: jnp.ndarray = None        # [n_pad, K] window-relative slots
    run_starts: jnp.ndarray = None  # [n_blocks, NR]
    zs: jnp.ndarray = None         # [n_pad] sorted atomic numbers
    batchs: jnp.ndarray = None     # [n_pad] sorted segment ids
    # blocked-geometry overflow of THIS rebuild (transient, not sticky):
    # the adaptive chunk (make_adaptive_md_step) checks it host-side and
    # re-specs/falls back before stepping; the plain chunk folds it into
    # the sticky ``overflow`` flag.
    blk_overflow: jnp.ndarray = None
    # windowed direct-pair Coulomb tier (ops/pallas_coulomb.py): stencil
    # window runs + slot mask over the SAME sort, refreshed per rebuild
    # (replaces cnbr_idx/cnbr_mask when active)
    cwin_rs: jnp.ndarray = None    # [n_blocks, 1, NR] int32 (//8)
    cwin_used: jnp.ndarray = None  # [n_blocks, 1, NSC] int32
    cwin_mask: jnp.ndarray = None  # [n_blocks, 1, W] f32
    # Coulomb-window plan overflow of THIS rebuild (transient), tracked
    # SEPARATELY from blk_overflow so the adaptive wrapper can retune
    # only the stencil-window spec (no MP re-spec / model rebuild) when
    # the Coulomb window is the sole overflow source (advisor, round 4).
    cwin_overflow: jnp.ndarray = None
    # dual-list mode (grouped blocked tier): compact K embedding list in
    # sorted row space — the interactions ride the grouped K' list
    enbr_idx: jnp.ndarray = None
    enbr_mask: jnp.ndarray = None
    enbr_rev: jnp.ndarray = None


def maxwell_boltzmann_velocities(key, masses, temperature, shape_like):
    sigma = jnp.sqrt(VEL2_FACTOR * temperature / masses)[:, None]
    return sigma * jax.random.normal(key, shape_like.shape, shape_like.dtype)


def kinetic_energy(vel, masses):
    """Kinetic energy in eV."""
    return 0.5 * jnp.sum(masses[:, None] * vel * vel) / ACC_FACTOR


def make_md_step(
    potential,
    variables,
    z,
    batch,
    masses,
    *,
    dt: float,
    num_mols: int = 1,
    box=None,
    q=None,
    rebuild_every: int = 25,
    skin: float = 1.0,
    k_max: Optional[int] = None,
    temperature: Optional[float] = None,
    gamma: float = 0.01,
    neighbor_strategy: str = "brute",
    cells_per_dim=None,
    cell_block_spec=None,
    coulomb_window_spec=None,
):
    """Build ``(init_state, chunk)``: ``chunk`` advances ``rebuild_every``
    jitted steps with one neighbor rebuild.

    ``cell_block_spec`` (a :class:`~torchmdnet_tpu.ops.cell_blocks.
    CellBlockSpec`, e.g. from ``tune_cell_block_spec``) switches message
    passing to the cell-blocked Pallas tier: at every rebuild atoms are
    sorted into cell-blocked order and the model runs in sorted space (the
    integrator state stays in the original order; forces come back through
    the inverse permutation).  Requires an orthogonal ``box``; the returned
    ``energy`` closure then has signature ``(pos, state)``.  Caveat:
    padding atoms (``batch >= num_mols``) are sorted by their (co-located)
    positions, so keep them few or spread out — a dense ghost pile inflates
    one column's window."""
    rep = potential.module.representation_model
    cutoff = float(rep.cutoff_upper)
    k_cap = int(k_max if k_max is not None else rep.max_num_neighbors)
    inv_m = (1.0 / jnp.asarray(masses))[:, None]
    masses = jnp.asarray(masses)

    from torchmdnet_tpu.ops.neighbors import (
        NeighborMatrix,
        build_neighbor_matrix,
    )

    nbr_kwargs = dict(
        strategy=neighbor_strategy,
        k_max=k_cap,
        cutoff_upper=cutoff + skin,
        cutoff_lower=float(rep.cutoff_lower),
        loop=True,
        box=box,
    )
    if neighbor_strategy == "cell":
        # Resolve the static cell-grid dims NOW, while the box is still a
        # concrete array — inside the jitted chunk it is a tracer and the
        # builder could no longer derive them (TracerArrayConversionError).
        if cells_per_dim is None:
            if box is None:
                raise ValueError("neighbor_strategy='cell' requires a box")
            import numpy as np

            b = np.asarray(jax.device_get(jnp.asarray(box)))
            if b.ndim == 3:
                b = b[0]
            bd = np.diag(b).astype(np.float64)
            dims = np.maximum(
                np.floor(bd / (cutoff + skin)).astype(np.int64), 3
            )
            cells_per_dim = tuple(int(d) for d in dims)
        nbr_kwargs["cells_per_dim"] = cells_per_dim

    # Exclude padding/ghost atoms (extra segment num_mols) from the
    # neighbor lists — co-located ghosts would otherwise fill each other's
    # K slots and raise a spurious overflow flag.
    atom_mask = jnp.asarray(batch) < num_mols

    def build_nbr(pos):
        return build_neighbor_matrix(
            pos, batch, atom_mask=atom_mask, **nbr_kwargs
        )

    # Cutoff-Coulomb output module (TensorNet2/AceFF): carry a second
    # skin-cached neighbor list at coulomb_cutoff + skin so the head never
    # rebuilds inside the step (the energy op re-masks edges beyond the
    # cutoff, so cached lists are exact — the RF kernel vanishes at rc).
    out_mod = potential.module.output_model
    coulomb_rc = getattr(out_mod, "coulomb_cutoff", None)
    has_coulomb_list = coulomb_rc is not None

    # Windowed direct-pair Coulomb (ops/pallas_coulomb.py): replaces the
    # skin-cached list on the blocked path — stencil windows are planned
    # over the SAME sort at every rebuild, and the head evaluates all
    # window pairs in a Pallas kernel (no gathers).  ``coulomb_window_spec``
    # is a StencilWindowSpec, or "auto" to tune it from the first
    # ``init_state`` positions at the skin-padded cutoff.
    use_cwin = (coulomb_window_spec is not None and has_coulomb_list
                and cell_block_spec is not None)
    _cw = {"wspec": coulomb_window_spec
           if not isinstance(coulomb_window_spec, str) else None}

    def _resolve_cwspec(pos, force=False):
        if not use_cwin or (_cw["wspec"] is not None and not force):
            return
        from torchmdnet_tpu.ops.cell_blocks import (
            tune_stencil_window_spec,
        )

        import numpy as _np

        _bx0 = _np.asarray(jax.device_get(box))
        if _bx0.ndim == 3:
            _bx0 = _bx0[0]
        _cw["wspec"] = tune_stencil_window_spec(
            jax.device_get(pos), _np.diag(_bx0), cell_block_spec,
            float(coulomb_rc) + skin,
            slack_runs=2 if force else 1)

    if has_coulomb_list and not use_cwin:
        rc_skin = float(coulomb_rc) + skin
        ckwargs = dict(
            strategy=neighbor_strategy,
            # density-derived budget is the per-row *mean*; a +35% Poisson
            # headroom keeps random liquid-density systems overflow-free
            k_max=int(out_mod._coulomb_max_neighbors() * (rc_skin / float(
                coulomb_rc)) ** 3 * 1.35) + 16,
            cutoff_upper=rc_skin,
            cutoff_lower=0.0,
            loop=False,
            box=box,
        )
        if neighbor_strategy == "cell":
            import numpy as np

            from torchmdnet_tpu.ops.neighbors import pick_cell_grid

            b = np.asarray(jax.device_get(jnp.asarray(box)))
            if b.ndim == 3:
                b = b[0]
            n_real = int(jax.device_get(jnp.sum(atom_mask)))
            # Finer cells + wider stencil: at the Coulomb cutoff the
            # 27-stencil covers ~10x the needed sphere and its compaction
            # dominates the rebuild (see ops/neighbors.pick_cell_grid).
            dims, S, cap = pick_cell_grid(np.diag(b), rc_skin, n_real)
            ckwargs["cells_per_dim"] = dims
            ckwargs["stencil"] = S
            ckwargs["cell_capacity"] = cap

        def build_cnbr(pos):
            return build_neighbor_matrix(
                pos, batch, atom_mask=atom_mask, **ckwargs
            )
    else:
        def build_cnbr(pos):
            return None

    use_blocked = cell_block_spec is not None
    if use_blocked:
        from torchmdnet_tpu.ops.cell_blocks import (
            BlockedMP,
            edge_rel,
            permute_rows,
            plan_cell_blocks,
        )

        if box is None:
            raise ValueError("cell_block_spec requires an orthogonal box")
        _bx = jnp.asarray(box)
        if _bx.ndim == 3:
            _bx = _bx[0]
        bd = jnp.diag(_bx)
        n_atoms = int(jnp.asarray(batch).shape[0])
        z_arr = jnp.asarray(z)
        batch_arr = jnp.asarray(batch)
        emb_nbr_kwargs = None
        if cell_block_spec.col_slots is not None:
            # Grouped kernel tier: the sorted-space neighbor build must
            # use the SPEC's xy grid and emit column-partitioned slots
            # (K' = Σ budgets replaces the model's K).
            import numpy as np

            bd_np = np.asarray(jax.device_get(bd), np.float64)
            nz = max(int(bd_np[2] // (cutoff + skin)), 3)
            n_real = int(jax.device_get(jnp.sum(atom_mask)))
            occ = n_real / (cell_block_spec.nx * cell_block_spec.ny * nz)
            nbr_kwargs.update(
                strategy="cell",
                k_max=sum(cell_block_spec.col_slots),
                cells_per_dim=(cell_block_spec.nx, cell_block_spec.ny,
                               nz),
                cell_capacity=int(np.ceil(occ * 2.5)) + 8,
                column_partition=cell_block_spec.col_slots,
            )
            # Dual-list: a second COMPACT K build for the embedding —
            # at K'≈3.3K every [N, K', ·] embedding array (the [N,K',3F]
            # dp tensor alone was 12.4 GB at 25k) would otherwise ride
            # the grouped layout.  Requires the θ-tabulated q-tier so
            # the interactions never need an rbf array.
            if getattr(rep, "q_tab", 0):
                emb_nbr_kwargs = dict(nbr_kwargs, k_max=k_cap)
                del emb_nbr_kwargs["column_partition"]

    def energy(pos, nbr_idx, nbr_mask, nbr_rev, cnbr_idx=None,
               cnbr_mask=None):
        nbr = NeighborMatrix(
            nbr_idx,
            nbr_mask,
            jnp.sum(nbr_mask, axis=1).astype(jnp.int32),
            jnp.array(False),
            nbr_rev,
        )
        coulomb_nbr = None
        if cnbr_idx is not None:
            coulomb_nbr = NeighborMatrix(
                cnbr_idx,
                cnbr_mask,
                jnp.sum(cnbr_mask, axis=1).astype(jnp.int32),
                jnp.array(False),
                None,
            )
        y = potential.energy(
            variables, z, pos, batch, num_mols=num_mols, box=box, q=q,
            nbr=nbr, coulomb_nbr=coulomb_nbr,
        )
        return jnp.sum(y)

    if use_blocked:
        def energy_state(pos, st: MDState):
            nbr = NeighborMatrix(
                st.nbr_idx,
                st.nbr_mask,
                jnp.sum(st.nbr_mask, axis=1).astype(jnp.int32),
                jnp.array(False),
                st.nbr_rev,
            )
            coulomb_nbr = coulomb_win = None
            if use_cwin:
                from torchmdnet_tpu.ops.pallas_coulomb import (
                    CoulombWindows,
                )

                cwb = CoulombWindows(
                    st.cwin_rs, st.cwin_used, st.cwin_mask,
                    st.mask_rows.astype(jnp.float32),
                    bd.reshape(1, 3).astype(jnp.float32),
                    jnp.array(False),
                )
                coulomb_win = (cwb, cell_block_spec, _cw["wspec"])
            elif has_coulomb_list:
                coulomb_nbr = NeighborMatrix(
                    st.cnbr_idx,
                    st.cnbr_mask,
                    jnp.sum(st.cnbr_mask, axis=1).astype(jnp.int32),
                    jnp.array(False),
                    None,
                )
            nbr_emb = None
            if st.enbr_idx is not None:
                nbr_emb = NeighborMatrix(
                    st.enbr_idx,
                    st.enbr_mask,
                    jnp.sum(st.enbr_mask, axis=1).astype(jnp.int32),
                    jnp.array(False),
                    st.enbr_rev,
                )
            pos_s = permute_rows(pos, st.perm, st.mask_rows, st.inv_perm)
            y = potential.energy(
                variables, st.zs, pos_s, st.batchs, num_mols=num_mols,
                box=box, q=q, nbr=nbr, coulomb_nbr=coulomb_nbr,
                coulomb_win=coulomb_win,
                blocked=BlockedMP(st.rel, st.run_starts),
                nbr_emb=nbr_emb,
            )
            return jnp.sum(y)
    else:
        def energy_state(pos, st: MDState):
            return energy(
                pos, st.nbr_idx, st.nbr_mask, st.nbr_rev,
                st.cnbr_idx if has_coulomb_list else None,
                st.cnbr_mask if has_coulomb_list else None,
            )

    grad_state = jax.grad(energy_state, argnums=0)

    def vv_step(state: MDState) -> MDState:
        # Classic velocity Verlet with the force CARRIED in the state —
        # one gradient evaluation per step (f(pos) was computed as f2 of
        # the previous step; exact across rebuilds because edges beyond
        # the cutoff contribute zero through the cosine window, so the
        # skin-padded old and new index sets give identical forces).
        vel_half = state.vel + 0.5 * dt * state.force * inv_m * ACC_FACTOR
        pos_new = state.pos + dt * vel_half
        f2 = -grad_state(pos_new, state)
        vel_new = vel_half + 0.5 * dt * f2 * inv_m * ACC_FACTOR
        if temperature is not None:
            key, sub = jax.random.split(state.key)
            c1 = jnp.exp(-gamma * dt)
            sigma = jnp.sqrt(
                VEL2_FACTOR * temperature * (1.0 - c1 * c1)
            ) * jnp.sqrt(inv_m)
            vel_new = c1 * vel_new + sigma * jax.random.normal(
                sub, vel_new.shape, vel_new.dtype
            )
        else:
            key = state.key
        return state._replace(
            pos=pos_new, vel=vel_new, force=f2, key=key,
            step=state.step + 1,
        )

    # Rebuild and integration run as SEPARATE dispatches: one fused jit
    # needs peak(build temps + force-grad graph) HBM simultaneously, which
    # overflows at the 25k/K=96 config; two dispatches let XLA reuse the
    # arena between them (the extra launch costs ~µs per rebuild_every
    # steps).
    @jax.jit
    def _rebuild(state: MDState) -> MDState:
        if use_blocked:
            blocks = plan_cell_blocks(state.pos, bd, cell_block_spec)
            perm_safe = jnp.minimum(blocks.perm, n_atoms - 1)
            batch_perm = batch_arr[perm_safe]
            am_s = blocks.mask_rows & (batch_perm < num_mols)
            pos_s = jnp.where(am_s[:, None], state.pos[perm_safe], 0.0)
            zs = jnp.where(am_s, z_arr[perm_safe], 0)
            batchs = jnp.where(am_s, batch_perm, num_mols)
            nbr = build_neighbor_matrix(
                pos_s, batchs, atom_mask=am_s, **nbr_kwargs)
            rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, pos_s, bd)
            # K overflow stays sticky (same failure as the gather path);
            # the blocked-geometry flags are transient — the caller can
            # recover by re-spec'ing (make_adaptive_md_step) without a
            # poisoned flag.  In grouped mode the builder's overflow IS
            # a spec parameter (per-column budgets), so it is
            # recoverable too.
            if cell_block_spec.col_slots is not None:
                sticky, blk = (state.overflow,
                               blocks.overflow | eov | nbr.overflow)
            else:
                sticky, blk = (state.overflow | nbr.overflow,
                               blocks.overflow | eov)
            state = state._replace(
                nbr_idx=nbr.idx,
                nbr_mask=nbr.mask,
                nbr_rev=nbr.rev_slot,
                overflow=sticky,
                blk_overflow=blk,
                perm=perm_safe,
                inv_perm=blocks.inv_perm,
                mask_rows=am_s,
                rel=rel,
                run_starts=blocks.run_starts,
                zs=zs,
                batchs=batchs,
            )
            if emb_nbr_kwargs is not None:
                enbr = build_neighbor_matrix(
                    pos_s, batchs, atom_mask=am_s, **emb_nbr_kwargs)
                state = state._replace(
                    enbr_idx=enbr.idx,
                    enbr_mask=enbr.mask,
                    enbr_rev=enbr.rev_slot,
                    overflow=state.overflow | enbr.overflow,
                )
            if use_cwin:
                from torchmdnet_tpu.ops.cell_blocks import (
                    plan_stencil_windows,
                )
                from torchmdnet_tpu.ops.pallas_coulomb import (
                    make_coulomb_windows,
                )

                swin = plan_stencil_windows(
                    state.pos, bd, cell_block_spec, _cw["wspec"])
                cw = make_coulomb_windows(
                    swin, _cw["wspec"], am_s, bd, spec=cell_block_spec)
                state = state._replace(
                    cwin_rs=cw.run_starts8,
                    cwin_used=cw.nr_used,
                    cwin_mask=cw.slot_mask,
                    cwin_overflow=cw.overflow,
                )
            elif has_coulomb_list:
                cnbr = build_neighbor_matrix(
                    pos_s, batchs, atom_mask=am_s, **ckwargs)
                state = state._replace(
                    cnbr_idx=cnbr.idx,
                    cnbr_mask=cnbr.mask,
                    overflow=state.overflow | cnbr.overflow,
                )
            return state
        nbr = build_nbr(state.pos)
        state = state._replace(
            nbr_idx=nbr.idx,
            nbr_mask=nbr.mask,
            nbr_rev=nbr.rev_slot,
            overflow=state.overflow | nbr.overflow,
        )
        if has_coulomb_list:
            cnbr = build_cnbr(state.pos)
            state = state._replace(
                cnbr_idx=cnbr.idx,
                cnbr_mask=cnbr.mask,
                overflow=state.overflow | cnbr.overflow,
            )
        return state

    @jax.jit
    def _steps(state: MDState) -> MDState:
        return jax.lax.fori_loop(
            0, rebuild_every, lambda i, s: vv_step(s), state
        )

    def _fold_transient(st: MDState) -> MDState:
        ov = st.overflow | st.blk_overflow
        if st.cwin_overflow is not None:
            ov = ov | st.cwin_overflow
        return st._replace(overflow=ov)

    def chunk(state: MDState) -> MDState:
        st = _rebuild(state)
        if use_blocked:
            st = _fold_transient(st)
        return _steps(st)

    _init_force = jax.jit(lambda p, st: -grad_state(p, st))

    def _init_raw(pos, vel=None, seed=0):
        """Post-rebuild state with NO blk_overflow fold and no force —
        the adaptive wrapper needs the transient flag unconsumed."""
        pos = jnp.asarray(pos)
        key = jax.random.PRNGKey(seed)
        if vel is None:
            if temperature is not None:
                key, sub = jax.random.split(key)
                vel = maxwell_boltzmann_velocities(
                    sub, masses, temperature, pos
                )
            else:
                vel = jnp.zeros_like(pos)
        st = MDState(
            pos, jnp.asarray(vel), jnp.zeros_like(pos), None, None, None,
            key, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
        )
        _resolve_cwspec(pos)
        return _rebuild(st)

    def init_state(pos, vel=None, seed=0):
        st = _init_raw(pos, vel=vel, seed=seed)
        if use_blocked:
            st = _fold_transient(st)
        return st._replace(force=_init_force(st.pos, st))

    # internals exposed for the adaptive (auto-respec) wrapper
    chunk._rebuild = _rebuild
    chunk._steps = _steps
    chunk._init_force = _init_force
    chunk._init_raw = _init_raw
    chunk._resolve_cwspec = _resolve_cwspec

    if use_blocked:
        return init_state, chunk, jax.jit(energy_state)
    return init_state, chunk, jax.jit(energy)


def make_adaptive_md_step(
    potential,
    variables,
    z,
    batch,
    masses,
    *,
    cell_block_spec,
    max_respecs: int = 4,
    **kw,
):
    """Blocked-tier MD with **automatic overflow recovery** (the reference
    contract is overflow-as-surface, ``models/utils.py:297-300``; here the
    engine goes further and self-heals).

    Wraps :func:`make_md_step`.  At every chunk boundary the transient
    blocked-geometry overflow flag (window runs exceeded / uncovered edge)
    is checked on the host; when it fires — e.g. a density fluctuation
    concentrates more rows into one window than the t=0-tuned ``rpc``
    allows — the spec is re-tuned on the live geometry (growing ``rpc``),
    the jitted closures are rebuilt, and the chunk re-runs with correct
    forces.  After ``max_respecs`` escalations it falls back to the exact
    gather path for the remainder of the run.  Each respec logs a warning
    and costs one recompile; K-slot overflow stays a sticky flag exactly
    as in :func:`make_md_step`.
    """
    import warnings

    import numpy as np

    from torchmdnet_tpu.ops.cell_blocks import tune_cell_block_spec

    rep = potential.module.representation_model
    cutoff_pad = float(rep.cutoff_upper) + float(kw.get("skin", 1.0))
    box = kw.get("box")
    if box is None:
        raise ValueError("make_adaptive_md_step requires an orthogonal box")
    _bx = np.asarray(jax.device_get(jnp.asarray(box)))
    if _bx.ndim == 3:
        _bx = _bx[0]
    bd_np = np.diag(_bx)

    cur = {"respecs": 0}

    def _build(spec):
        # the spec is baked into the model too (edge_message_passing routes
        # through it) — rebuild the potential from its stored hparams with
        # the new spec; the variables pytree is knob-independent
        if spec is cell_block_spec:
            pot = potential
        else:
            from torchmdnet_tpu.models.model import create_model

            pot = create_model(
                dict(potential.hparams, cell_block_spec=spec))
        cur["init"], cur["chunk"], cur["energy"] = make_md_step(
            pot, variables, z, batch, masses,
            cell_block_spec=spec, **kw)
        cur["spec"] = spec

    _build(cell_block_spec)

    def _fresh_state(state: MDState) -> MDState:
        """Original-space dynamical variables only — list/window arrays
        are re-derived by the new closures' _rebuild."""
        return MDState(
            state.pos, state.vel, state.force, None, None, None,
            state.key, state.step, state.overflow,
        )

    def _respec(state: MDState) -> MDState:
        while True:
            if cur["respecs"] >= max_respecs and cur["spec"] is not None:
                warnings.warn(
                    "blocked MD: overflow persists after "
                    f"{max_respecs} respecs; falling back to the exact "
                    "gather path")
                _build(None)
                return cur["chunk"]._rebuild(_fresh_state(state))
            cur["respecs"] += 1
            old = cur["spec"]
            try:
                new_spec = tune_cell_block_spec(
                    state.pos, jnp.asarray(bd_np), cutoff_pad,
                    cap=old.cap, rlh=old.rlh, slack_runs=2,
                    precise=old.precise,
                    column_slots=old.col_slots is not None)
            except ValueError:
                new_spec = None
            if new_spec is not None and new_spec.rpc <= old.rpc and (
                    old.nrp is None or (new_spec.nrp or 0) <= old.nrp):
                # live-geometry tune says the old budgets suffice
                # (edge_rel coverage failed for another transient reason)
                # — force growth so the loop always makes progress
                new_spec = old._replace(
                    rpc=old.rpc + 1,
                    nrp=None if old.nrp is None else old.nrp + 4)
            if new_spec is None:
                cur["respecs"] = max_respecs
                continue
            warnings.warn(
                f"blocked MD: window overflow at step "
                f"{int(jax.device_get(state.step))}; re-spec'd "
                f"rpc {old.rpc} -> {new_spec.rpc} (recompile)")
            _build(new_spec)
            cur["chunk"]._resolve_cwspec(state.pos, force=True)
            st = cur["chunk"]._rebuild(_fresh_state(state))
            if not bool(jax.device_get(st.blk_overflow)):
                return st

    def _recwin(state: MDState) -> MDState:
        """Coulomb window was the SOLE overflow source: retune only the
        stencil-window spec from the live geometry and rebuild — the MP
        spec and the model are untouched (no rpc growth, no create_model),
        so the recompile is limited to the new window shape."""
        warnings.warn(
            "blocked MD: Coulomb-window overflow at step "
            f"{int(jax.device_get(state.step))}; retuning the stencil "
            "window only (MP spec unchanged)")
        _build(cur["spec"])
        cur["chunk"]._resolve_cwspec(state.pos, force=True)
        return cur["chunk"]._rebuild(_fresh_state(state))

    def _fold(st: MDState) -> MDState:
        ov = st.overflow
        if st.blk_overflow is not None:
            ov = ov | st.blk_overflow
        if st.cwin_overflow is not None:
            ov = ov | st.cwin_overflow
        return st._replace(overflow=ov)

    def _ensure(st: MDState, state: MDState) -> MDState:
        if cur["spec"] is not None:
            if bool(jax.device_get(st.blk_overflow)):
                st = _respec(state)
            elif st.cwin_overflow is not None and bool(
                    jax.device_get(st.cwin_overflow)):
                st = _recwin(state)
        return _fold(st)

    def chunk(state: MDState) -> MDState:
        st = cur["chunk"]._rebuild(state)
        st = _ensure(st, state)
        return cur["chunk"]._steps(st)

    def init_state(pos, vel=None, seed=0):
        st = cur["chunk"]._init_raw(pos, vel=vel, seed=seed)
        st = _ensure(st, st)
        return st._replace(force=cur["chunk"]._init_force(st.pos, st))

    def energy(pos, st):
        return cur["energy"](pos, st)

    return init_state, chunk, energy


def run_md(potential, variables, z, pos, masses, *, n_steps, dt=1.0,
           batch=None, num_mols=1, box=None, q=None, temperature=None,
           gamma=0.01, rebuild_every=25, skin=1.0, seed=0,
           neighbor_strategy="brute", cells_per_dim=None,
           cell_block_spec=None):
    """Run ``n_steps`` of MD fully on device; returns the final
    :class:`MDState` (check ``state.overflow``!).

    ``num_mols`` must cover every real segment in ``batch`` (entries equal
    to ``num_mols`` are padding/ghost atoms); molecules beyond it would
    silently see zero forces.
    """
    n = pos.shape[0]
    if batch is None:
        batch = jnp.zeros((n,), jnp.int32)
    init_state, chunk, _ = make_md_step(
        potential, variables, jnp.asarray(z), batch, masses,
        dt=dt, num_mols=num_mols, box=box, q=q,
        rebuild_every=rebuild_every, skin=skin,
        temperature=temperature, gamma=gamma,
        neighbor_strategy=neighbor_strategy, cells_per_dim=cells_per_dim,
        cell_block_spec=cell_block_spec,
    )
    state = init_state(pos, seed=seed)
    for _ in range(max(n_steps // rebuild_every, 1)):
        state = chunk(state)
    jax.block_until_ready(state.pos)
    return state
