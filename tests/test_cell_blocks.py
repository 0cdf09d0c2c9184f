"""Cell-blocked window structure + blocked MP kernel vs the gather
oracle (interpret mode on CPU; the real-TPU path is exercised by
tools/bench_md.py and test_blocked_mp_tpu)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchmdnet_tpu.ops.cell_blocks import (
    CellBlockSpec, make_cell_block_spec, plan_cell_blocks, edge_rel,
)
from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix
from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum
from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum


def _system(n=600, density=0.1, seed=0):
    rng = np.random.RandomState(seed)
    L = (n / density) ** (1.0 / 3.0)
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    box = np.diag([L, L, L]).astype(np.float32)
    return pos, box, L


@pytest.mark.parametrize("seed", [0, 1])
def test_window_covers_all_neighbors(seed):
    n, cutoff, k = 600, 3.2, 48
    pos, box, L = _system(n, seed=seed)
    spec = make_cell_block_spec(np.diag(box), cutoff, n, cap=8)
    blocks = plan_cell_blocks(jnp.asarray(pos), jnp.diag(jnp.asarray(box)),
                              spec)
    assert not bool(blocks.overflow)

    # sorted-space positions (ghosts parked at the origin, masked out)
    perm = np.asarray(blocks.perm)
    ghost = perm >= n
    pos_s = np.where(ghost[:, None], 0.0, pos[np.minimum(perm, n - 1)])
    nbr = build_neighbor_matrix(
        jnp.asarray(pos_s), strategy="brute", k_max=k,
        cutoff_upper=cutoff, box=jnp.asarray(box),
        atom_mask=jnp.asarray(~ghost),
    )
    assert not bool(nbr.overflow)
    rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, jnp.asarray(pos_s),
                        jnp.diag(jnp.asarray(box)))
    assert not bool(eov)

    # every masked edge's rel must address its neighbor row in the window
    rel_np = np.asarray(rel)
    idx_np = np.asarray(nbr.idx)
    mask_np = np.asarray(nbr.mask)
    rs = np.asarray(blocks.run_starts)
    rlh, cap = spec.rlh, spec.cap
    for i in range(spec.n_pad):
        b = i // cap
        for kk in np.nonzero(mask_np[i])[0]:
            r = rel_np[i, kk] // rlh
            off = rel_np[i, kk] % rlh
            assert rs[b, r] + off == idx_np[i, kk], (i, kk)


def test_blocked_mp_matches_gather_oracle():
    n, cutoff, k, f = 600, 3.2, 48, 16
    pos, box, L = _system(n)
    spec = make_cell_block_spec(np.diag(box), cutoff, n, cap=8)
    blocks = plan_cell_blocks(jnp.asarray(pos), jnp.diag(jnp.asarray(box)),
                              spec)
    perm = np.asarray(blocks.perm)
    ghost = perm >= n
    pos_s = np.where(ghost[:, None], 0.0, pos[np.minimum(perm, n - 1)])
    nbr = build_neighbor_matrix(
        jnp.asarray(pos_s), strategy="brute", k_max=k,
        cutoff_upper=cutoff, box=jnp.asarray(box),
        atom_mask=jnp.asarray(~ghost),
    )
    rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, jnp.asarray(pos_s),
                        jnp.diag(jnp.asarray(box)))
    assert not bool(eov) and not bool(blocks.overflow)

    rng = np.random.RandomState(1)
    n_pad = spec.n_pad
    attr = rng.randn(n_pad, k, 3 * f).astype(np.float32)
    attr = np.where(np.asarray(nbr.mask)[..., None], attr, 0.0)
    feats = rng.randn(n_pad, 9 * f).astype(np.float32)

    ref = packed_neighbor_sum(
        jnp.asarray(attr), jnp.asarray(feats), nbr.idx, nbr.rev_slot,
        nbr.mask)
    out = blocked_neighbor_sum(
        jnp.asarray(attr), jnp.asarray(feats), rel, blocks.run_starts,
        spec=spec, interpret=True)
    ref_np = np.asarray(ref)
    out_np = np.asarray(out)
    scale = np.abs(ref_np).max()
    # one bf16 pass on the gathered features (storage-tier contract)
    assert np.abs(out_np - ref_np).max() / scale < 2e-2


def _blocked_setup(n=600, cutoff=3.2, k=48, f=16, seed=0):
    pos, box, L = _system(n, seed=seed)
    from torchmdnet_tpu.ops.cell_blocks import make_cell_block_spec
    spec = make_cell_block_spec(np.diag(box), cutoff, n, cap=8)
    blocks = plan_cell_blocks(jnp.asarray(pos), jnp.diag(jnp.asarray(box)),
                              spec)
    perm = np.asarray(blocks.perm)
    ghost = perm >= n
    pos_s = np.where(ghost[:, None], 0.0, pos[np.minimum(perm, n - 1)])
    nbr = build_neighbor_matrix(
        jnp.asarray(pos_s), strategy="brute", k_max=k,
        cutoff_upper=cutoff, box=jnp.asarray(box),
        atom_mask=jnp.asarray(~ghost),
    )
    rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, jnp.asarray(pos_s),
                        jnp.diag(jnp.asarray(box)))
    assert not bool(eov) and not bool(blocks.overflow)
    rng = np.random.RandomState(seed + 10)
    n_pad = spec.n_pad
    attr = rng.randn(n_pad, k, 3 * f).astype(np.float32)
    attr = np.where(np.asarray(nbr.mask)[..., None], attr, 0.0)
    feats = rng.randn(n_pad, 9 * f).astype(np.float32)
    return spec, blocks, nbr, rel, jnp.asarray(attr), jnp.asarray(feats)


def test_blocked_sym_grads_match_packed():
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum_sym
    from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum_sym

    spec, blocks, nbr, rel, attr, feats = _blocked_setup()
    # symmetrize attr across edge directions so the sym contract holds:
    # w(i,k) must equal w(j, rev_slot). Easiest: make attr a function of
    # the unordered pair via gather-symmetrization.
    rev = nbr.rev_slot
    attr_rev = attr[nbr.idx, rev]
    attr_sym = jnp.where(nbr.mask[..., None], 0.5 * (attr + attr_rev), 0.0)

    def loss_b(a, x):
        out = blocked_neighbor_sum_sym(a, x, rel, blocks.run_starts, spec,
                                       True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_p(a, x):
        out = packed_neighbor_sum_sym(a, x, nbr.idx, nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1))

    gb = jax.grad(loss_b, argnums=(0, 1))(attr_sym, feats)
    gp = jax.grad(loss_p, argnums=(0, 1))(attr_sym, feats)
    for b, p, name in zip(gb, gp, ("dattr", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        scale = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / scale < 3e-2, name


def test_blocked_mp_precise_matches_oracle():
    """spec.precise (hi/lo bf16 split): the production-force tier must
    match the f32 packed path to 1e-4 relative — the reference parity bar
    (rtol=atol=1e-4, ``tests/test_warp_ops.py:85-86``)."""
    spec, blocks, nbr, rel, attr, feats = _blocked_setup()
    spec_p = spec._replace(precise=True)
    ref = packed_neighbor_sum(attr, feats, nbr.idx, nbr.rev_slot, nbr.mask)
    out = blocked_neighbor_sum(attr, feats, rel, blocks.run_starts,
                               spec=spec_p, interpret=True)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    scale = np.abs(ref_np).max()
    assert np.abs(out_np - ref_np).max() / scale < 1e-4


def test_blocked_precise_grads_match_packed():
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum_sym
    from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum_sym

    spec, blocks, nbr, rel, attr, feats = _blocked_setup()
    spec_p = spec._replace(precise=True)
    rev = nbr.rev_slot
    attr_rev = attr[nbr.idx, rev]
    attr_sym = jnp.where(nbr.mask[..., None], 0.5 * (attr + attr_rev), 0.0)

    def loss_b(a, x):
        out = blocked_neighbor_sum_sym(a, x, rel, blocks.run_starts,
                                       spec_p, True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_p(a, x):
        out = packed_neighbor_sum_sym(a, x, nbr.idx, nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1))

    gb = jax.grad(loss_b, argnums=(0, 1))(attr_sym, feats)
    gp = jax.grad(loss_p, argnums=(0, 1))(attr_sym, feats)
    for b, p, name in zip(gb, gp, ("dattr", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        scale = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / scale < 2e-4, name


def _grouped_setup(n=600, cutoff=3.2, f=16, seed=0, precise=True):
    """Column-partitioned slots + grouped kernel inputs on a liquid
    system: cell-list build with ``column_partition`` (same xy grid as
    the block spec), budgets measured by ``tune_column_slots``."""
    from torchmdnet_tpu.ops.cell_blocks import tune_column_slots

    pos, box, L = _system(n, seed=seed)
    bd = jnp.diag(jnp.asarray(box))
    spec = make_cell_block_spec(np.diag(box), cutoff, n, cap=8,
                                precise=precise)
    blocks = plan_cell_blocks(jnp.asarray(pos), bd, spec)
    assert not bool(blocks.overflow)
    perm = np.asarray(blocks.perm)
    ghost = perm >= n
    pos_s = jnp.asarray(
        np.where(ghost[:, None], 0.0, pos[np.minimum(perm, n - 1)]))
    am = jnp.asarray(~ghost)
    # probe list (brute) to measure the per-column budgets
    probe = build_neighbor_matrix(
        pos_s, strategy="brute", k_max=64, cutoff_upper=cutoff,
        loop=True, box=jnp.asarray(box), atom_mask=am)
    assert not bool(probe.overflow)
    col_slots = tune_column_slots(blocks, probe.idx, probe.mask, pos_s, bd)
    spec_g = spec._replace(col_slots=col_slots)
    blocks_g = plan_cell_blocks(jnp.asarray(pos), bd, spec_g)
    nz = max(int(L // cutoff), 3)
    occ = n / (spec.nx * spec.ny * nz)
    nbr = build_neighbor_matrix(
        pos_s, strategy="cell", k_max=sum(col_slots), cutoff_upper=cutoff,
        loop=True, box=jnp.asarray(box), atom_mask=am,
        cells_per_dim=(spec.nx, spec.ny, nz),
        cell_capacity=int(np.ceil(occ * 4)) + 8,
        column_partition=col_slots)
    assert not bool(nbr.overflow)
    rel, eov = edge_rel(blocks_g, nbr.idx, nbr.mask, pos_s, bd)
    assert not bool(eov)
    rng = np.random.RandomState(seed + 20)
    n_pad = spec.n_pad
    kp = sum(col_slots)
    attr = rng.randn(n_pad, kp, 3 * f).astype(np.float32)
    attr = np.where(np.asarray(nbr.mask)[..., None], attr, 0.0)
    feats = rng.randn(n_pad, 9 * f).astype(np.float32)
    return (spec_g, blocks_g, nbr, rel, jnp.asarray(attr),
            jnp.asarray(feats))


def test_grouped_blocked_mp_matches_oracle():
    """Column-grouped kernel (spec.col_slots) vs the packed f32 oracle,
    precise tier: 1e-4 relative — the production-force configuration."""
    spec, blocks, nbr, rel, attr, feats = _grouped_setup()
    ref = packed_neighbor_sum(attr, feats, nbr.idx, nbr.rev_slot, nbr.mask)
    out = blocked_neighbor_sum(attr, feats, rel, blocks.run_starts,
                               spec=spec, interpret=True)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    scale = np.abs(ref_np).max()
    assert np.abs(out_np - ref_np).max() / scale < 1e-4


def test_grouped_blocked_grads_match_packed():
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum_sym
    from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum_sym

    spec, blocks, nbr, rel, attr, feats = _grouped_setup(seed=2)
    rev = nbr.rev_slot
    attr_rev = attr[nbr.idx, rev]
    attr_sym = jnp.where(nbr.mask[..., None], 0.5 * (attr + attr_rev), 0.0)

    def loss_b(a, x):
        out = blocked_neighbor_sum_sym(a, x, rel, blocks.run_starts,
                                       spec, True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_p(a, x):
        out = packed_neighbor_sum_sym(a, x, nbr.idx, nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1))

    gb = jax.grad(loss_b, argnums=(0, 1))(attr_sym, feats)
    gp = jax.grad(loss_p, argnums=(0, 1))(attr_sym, feats)
    for b, p, name in zip(gb, gp, ("dattr", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        scale = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / scale < 2e-4, name


def test_blocked_asym_grads_match_packed():
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum_asym
    from torchmdnet_tpu.ops.message_passing import packed_neighbor_sum_asym

    spec, blocks, nbr, rel, attr, feats = _blocked_setup(seed=3)
    rev = nbr.rev_slot
    attr_rev = jnp.where(nbr.mask[..., None], attr[nbr.idx, rev], 0.0)

    def loss_b(a, ar, x):
        out = blocked_neighbor_sum_asym(a, ar, x, rel, blocks.run_starts,
                                        spec, True)
        return jnp.sum(jnp.sin(out))

    def loss_p(a, ar, x):
        out = packed_neighbor_sum_asym(a, ar, x, nbr.idx, nbr.rev_slot,
                                       nbr.mask)
        return jnp.sum(jnp.sin(out))

    gb = jax.grad(loss_b, argnums=(0, 2))(attr, attr_rev, feats)
    gp = jax.grad(loss_p, argnums=(0, 2))(attr, attr_rev, feats)
    for b, p, name in zip(gb, gp, ("dattr", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        scale = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / scale < 3e-2, name


@pytest.mark.parametrize("grouped", [True, False])
def test_blocked_cheb_fused_matches_unfused(grouped):
    """Fused in-kernel cheb attr (blocked_neighbor_sum_sym_cheb) vs the
    unfused pipeline (cheb_filter → blocked_neighbor_sum_sym): values and
    (d, feats) gradients.  Precise tier → 1e-4 relative."""
    from torchmdnet_tpu.ops.pallas_blocked_mp import (
        blocked_neighbor_sum_sym,
        blocked_neighbor_sum_sym_cheb,
    )
    from torchmdnet_tpu.ops.pallas_cheb import cheb_filter

    f, T, hi = 16, 32, 3.2
    if grouped:
        spec, blocks, nbr, rel, _, feats = _grouped_setup(f=f)
    else:
        spec, blocks, nbr, rel, _, feats = _blocked_setup(f=f)
        spec = spec._replace(precise=True)
    n_pad, kp = rel.shape
    rng = np.random.RandomState(7)
    d = jnp.asarray(rng.uniform(0.2, hi * 1.1, (n_pad, kp))
                    .astype(np.float32))
    fm = (jnp.asarray(nbr.mask) & (d < hi)).astype(jnp.float32)
    coeffs = jnp.asarray(rng.randn(T, 3 * f).astype(np.float32) / T)

    def loss_fused(dd, x):
        out = blocked_neighbor_sum_sym_cheb(
            coeffs, dd, fm, x, rel, blocks.run_starts, spec, 0.0, hi,
            True)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    def loss_unfused(dd, x):
        attr = cheb_filter(coeffs, dd, fm, 0.0, hi)
        out = blocked_neighbor_sum_sym(attr, x, rel, blocks.run_starts,
                                       spec, True)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    (gf, of), (gu, ou) = (
        jax.grad(fn, argnums=(0, 1), has_aux=True)(d, feats)
        for fn in (loss_fused, loss_unfused))
    scale = np.abs(np.asarray(ou)).max()
    assert np.abs(np.asarray(of) - np.asarray(ou)).max() / scale < 1e-4
    for b, p, name in zip(gf, gu, ("dd", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        s = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / s < 2e-4, (name, np.abs(b - p).max() / s)


def test_blocked_q_tier_matches_packed_asym():
    """Fused charge-fold tier (blocked_neighbor_sum_asym_q, the TensorNet2
    MP kernel) vs the unfused pipeline (edge MLP -> packed_neighbor_sum_asym):
    values and (edge_attr, cwfm, u_i, u_j, feats) gradients.  Precise tier
    -> 1e-4 relative (the reference parity bar,
    ``tests/test_warp_ops.py:85-86``)."""
    from torchmdnet_tpu.ops.message_passing import (
        gather_nodes,
        packed_neighbor_sum_asym,
    )
    from torchmdnet_tpu.ops.pallas_blocked_mp import (
        blocked_neighbor_sum_asym_q,
    )

    f, r = 16, 8
    spec, blocks, nbr, rel, _, feats = _blocked_setup(f=f)
    spec = spec._replace(precise=True)
    n_pad, k = rel.shape
    rng = np.random.RandomState(11)
    # The asym-q op's CONTRACT requires direction-symmetric edge_attr and
    # cwfm (both are functions of the pair distance in the model: rbf(d)
    # and C(d)·mask) — its du_j comes from a mirrored in-kernel pass.
    # Symmetrize the random test arrays over the edge involution.
    from torchmdnet_tpu.ops.message_passing import gather_rev as _grev

    edge_attr = jnp.asarray(rng.randn(n_pad, k, r).astype(np.float32))
    edge_attr = 0.5 * (edge_attr + _grev(edge_attr, nbr.idx, nbr.rev_slot,
                                         nbr.mask))
    cwfm = jnp.asarray(
        (rng.rand(n_pad, k) * np.asarray(nbr.mask)).astype(np.float32))
    cwfm = 0.5 * (cwfm + _grev(cwfm[..., None], nbr.idx, nbr.rev_slot,
                               nbr.mask)[..., 0])
    u_i = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    u_j = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    w1a = jnp.asarray(rng.randn(r, f).astype(np.float32) / np.sqrt(r))
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) / np.sqrt(f))
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(
        rng.randn(2 * f, 3 * f).astype(np.float32) / np.sqrt(2 * f))
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    def loss_fused(ea, cw, ui, uj, x):
        out = blocked_neighbor_sum_asym_q(
            ea, cw, ui, uj, x, nbr.mask, nbr.idx, nbr.rev_slot,
            rel, blocks.run_starts, w1a, w2, b2, w3, b3, spec, True)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    def loss_unfused(ea, cw, ui, uj, x):
        def tail(pre):
            h = jax.nn.silu(pre)
            h = jax.nn.silu(h @ w2 + b2)
            return jax.nn.silu(h @ w3 + b3)

        base = jnp.einsum("nkr,rf->nkf", ea, w1a,
                          precision=jax.lax.Precision.HIGHEST)
        uj_e = gather_nodes(uj, nbr.idx, nbr.rev_slot, nbr.mask)
        ui_e = gather_nodes(ui, nbr.idx, nbr.rev_slot, nbr.mask)
        attr = tail(base + ui[:, None, :] + uj_e) * cw[..., None]
        attr_rev = tail(base + uj[:, None, :] + ui_e) * cw[..., None]
        out = packed_neighbor_sum_asym(attr, attr_rev, x, nbr.idx,
                                       nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    args = (edge_attr, cwfm, u_i, u_j, feats)
    (gf, of), (gu, ou) = (
        jax.grad(fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)
        for fn in (loss_fused, loss_unfused))
    scale = np.abs(np.asarray(ou)).max()
    assert np.abs(np.asarray(of) - np.asarray(ou)).max() / scale < 1e-4
    for b, p, name in zip(gf, gu,
                          ("dedge_attr", "dcwfm", "du_i", "du_j", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        s = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / s < 2e-4, (name,
                                                np.abs(b - p).max() / s)


def test_blocked_q_tier_grouped_matches_packed_asym():
    """Grouped (column-partitioned) fused charge-fold tier vs the unfused
    pipeline: values and all five gradients.  Same bars as the ungrouped
    q-tier test; exercises _mp_kernel_q_grouped/_dq_kernel_grouped and the
    column-major edge reshapes."""
    from torchmdnet_tpu.ops.message_passing import (
        gather_nodes,
        packed_neighbor_sum_asym,
    )
    from torchmdnet_tpu.ops.pallas_blocked_mp import (
        blocked_neighbor_sum_asym_q,
    )

    f, r = 16, 8
    spec, blocks, nbr, rel, _, feats = _grouped_setup(f=f, precise=True)
    n_pad, k = rel.shape
    rng = np.random.RandomState(13)
    # direction-symmetric edge arrays — the asym-q op's contract (see the
    # ungrouped test note)
    from torchmdnet_tpu.ops.message_passing import gather_rev as _grev

    edge_attr = jnp.asarray(rng.randn(n_pad, k, r).astype(np.float32))
    edge_attr = 0.5 * (edge_attr + _grev(edge_attr, nbr.idx, nbr.rev_slot,
                                         nbr.mask))
    cwfm = jnp.asarray(
        (rng.rand(n_pad, k) * np.asarray(nbr.mask)).astype(np.float32))
    cwfm = 0.5 * (cwfm + _grev(cwfm[..., None], nbr.idx, nbr.rev_slot,
                               nbr.mask)[..., 0])
    u_i = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    u_j = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    w1a = jnp.asarray(rng.randn(r, f).astype(np.float32) / np.sqrt(r))
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) / np.sqrt(f))
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(
        rng.randn(2 * f, 3 * f).astype(np.float32) / np.sqrt(2 * f))
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    def loss_fused(ea, cw, ui, uj, x):
        out = blocked_neighbor_sum_asym_q(
            ea, cw, ui, uj, x, nbr.mask, nbr.idx, nbr.rev_slot,
            rel, blocks.run_starts, w1a, w2, b2, w3, b3, spec, True)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    def loss_unfused(ea, cw, ui, uj, x):
        def tail(pre):
            h = jax.nn.silu(pre)
            h = jax.nn.silu(h @ w2 + b2)
            return jax.nn.silu(h @ w3 + b3)

        base = jnp.einsum("nkr,rf->nkf", ea, w1a,
                          precision=jax.lax.Precision.HIGHEST)
        uj_e = gather_nodes(uj, nbr.idx, nbr.rev_slot, nbr.mask)
        ui_e = gather_nodes(ui, nbr.idx, nbr.rev_slot, nbr.mask)
        attr = tail(base + ui[:, None, :] + uj_e) * cw[..., None]
        attr_rev = tail(base + uj[:, None, :] + ui_e) * cw[..., None]
        out = packed_neighbor_sum_asym(attr, attr_rev, x, nbr.idx,
                                       nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    args = (edge_attr, cwfm, u_i, u_j, feats)
    (gf, of), (gu, ou) = (
        jax.grad(fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)
        for fn in (loss_fused, loss_unfused))
    scale = np.abs(np.asarray(ou)).max()
    assert np.abs(np.asarray(of) - np.asarray(ou)).max() / scale < 1e-4
    for b, p, name in zip(gf, gu,
                          ("dedge_attr", "dcwfm", "du_i", "du_j", "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        s = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / s < 2e-4, (name,
                                                np.abs(b - p).max() / s)


def _tab_q_case(grouped, packed=False):
    """θ-tabulated q-tier (blocked_neighbor_sum_asym_q_tab) vs the unfused
    pipeline with the EXACT smooth base family base(d) = rbf(d)·W1a: values
    and all five gradients (incl. the d-cotangent via the derivative
    series).  T=64 over a width-0.5 gaussian family is ~1e-6 accurate, so
    the 1e-4 parity bar applies unchanged."""
    from torchmdnet_tpu.ops.cheb import cheb_fit_matrix, cheb_nodes
    from torchmdnet_tpu.ops.message_passing import (
        gather_nodes,
        gather_rev as _grev,
        packed_neighbor_sum_asym,
    )
    from torchmdnet_tpu.ops.pallas_blocked_mp import (
        blocked_neighbor_sum_asym_q_tab,
    )

    f, r, T, cutoff = 16, 8, 64, 3.2
    if grouped:
        spec, blocks, nbr, rel, _, feats = _grouped_setup(f=f, precise=True)
    else:
        spec, blocks, nbr, rel, _, feats = _blocked_setup(f=f)
        spec = spec._replace(precise=True)
    if packed:
        pos, box, _L = _system(600, seed=0)
        bd = jnp.diag(jnp.asarray(box))
        nru = np.asarray(blocks.nr1) + np.asarray(blocks.nr2)
        nrp = int(nru.sum(axis=1).max()) + 2
        nrp += nrp % 2
        spec = spec._replace(nrp=nrp)
        blocks = plan_cell_blocks(jnp.asarray(pos), bd, spec)
        assert not bool(blocks.overflow)
        ghost = np.asarray(blocks.perm) >= 600
        pos_s = jnp.asarray(np.where(ghost[:, None], 0.0,
                                     pos[np.minimum(np.asarray(blocks.perm),
                                                    599)]))
        rel, eov = edge_rel(blocks, nbr.idx, nbr.mask, pos_s, bd)
        assert not bool(eov)
    n_pad, k = rel.shape
    rng = np.random.RandomState(17)

    # direction-symmetric d and cwfm (the op contract; see the exact-tier
    # tests above)
    d = jnp.asarray((rng.rand(n_pad, k) * cutoff).astype(np.float32))
    d = 0.5 * (d + _grev(d[..., None], nbr.idx, nbr.rev_slot,
                         nbr.mask)[..., 0])
    cwfm = jnp.asarray(
        (rng.rand(n_pad, k) * np.asarray(nbr.mask)).astype(np.float32))
    cwfm = 0.5 * (cwfm + _grev(cwfm[..., None], nbr.idx, nbr.rev_slot,
                               nbr.mask)[..., 0])
    u_i = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    u_j = jnp.asarray(rng.randn(n_pad, f).astype(np.float32))
    mu = jnp.asarray(np.linspace(0.0, cutoff, r).astype(np.float32))
    w1a = jnp.asarray(rng.randn(r, f).astype(np.float32) / np.sqrt(r))
    w2 = jnp.asarray(rng.randn(f, 2 * f).astype(np.float32) / np.sqrt(f))
    b2 = jnp.asarray(rng.randn(2 * f).astype(np.float32) * 0.1)
    w3 = jnp.asarray(
        rng.randn(2 * f, 3 * f).astype(np.float32) / np.sqrt(2 * f))
    b3 = jnp.asarray(rng.randn(3 * f).astype(np.float32) * 0.1)

    def rbf(x):
        return jnp.exp(-((x[..., None] - mu) / 0.5) ** 2)

    coeffs = jnp.einsum(
        "ts,sf->tf", cheb_fit_matrix(T),
        rbf(cheb_nodes(T, 0.0, cutoff)) @ w1a,
        precision=jax.lax.Precision.HIGHEST)

    def loss_tab(dd, cw, ui, uj, x):
        out = blocked_neighbor_sum_asym_q_tab(
            dd, cw, ui, uj, x, nbr.mask, nbr.idx, nbr.rev_slot,
            rel, blocks.run_starts, coeffs, w2, b2, w3, b3, spec,
            0.0, cutoff, True)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    def loss_exact(dd, cw, ui, uj, x):
        def tail(pre):
            h = jax.nn.silu(pre)
            h = jax.nn.silu(h @ w2 + b2)
            return jax.nn.silu(h @ w3 + b3)

        base = jnp.einsum("nkr,rf->nkf", rbf(dd), w1a,
                          precision=jax.lax.Precision.HIGHEST)
        uj_e = gather_nodes(uj, nbr.idx, nbr.rev_slot, nbr.mask)
        ui_e = gather_nodes(ui, nbr.idx, nbr.rev_slot, nbr.mask)
        attr = tail(base + ui[:, None, :] + uj_e) * cw[..., None]
        attr_rev = tail(base + uj[:, None, :] + ui_e) * cw[..., None]
        out = packed_neighbor_sum_asym(attr, attr_rev, x, nbr.idx,
                                       nbr.rev_slot, nbr.mask)
        return jnp.sum(out * jnp.cos(out * 0.1)), out

    args = (d, cwfm, u_i, u_j, feats)
    (gt, ot), (ge, oe) = (
        jax.grad(fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)
        for fn in (loss_tab, loss_exact))
    scale = np.abs(np.asarray(oe)).max()
    assert np.abs(np.asarray(ot) - np.asarray(oe)).max() / scale < 1e-4
    for b, p, name in zip(gt, ge, ("dd", "dcwfm", "du_i", "du_j",
                                   "dfeats")):
        b, p = np.asarray(b), np.asarray(p)
        s = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / s < 5e-4, (name,
                                                np.abs(b - p).max() / s)


def test_blocked_q_tab_tier_matches_exact():
    _tab_q_case(grouped=False)


def test_blocked_q_tab_tier_grouped_matches_exact():
    _tab_q_case(grouped=True)


def test_blocked_packed_runs_matches_unpacked():
    """Packed-runs window layout (spec.nrp): each block's used runs are
    packed contiguously, shrinking the static window from 9·rpc·rlh to
    nrp·rlh.  The one-hot gather must address exactly the same rows —
    values match the per-column layout to accumulation-order rounding,
    and the q-tab tier's gradients match the exact pipeline."""
    from torchmdnet_tpu.ops.pallas_blocked_mp import blocked_neighbor_sum

    f = 16
    spec, blocks, nbr, rel, attr, feats = _blocked_setup(f=f)
    pos, box, L = _system(600, seed=0)
    bd = jnp.diag(jnp.asarray(box))

    nru = np.asarray(blocks.nr1) + np.asarray(blocks.nr2)
    nrp = int(nru.sum(axis=1).max()) + 2
    nrp += nrp % 2
    spec_p = spec._replace(nrp=nrp)
    assert spec_p.window < spec.window, (spec_p.window, spec.window)
    blocks_p = plan_cell_blocks(jnp.asarray(pos), bd, spec_p)
    assert not bool(blocks_p.overflow)
    # same sort (nrp does not touch the ordering)
    assert np.array_equal(np.asarray(blocks_p.perm),
                          np.asarray(blocks.perm))
    rel_p, eov = edge_rel(blocks_p, nbr.idx, nbr.mask,
                          jnp.asarray(np.where(
                              (np.asarray(blocks.perm) >= 600)[:, None],
                              0.0, pos[np.minimum(
                                  np.asarray(blocks.perm), 599)])), bd)
    assert not bool(eov)

    out_u = blocked_neighbor_sum(attr, feats, rel, blocks.run_starts,
                                 spec=spec, interpret=True)
    out_p = blocked_neighbor_sum(attr, feats, rel_p, blocks_p.run_starts,
                                 spec=spec_p, interpret=True)
    scale = np.abs(np.asarray(out_u)).max() + 1e-30
    assert np.abs(np.asarray(out_p) - np.asarray(out_u)).max() / scale \
        < 1e-5


def test_blocked_q_tab_tier_packed_matches_exact():
    _tab_q_case(grouped=False, packed=True)
