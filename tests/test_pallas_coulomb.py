"""Windowed direct-pair Coulomb kernel vs the list-based oracle.

The windowed kernel (ops/pallas_coulomb.py) must match
``coulomb_cutoff_energy_w`` over a COMPLETE neighbor list — energies and
all three gradients (pos, charges, channel weights) — on a random
liquid-density PBC config, including ghost rows.  Interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

RC, EPS, FACTOR = 6.0, 78.3, 7.199822
C = 8


def _setup(n=2000, seed=0, rc_plan=RC):
    rng = np.random.RandomState(seed)
    box = np.array([(n / 0.1) ** (1 / 3.0)] * 3)
    box[2] *= 0.91
    pos = rng.uniform(0, 1, (n, 3)) * box
    bdiag = jnp.asarray(box, jnp.float32)
    spec = tune_cell_block_spec(
        jnp.asarray(pos, jnp.float32), bdiag, 4.5, cap=8)
    wspec = tune_stencil_window_spec(
        jnp.asarray(pos, jnp.float32), bdiag, spec, rc_plan)
    blocks = plan_cell_blocks(jnp.asarray(pos, jnp.float32), bdiag, spec)
    win = plan_stencil_windows(
        jnp.asarray(pos, jnp.float32), bdiag, spec, wspec)
    assert not bool(win.overflow)

    perm = np.asarray(blocks.perm)
    mask_rows = np.asarray(blocks.mask_rows)
    pos_s = np.zeros((spec.n_pad, 3), np.float32)
    pos_s[mask_rows] = pos[np.minimum(perm, n - 1)[mask_rows]]
    b = rng.randn(spec.n_pad, C).astype(np.float32)
    b[~mask_rows] = rng.randn((~mask_rows).sum(), C)  # ghost garbage stays
    qw = rng.randn(C).astype(np.float32)

    cwin = make_coulomb_windows(
        win, wspec, blocks.mask_rows, bdiag, spec=spec)
    return (spec, wspec, cwin, jnp.asarray(pos_s), jnp.asarray(b),
            jnp.asarray(qw), jnp.asarray(mask_rows), bdiag)


def _list_oracle(pos_s, b, qw, mask_rows, bdiag):
    nbr = build_neighbor_matrix(
        pos_s, strategy="brute", k_max=220, cutoff_upper=RC, loop=False,
        box=jnp.diag(bdiag), atom_mask=mask_rows)
    assert not bool(nbr.overflow)

    def e_fn(p, w, bb):
        return coulomb_cutoff_energy_w(
            p, w, bb, nbr.idx, nbr.mask, RC, EPS, FACTOR,
            jnp.diag(bdiag), None)

    return e_fn


def test_windowed_coulomb_matches_list_path():
    (spec, wspec, cwin, pos_s, b, qw, mask_rows, bdiag) = _setup()
    e_fn = _list_oracle(pos_s, b, qw, mask_rows, bdiag)
    e_ref = e_fn(pos_s, qw, b)
    e_win = windowed_coulomb_energy(
        pos_s, qw, b, cwin, spec, wspec, RC, EPS, FACTOR, True)
    e_ref = jnp.where(mask_rows, e_ref, 0.0)
    scale = float(jnp.max(jnp.abs(e_ref))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(e_win), np.asarray(e_ref), atol=2e-5 * scale, rtol=0)


def test_windowed_coulomb_grads_match():
    (spec, wspec, cwin, pos_s, b, qw, mask_rows, bdiag) = _setup(seed=3)
    e_fn = _list_oracle(pos_s, b, qw, mask_rows, bdiag)
    r = jax.random.normal(jax.random.PRNGKey(7), (spec.n_pad,))
    r = jnp.where(mask_rows, r, 0.0)  # ghost e rows differ by design

    def loss_ref(p, w, bb):
        return jnp.sum(r * jnp.where(mask_rows, e_fn(p, w, bb), 0.0))

    def loss_win(p, w, bb):
        return jnp.sum(r * windowed_coulomb_energy(
            p, w, bb, cwin, spec, wspec, RC, EPS, FACTOR, True))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(pos_s, qw, b)
    g_win = jax.grad(loss_win, argnums=(0, 1, 2))(pos_s, qw, b)
    for gr, gw, name in zip(g_ref, g_win, ("pos", "qw", "b")):
        if name != "qw":
            gr = gr * mask_rows.astype(gr.dtype).reshape(
                (-1,) + (1,) * (gr.ndim - 1))
        scale = float(jnp.max(jnp.abs(gr))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gr), atol=3e-5 * scale, rtol=0,
            err_msg=name)


def test_windowed_coulomb_ghost_rows_silent():
    """Ghost rows produce exactly zero energy and zero force, and real
    rows are unaffected by ghost garbage charges."""
    (spec, wspec, cwin, pos_s, b, qw, mask_rows, bdiag) = _setup(seed=5)

    def loss(p, bb):
        return jnp.sum(windowed_coulomb_energy(
            p, qw, bb, cwin, spec, wspec, RC, EPS, FACTOR, True))

    e = windowed_coulomb_energy(
        pos_s, qw, b, cwin, spec, wspec, RC, EPS, FACTOR, True)
    assert float(jnp.max(jnp.abs(jnp.where(mask_rows, 0.0, e)))) == 0.0
    gp, gb = jax.grad(loss, argnums=(0, 1))(pos_s, b)
    ghost = ~np.asarray(mask_rows)
    assert float(jnp.max(jnp.abs(gp[ghost]))) == 0.0
    assert float(jnp.max(jnp.abs(gb[ghost]))) == 0.0

    b2 = b.at[jnp.nonzero(jnp.asarray(ghost))[0]].set(99.0)
    e2 = windowed_coulomb_energy(
        pos_s, qw, b2, cwin, spec, wspec, RC, EPS, FACTOR, True)
    real = np.asarray(mask_rows)
    np.testing.assert_array_equal(np.asarray(e)[real], np.asarray(e2)[real])
