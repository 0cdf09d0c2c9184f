"""Chebyshev-tabulated edge filters (ops/cheb.py, Interaction tab branch):
the T=128 spectral tabulation must match the exact per-edge MLP path to
f32-level tolerance in energies, forces and parameter gradients, since it
evaluates the *same* parameterized function family through a near-exact
polynomial fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.ops.cheb import (
    cheb_basis,
    cheb_eval,
    cheb_fit_matrix,
    cheb_nodes,
)

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def test_cheb_fit_roundtrip_polynomial():
    # A degree-5 polynomial is represented exactly with T >= 6 terms.
    T, lo, hi = 16, 0.0, 4.5

    def f(d):
        x = d / hi
        return jnp.stack([x**5 - 2 * x**2 + 0.5, jnp.sin(0 * x) + x**3],
                         axis=-1)

    dk = cheb_nodes(T, lo, hi)
    coeffs = cheb_fit_matrix(T) @ f(dk)
    d = jnp.linspace(lo, hi - 1e-4, 100)
    np.testing.assert_allclose(
        np.asarray(cheb_eval(coeffs, d, lo, hi)), np.asarray(f(d)),
        rtol=0, atol=1e-5,
    )


def test_cheb_eval_zero_above_cutoff_and_grad_finite():
    T, hi = 32, 4.5
    dk = cheb_nodes(T, 0.0, hi)
    coeffs = cheb_fit_matrix(T) @ jnp.exp(-dk)[:, None]
    d = jnp.array([0.0, 1.0, hi - 1e-3, hi, hi + 1.0])
    out = np.asarray(cheb_eval(coeffs, d, 0.0, hi))
    assert out[3] == 0.0 and out[4] == 0.0  # window is strict at d >= hi
    g = jax.grad(lambda dd: jnp.sum(cheb_eval(coeffs, dd, 0.0, hi)))(d)
    assert np.all(np.isfinite(np.asarray(g)))  # incl. d = 0 and d > hi


def _args(tab, **over):
    a = dict(
        model="tensornet", embedding_dimension=32, num_layers=2, num_rbf=16,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=16,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        tabulated_edge_mlp=tab,
    )
    a.update(over)
    return a


@pytest.mark.parametrize("over", [{}, {"trainable_rbf": True},
                                  {"rbf_type": "gauss"},
                                  {"cutoff_lower": 1.0}])
def test_tabulated_matches_exact(over):
    rng = np.random.RandomState(0)
    n = 14
    z = jnp.asarray(rng.randint(1, 9, n), jnp.int32)
    pos = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2.0)
    batch = jnp.asarray(np.zeros(n, np.int32))

    pot_exact = create_model(_args(0, **over))
    pot_tab = create_model(_args(128, **over))
    variables = pot_exact.init(jax.random.PRNGKey(0), z, pos, batch,
                               num_mols=1)

    y0, f0 = jax.jit(
        lambda v, p: pot_exact.apply(v, z, p, batch, num_mols=1)
    )(variables, pos)
    y1, f1 = jax.jit(
        lambda v, p: pot_tab.apply(v, z, p, batch, num_mols=1)
    )(variables, pos)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=0, atol=2e-4)

    # parameter gradients of a force-dependent loss (training path,
    # double backward through the tabulation)
    def loss(pot):
        def inner(v, p):
            yy, ff = pot.apply(v, z, p, batch, num_mols=1)
            return jnp.sum(yy**2) + jnp.sum(ff**2)
        return inner

    g0 = jax.jit(jax.grad(loss(pot_exact)))(variables, pos)
    g1 = jax.jit(jax.grad(loss(pot_tab)))(variables, pos)
    for a0, a1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        scale = max(1.0, float(np.abs(np.asarray(a0)).max()))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=0, atol=5e-4 * scale)


def test_tabulated_skin_edges_contribute_zero():
    """MD caches neighbor lists with a skin: edges with d in
    (cutoff, cutoff+skin] must contribute exactly zero (and zero force)."""
    from functools import partial

    pot = create_model(_args(64, cutoff_upper=3.0))
    # two atoms beyond the cutoff, plus a bonded pair
    pos = jnp.asarray([[0.0, 0, 0], [3.4, 0, 0], [10.0, 0, 0],
                       [11.0, 0, 0]], jnp.float32)
    z = jnp.asarray([6, 6, 6, 6], jnp.int32)
    batch = jnp.zeros((4,), jnp.int32)

    from torchmdnet_tpu.ops.neighbors import build_neighbor_matrix

    # skin-padded index set (cutoff 3.0 + skin 1.0 sees the 3.4 Å pair)
    nbr = build_neighbor_matrix(pos, batch, strategy="brute", k_max=8,
                                cutoff_upper=4.0, loop=True)
    apply = jax.jit(partial(pot.apply, num_mols=1))
    y_skin, f_skin = apply(
        pot.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1),
        z, pos, batch, nbr=nbr,
    )
    nbr2 = build_neighbor_matrix(pos, batch, strategy="brute", k_max=8,
                                 cutoff_upper=3.0, loop=True)
    y_true, f_true = apply(
        pot.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1),
        z, pos, batch, nbr=nbr2,
    )
    np.testing.assert_allclose(np.asarray(y_skin), np.asarray(y_true),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_skin), np.asarray(f_true),
                               rtol=0, atol=1e-6)


def test_cheb_filter_kernel_and_vjp():
    """pallas interpret-mode == jnp fallback; analytic custom VJP ==
    autodiff of the plain (recurrence) evaluation."""
    from torchmdnet_tpu.ops.pallas_cheb import cheb_filter

    rng = np.random.RandomState(0)
    T, f3, n, k = 32, 8, 16, 4
    hi = 4.0
    dk = cheb_nodes(T, 0.0, hi)
    target = jnp.stack([jnp.exp(-dk) * jnp.cos(c * dk) for c in range(f3)],
                       axis=-1)
    coeffs = cheb_fit_matrix(T) @ target
    d = jnp.asarray(rng.uniform(0, hi * 1.1, (n, k)).astype(np.float32))
    fm = jnp.asarray((rng.rand(n, k) > 0.2) & (np.asarray(d) < hi)) \
        .astype(jnp.float32)

    out_jnp = cheb_filter(coeffs, d, fm, 0.0, hi, False)
    out_pl = cheb_filter(coeffs, d, fm, 0.0, hi, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_jnp),
                               rtol=1e-5, atol=1e-5)

    # reference: plain differentiable evaluation via the recurrence basis
    def ref(coeffs, d):
        out = cheb_eval(coeffs, d, 0.0, hi)
        return out * fm[..., None]

    ct = jnp.asarray(rng.randn(n, k, f3).astype(np.float32))

    def loss_fast(c, dd):
        return jnp.sum(cheb_filter(c, dd, fm, 0.0, hi, False) * ct)

    def loss_ref(c, dd):
        return jnp.sum(ref(c, dd) * ct)

    gc_f, gd_f = jax.grad(loss_fast, argnums=(0, 1))(coeffs, d)
    gc_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(coeffs, d)

    # interpret-mode kernels must produce the same gradients (exercises
    # the fused filter-dot and projection kernels)
    gc_i, gd_i = jax.grad(
        lambda c, dd: jnp.sum(cheb_filter(c, dd, fm, 0.0, hi, True) * ct),
        argnums=(0, 1),
    )(coeffs, d)
    np.testing.assert_allclose(np.asarray(gd_i), np.asarray(gd_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_i), np.asarray(gc_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd_f), np.asarray(gd_r),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-3, atol=2e-4)

    # second order: d-grad of a d-grad-dependent scalar (force training)
    def meta(c, dd):
        g = jax.grad(loss_fast, argnums=1)(c, dd)
        return jnp.sum(g**2)

    def meta_ref(c, dd):
        g = jax.grad(loss_ref, argnums=1)(c, dd)
        return jnp.sum(g**2)

    mc_f, md_f = jax.grad(meta, argnums=(0, 1))(coeffs, d)
    mc_r, md_r = jax.grad(meta_ref, argnums=(0, 1))(coeffs, d)
    scale = max(1.0, float(np.abs(np.asarray(md_r)).max()))
    np.testing.assert_allclose(np.asarray(md_f), np.asarray(md_r),
                               rtol=0, atol=1e-3 * scale)
    cscale = max(1.0, float(np.abs(np.asarray(mc_r)).max()))
    np.testing.assert_allclose(np.asarray(mc_f), np.asarray(mc_r),
                               rtol=0, atol=1e-3 * cscale)


def test_fused_embedding_matches_reference_path():
    """pallas_embedding=True (fused radial-embedding kernel, interpret mode
    on CPU) must match the plain jnp embedding in energies, forces and
    parameter gradients."""
    rng = np.random.RandomState(2)
    n = 16
    z = jnp.asarray(rng.randint(1, 9, n), jnp.int32)
    pos = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2.0)
    batch = jnp.asarray(np.zeros(n, np.int32))

    pot0 = create_model(_args(0))
    pot1 = create_model(_args(0, pallas_embedding=True))
    variables = pot0.init(jax.random.PRNGKey(0), z, pos, batch, num_mols=1)

    y0, f0 = jax.jit(lambda v, p: pot0.apply(v, z, p, batch, num_mols=1))(
        variables, pos)
    y1, f1 = jax.jit(lambda v, p: pot1.apply(v, z, p, batch, num_mols=1))(
        variables, pos)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-4, atol=1e-5)

    def loss(pot):
        def inner(v, p):
            yy, ff = pot.apply(v, z, p, batch, num_mols=1)
            return jnp.sum(yy**2) + jnp.sum(ff**2)
        return inner

    g0 = jax.jit(jax.grad(loss(pot0)))(variables, pos)
    g1 = jax.jit(jax.grad(loss(pot1)))(variables, pos)
    for a0, a1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        scale = max(1.0, float(np.abs(np.asarray(a0)).max()))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=0, atol=1e-4 * scale)


def test_fused_embedding_kchunk_accumulation():
    """K > _K_CHUNK exercises the in-kernel K-chunked accumulation (the
    grouped neighbor layout's K' ~ 3K blew the whole-K kernel past the
    scoped-VMEM limit at 25k) — kernel output must equal the jnp chain."""
    from torchmdnet_tpu.ops import pallas_embedding as pe

    rng = np.random.RandomState(5)
    n, k, r, f = 16, 289, 8, 32  # k > 2*_K_CHUNK, non-multiple tail
    assert k > 2 * pe._K_CHUNK
    ea = jnp.asarray(rng.randn(n, k, r).astype(np.float32))
    C = jnp.asarray(rng.rand(n, k).astype(np.float32))
    vx, vy, vz = (jnp.asarray(rng.randn(n, k).astype(np.float32))
                  for _ in range(3))
    zw1 = jnp.asarray(rng.randn(n, f).astype(np.float32))
    zw2g = jnp.asarray(rng.randn(n, k, f).astype(np.float32))
    em = jnp.asarray((rng.rand(n, k) > 0.3).astype(np.float32))
    kall = jnp.asarray(rng.randn(r, 3 * f).astype(np.float32))
    ball = jnp.asarray(rng.randn(3 * f).astype(np.float32))

    ref = pe.radial_embedding_jnp(ea, C, vx, vy, vz, zw1, zw2g, em,
                                  kall, ball)
    out = pe.fused_radial_embedding(ea, C, vx, vy, vz, zw1, zw2g, em,
                                    kall, ball, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_embedding_backward_kernel_matches_jnp():
    """Round-5 backward kernel (in-kernel jax.vjp of the jnp chain): all
    ten cotangents must match the pure-jnp VJP (the emask cotangent is
    defined as zero — the mask is non-differentiable)."""
    from torchmdnet_tpu.ops import pallas_embedding as pe

    rng = np.random.RandomState(7)
    n, k, r, f = 32, 161, 8, 32  # K-chunk tail + two row tiles
    ea = jnp.asarray(rng.randn(n, k, r).astype(np.float32))
    C = jnp.asarray(rng.rand(n, k).astype(np.float32))
    vx, vy, vz = (jnp.asarray(rng.randn(n, k).astype(np.float32))
                  for _ in range(3))
    zw1 = jnp.asarray(rng.randn(n, f).astype(np.float32))
    zw2g = jnp.asarray(rng.randn(n, k, f).astype(np.float32))
    em = jnp.asarray((rng.rand(n, k) > 0.3).astype(np.float32))
    kall = jnp.asarray(rng.randn(r, 3 * f).astype(np.float32))
    ball = jnp.asarray(rng.randn(3 * f).astype(np.float32))
    args = (ea, C, vx, vy, vz, zw1, zw2g, em, kall, ball)

    def loss_fused(*a):
        out = pe.fused_radial_embedding(*a, True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_ref(*a):
        out = pe.radial_embedding_jnp(*a)
        return jnp.sum(out * jnp.cos(out * 0.1))

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = ("dea", "dC", "dvx", "dvy", "dvz", "dzw1", "dzw2g", "dem",
             "dkall", "dball")
    for b, p, name in zip(gf, gr, names):
        if name == "dem":
            continue  # defined zero in the kernel (non-diff mask)
        b, p = np.asarray(b), np.asarray(p)
        s = np.abs(p).max() + 1e-30
        assert np.abs(b - p).max() / s < 2e-5, (name,
                                                np.abs(b - p).max() / s)
