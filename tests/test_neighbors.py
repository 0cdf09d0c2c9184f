"""Neighbor-matrix correctness vs a NumPy O(N²) oracle
(port of the reference test strategy, tests/test_neighbors.py:30-90)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchmdnet_tpu.ops.neighbors import (
    brute_neighbor_matrix,
    cell_neighbor_matrix,
    neighbor_geometry,
    neighbor_matrix_to_edge_list,
)


def numpy_pairs(pos, batch, cutoff_lower, cutoff_upper, loop, box=None):
    """Reference oracle: set of directed pairs (i, j) with wrapped deltas."""
    n = pos.shape[0]
    delta = pos[:, None, :] - pos[None, :, :]
    if box is not None:
        a, b, c = box[0], box[1], box[2]
        delta = delta - np.round(delta[..., 2:3] / c[2]) * c
        delta = delta - np.round(delta[..., 1:2] / b[1]) * b
        delta = delta - np.round(delta[..., 0:1] / a[0]) * a
    dist = np.linalg.norm(delta, axis=-1)
    pairs = set()
    for i in range(n):
        for j in range(n):
            if batch[i] != batch[j]:
                continue
            if i == j and not loop:
                continue
            if dist[i, j] >= cutoff_upper:
                continue
            if i != j and cutoff_lower > 0 and dist[i, j] < cutoff_lower:
                continue
            pairs.add((i, j))
    return pairs, delta, dist


def matrix_pairs(nbr):
    idx = np.asarray(nbr.idx)
    mask = np.asarray(nbr.mask)
    out = set()
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                out.add((i, int(idx[i, k])))
    return out


@pytest.mark.parametrize("loop", [False, True])
@pytest.mark.parametrize("use_box", [False, True])
@pytest.mark.parametrize("cutoff_lower", [0.0, 1.0])
def test_brute_matches_numpy_oracle(loop, use_box, cutoff_lower):
    rng = np.random.RandomState(42)
    n = 50
    pos = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    batch = np.sort(rng.randint(0, 3, n)).astype(np.int32)
    box = np.diag([10.0, 10.0, 10.0]).astype(np.float32) if use_box else None
    cutoff = 3.0

    nbr = brute_neighbor_matrix(
        jnp.asarray(pos),
        jnp.asarray(batch),
        k_max=n,
        cutoff_upper=cutoff,
        cutoff_lower=cutoff_lower,
        loop=loop,
        box=jnp.asarray(box) if box is not None else None,
    )
    expected, delta_ref, dist_ref = numpy_pairs(
        pos, batch, cutoff_lower, cutoff, loop, box
    )
    assert matrix_pairs(nbr) == expected
    assert not bool(nbr.overflow)

    delta, dist = neighbor_geometry(
        jnp.asarray(pos), nbr,
        box=jnp.asarray(box) if box is not None else None,
        batch=jnp.asarray(batch),
    )
    delta, dist = np.asarray(delta), np.asarray(dist)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    for i in range(n):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                j = idx[i, k]
                np.testing.assert_allclose(
                    delta[i, k], delta_ref[i, j], rtol=1e-5, atol=1e-5
                )
                np.testing.assert_allclose(
                    dist[i, k], dist_ref[i, j], rtol=1e-5, atol=1e-5
                )


def test_brute_overflow_flag():
    pos = np.zeros((5, 3), np.float32)  # all coincident: 4 neighbors each
    nbr = brute_neighbor_matrix(
        jnp.asarray(pos), k_max=2, cutoff_upper=1.0, loop=False
    )
    assert bool(nbr.overflow)


def test_atom_mask_excludes_ghosts():
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 4, (10, 3)).astype(np.float32)
    mask = np.array([True] * 7 + [False] * 3)
    nbr = brute_neighbor_matrix(
        jnp.asarray(pos),
        k_max=10,
        cutoff_upper=100.0,
        loop=True,
        atom_mask=jnp.asarray(mask),
    )
    pairs = matrix_pairs(nbr)
    for i, j in pairs:
        assert mask[i] and mask[j]
    assert len(pairs) == 7 * 7


@pytest.mark.parametrize("loop", [False, True])
def test_cell_matches_brute(loop):
    rng = np.random.RandomState(7)
    n = 200
    L = 20.0
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    box = np.diag([L, L, L]).astype(np.float32)
    cutoff = 3.5

    ref = brute_neighbor_matrix(
        jnp.asarray(pos), k_max=64, cutoff_upper=cutoff, loop=loop,
        box=jnp.asarray(box),
    )
    cell = cell_neighbor_matrix(
        jnp.asarray(pos), k_max=64, cutoff_upper=cutoff, loop=loop,
        box=jnp.asarray(box), cell_capacity=32,
    )
    assert matrix_pairs(cell) == matrix_pairs(ref)
    assert not bool(cell.overflow)


@pytest.mark.parametrize("stencil", [2, 3])
def test_cell_wide_stencil_matches_brute(stencil):
    """±S stencil with cutoff/S-wide cells ≡ brute (large-cutoff grids,
    used by the Coulomb head's neighbor list)."""
    rng = np.random.RandomState(11)
    n = 300
    L = 24.0
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    box = np.diag([L, L, L]).astype(np.float32)
    cutoff = 7.0  # large relative to the box: 27-stencil cells are 8 Å

    ref = brute_neighbor_matrix(
        jnp.asarray(pos), k_max=96, cutoff_upper=cutoff,
        box=jnp.asarray(box),
    )
    cell = cell_neighbor_matrix(
        jnp.asarray(pos), k_max=96, cutoff_upper=cutoff,
        box=jnp.asarray(box), cell_capacity=24, stencil=stencil,
    )
    assert matrix_pairs(cell) == matrix_pairs(ref)
    assert not bool(cell.overflow)


def test_compaction_lowerings_identical():
    """The two large-C compaction lowerings (element scatter, K-pass
    masked reduction) are bit-identical: same slots, same order.

    ``compact`` is a static jit argname (read from TMDNET_COMPACT outside
    jit), so the two builds get distinct compile-cache entries — the
    round-2 env-var version of this test silently hit the jit cache and
    never exercised the second lowering (ADVICE r2)."""
    rng = np.random.RandomState(3)
    n = 500
    L = 18.0
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    box = np.diag([L, L, L]).astype(np.float32)
    # cell_capacity=48 ⇒ C = 27·48 = 1296 > 1024: the large-C branch
    builds = {}
    for lowering in ("scatter", "kloop"):
        builds[lowering] = cell_neighbor_matrix(
            jnp.asarray(pos), k_max=64, cutoff_upper=4.0,
            box=jnp.asarray(box), cell_capacity=48, compact=lowering,
        )
    a, b = builds["scatter"], builds["kloop"]
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.rev_slot),
                                  np.asarray(b.rev_slot))
    ref = brute_neighbor_matrix(
        jnp.asarray(pos), k_max=64, cutoff_upper=4.0, box=jnp.asarray(box))
    assert matrix_pairs(b) == matrix_pairs(ref)


def test_pick_cell_grid_covers_cutoff():
    from torchmdnet_tpu.ops.neighbors import pick_cell_grid

    for L, rc, n in [(63.0, 11.0, 25088), (20.0, 3.5, 200),
                     (40.0, 10.0, 6400)]:
        dims, S, cap = pick_cell_grid([L] * 3, rc, n)
        # stencil must cover the cutoff sphere: S cells ≥ rc
        assert all(L / d * S >= rc - 1e-9 for d in dims)
        assert all(d >= 2 * S + 1 for d in dims)
        # capacity holds the mean occupancy with headroom
        occ = n / (dims[0] * dims[1] * dims[2])
        assert cap >= occ * 2.0
    # the large-cutoff case must pick a finer-than-27-stencil grid
    dims, S, cap = pick_cell_grid([63.0] * 3, 11.0, 25088)
    assert S >= 2
    assert (2 * S + 1) ** 3 * cap < 27 * int(25088 / 5**3 * 2.5 + 8)


def test_edge_list_format():
    pos = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0]], np.float32)
    nbr = brute_neighbor_matrix(jnp.asarray(pos), k_max=2, cutoff_upper=2.0)
    ei = np.asarray(neighbor_matrix_to_edge_list(nbr))
    valid = ei[0] >= 0
    got = set(zip(ei[0][valid].tolist(), ei[1][valid].tolist()))
    assert got == {(0, 1), (1, 0)}
    assert (ei[:, ~valid] == -1).all()


def test_geometry_scatter_free_vjp_matches_plain():
    """neighbor_geometry's rev_slot VJP (gather_pair_deltas) must equal the
    plain scatter-add transpose to f32 tolerance, to second order."""
    import jax
    from torchmdnet_tpu.ops.neighbors import neighbor_geometry

    rng = np.random.RandomState(3)
    n = 40
    pos = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 3)
    nbr = brute_neighbor_matrix(pos, k_max=16, cutoff_upper=4.0, loop=True)
    nbr_plain = nbr._replace(rev_slot=None)

    def loss(nb):
        def f(p):
            delta, dist = neighbor_geometry(p, nb)
            return jnp.sum(jnp.sin(delta) * dist[..., None])
        return f

    g_fast = jax.grad(loss(nbr))(pos)
    g_plain = jax.grad(loss(nbr_plain))(pos)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)

    # second order (force-training path): grad of a grad-dependent scalar
    def meta(nb):
        def f(p):
            g = jax.grad(lambda q: jnp.sum(
                neighbor_geometry(q, nb)[1] ** 2))(p)
            return jnp.sum(g ** 2)
        return f

    h_fast = jax.grad(meta(nbr))(pos)
    h_plain = jax.grad(meta(nbr_plain))(pos)
    np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_plain),
                               rtol=1e-4, atol=1e-4)
