"""Pallas TPU kernels for the hot edge pipeline.

``fused_edge_mlp(x, cw, w1, b1, w2, b2, w3, b3)``: the per-edge 3-layer
silu MLP + cutoff/pad mask of every TensorNet interaction layer (reference
``Interaction.linears_scalar``, ``tensornet.py:739-743``) in one kernel.
XLA's lowering round-trips each intermediate ([N,K,F], [N,K,2F]) through
HBM; the kernel runs the whole chain in VMEM per edge tile and writes only
the final [N, K, 3F] block.

Backward: recompute through the numerically identical jnp chain (both use
f32 HIGHEST matmuls), so training gradients are exact and no bwd kernel is
needed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 16


def _pick_tile(n, k, f3):
    """Row-tile size bounded by the ~16 MB scoped-VMEM budget (pipelined
    in/out blocks + the [tile·k, 2F/3F] intermediates).  Calibrated
    empirically at F=128: tile=16 with K=96 fits (13.5 MB scoped), K=128
    overflows by ~12% — so cap the per-tile edge count at 16·96."""
    tile = TILE_N
    while tile > 4 and tile * k > 16 * 96:
        tile //= 2
    while tile > 4 and n % tile:
        tile //= 2
    return tile


def _prec():
    from torchmdnet_tpu.ops.config import get_matmul_precision

    return get_matmul_precision()


def _kernel_prec():
    # Mosaic supports only DEFAULT/HIGHEST dot precisions; map HIGH up.
    p = _prec()
    if p == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return p


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_prec(),
    )


def _edge_mlp_kernel(x_ref, cw_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                     b3_ref, out_ref, *, tile, k, cin, f3):
    x = x_ref[:].reshape(tile * k, cin)
    h = jax.nn.silu(_dot(x, w1_ref[:]) + b1_ref[:][None, :])
    h = jax.nn.silu(_dot(h, w2_ref[:]) + b2_ref[:][None, :])
    h = jax.nn.silu(_dot(h, w3_ref[:]) + b3_ref[:][None, :])
    # apply the cutoff/pad mask in the tiled shape — reshaping cw to
    # [E, 1] would move lanes into sublanes (unsupported tpu.reshape)
    out_ref[:] = h.reshape(tile, k, f3) * cw_ref[:][..., None]


def edge_mlp_jnp(x, cw, w1, b1, w2, b2, w3, b3):
    """Reference jnp chain — identical numerics, used for bwd + fallback."""
    hi = _prec()
    h = jax.nn.silu(jnp.einsum("nkr,rf->nkf", x, w1, precision=hi) + b1)
    h = jax.nn.silu(jnp.einsum("nkf,fg->nkg", h, w2, precision=hi) + b2)
    h = jax.nn.silu(jnp.einsum("nkg,gh->nkh", h, w3, precision=hi) + b3)
    return h * cw[..., None]


def _forward(x, cw, w1, b1, w2, b2, w3, b3, interpret=False):
    n, k, cin = x.shape
    f3 = w3.shape[1]
    tile = _pick_tile(n, k, f3)
    if n % tile or x.dtype != jnp.float32:
        return edge_mlp_jnp(x, cw, w1, b1, w2, b2, w3, b3)
    kernel = functools.partial(_edge_mlp_kernel, tile=tile, k=k, cin=cin,
                               f3=f3)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, k, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec((tile, k, f3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, f3), jnp.float32),
        interpret=interpret,
    )(x, cw, w1, b1, w2, b2, w3, b3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_edge_mlp(x, cw, w1, b1, w2, b2, w3, b3, interpret=False):
    """Fused edge MLP; set ``interpret=True`` to run the kernel in
    interpreter mode (CPU tests)."""
    return _forward(x, cw, w1, b1, w2, b2, w3, b3, interpret)


def _fwd(x, cw, w1, b1, w2, b2, w3, b3, interpret):
    return fused_edge_mlp(x, cw, w1, b1, w2, b2, w3, b3, interpret), (
        x, cw, w1, b1, w2, b2, w3, b3
    )


def _bwd(interpret, res, g):
    x, cw, w1, b1, w2, b2, w3, b3 = res
    n, k, _ = x.shape
    # row-chunked recompute: the full-width vjp holds every [N,K,*]
    # intermediate simultaneously (OOM at 25k atoms).  Below ~4 GB of live
    # vjp transients skip chunking — the lax.map staging costs ~2x at
    # dhfr scale (measured 2026-08-16).
    per_row = k * (w3.shape[1] * 3) * 4 * 6  # rough live-bytes/row in vjp
    if n * per_row <= 6 * 1024**3:
        chunk = n
    else:
        budget = 2 * 1024**3
        chunk = max(min(n, budget // per_row), 8)
        while n % chunk:
            chunk -= 1
    if chunk == n:
        _, vjp = jax.vjp(edge_mlp_jnp, *res)
        return vjp(g)

    def one(args):
        x_c, cw_c, g_c = args
        _, vjp = jax.vjp(
            lambda xx, cc, *w: edge_mlp_jnp(xx, cc, *w), x_c, cw_c,
            w1, b1, w2, b2, w3, b3,
        )
        return vjp(g_c)

    outs = jax.lax.map(
        one,
        (
            x.reshape(n // chunk, chunk, *x.shape[1:]),
            cw.reshape(n // chunk, chunk, k),
            g.reshape(n // chunk, chunk, *g.shape[1:]),
        ),
    )
    dx, dcw, dw1, db1, dw2, db2, dw3, db3 = outs
    return (
        dx.reshape(x.shape),
        dcw.reshape(cw.shape),
        jnp.sum(dw1, axis=0),
        jnp.sum(db1, axis=0),
        jnp.sum(dw2, axis=0),
        jnp.sum(db2, axis=0),
        jnp.sum(dw3, axis=0),
        jnp.sum(db3, axis=0),
    )


fused_edge_mlp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Variant with a precomputed first-layer preactivation (TensorNet2)
# ---------------------------------------------------------------------------
#
# Interaction2's first linear acts on concat([rbf, q_i, q_j]); folding the
# charge columns into per-node vectors (models/tensornet2.py) leaves
# ``pre1[n,k,F] = rbf·W1a + u_i[n] + u_j[idx[n,k]]`` computed by XLA (one
# lane-aligned [N,F]-row gather instead of the 8x-lane-padded [N,K,q_dim]
# charge gather and its {0,2,1} layout copies).  This kernel runs the
# remaining silu → linear → silu → linear → silu chain + cutoff mask in
# VMEM per edge tile.


def _edge_mlp_pre_kernel(p_ref, cw_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                         out_ref, *, tile, k, f3):
    f = p_ref.shape[-1]
    h = jax.nn.silu(p_ref[:].reshape(tile * k, f))
    h = jax.nn.silu(_dot(h, w2_ref[:]) + b2_ref[:][None, :])
    h = jax.nn.silu(_dot(h, w3_ref[:]) + b3_ref[:][None, :])
    out_ref[:] = h.reshape(tile, k, f3) * cw_ref[:][..., None]


def edge_mlp_pre_jnp(pre1, cw, w2, b2, w3, b3):
    """Identical-numerics jnp chain — bwd recompute + non-TPU fallback."""
    hi = _prec()
    h = jax.nn.silu(pre1)
    h = jax.nn.silu(jnp.einsum("nkf,fg->nkg", h, w2, precision=hi) + b2)
    h = jax.nn.silu(jnp.einsum("nkg,gh->nkh", h, w3, precision=hi) + b3)
    return h * cw[..., None]


def _forward_pre(pre1, cw, w2, b2, w3, b3, interpret=False):
    n, k, _ = pre1.shape
    f3 = w3.shape[1]
    tile = _pick_tile(n, k, f3)
    if n % tile or pre1.dtype != jnp.float32:
        return edge_mlp_pre_jnp(pre1, cw, w2, b2, w3, b3)
    kernel = functools.partial(_edge_mlp_pre_kernel, tile=tile, k=k, f3=f3)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, k, pre1.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec((tile, k, f3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, f3), jnp.float32),
        interpret=interpret,
    )(pre1, cw, w2, b2, w3, b3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_edge_mlp_pre(pre1, cw, w2, b2, w3, b3, interpret=False):
    """2-layer fused edge MLP over a precomputed first preactivation."""
    return _forward_pre(pre1, cw, w2, b2, w3, b3, interpret)


def _fwd_pre(pre1, cw, w2, b2, w3, b3, interpret):
    return fused_edge_mlp_pre(pre1, cw, w2, b2, w3, b3, interpret), (
        pre1, cw, w2, b2, w3, b3
    )


def _bwd_pre(interpret, res, g):
    pre1, cw, w2, b2, w3, b3 = res
    n, k, _ = pre1.shape
    per_row = k * (w3.shape[1] * 3) * 4 * 6
    if n * per_row <= 6 * 1024**3:
        chunk = n
    else:
        budget = 2 * 1024**3
        chunk = max(min(n, budget // per_row), 8)
        while n % chunk:
            chunk -= 1
    if chunk == n:
        _, vjp = jax.vjp(edge_mlp_pre_jnp, *res)
        return vjp(g)

    def one(args):
        p_c, cw_c, g_c = args
        _, vjp = jax.vjp(
            lambda pp, cc, *w: edge_mlp_pre_jnp(pp, cc, *w), p_c, cw_c,
            w2, b2, w3, b3,
        )
        return vjp(g_c)

    outs = jax.lax.map(
        one,
        (
            pre1.reshape(n // chunk, chunk, *pre1.shape[1:]),
            cw.reshape(n // chunk, chunk, k),
            g.reshape(n // chunk, chunk, *g.shape[1:]),
        ),
    )
    dp, dcw, dw2, db2, dw3, db3 = outs
    return (
        dp.reshape(pre1.shape),
        dcw.reshape(cw.shape),
        jnp.sum(dw2, axis=0),
        jnp.sum(db2, axis=0),
        jnp.sum(dw3, axis=0),
        jnp.sum(db3, axis=0),
    )


fused_edge_mlp_pre.defvjp(_fwd_pre, _bwd_pre)
