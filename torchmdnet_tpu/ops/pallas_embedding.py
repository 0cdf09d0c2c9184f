"""Pallas TPU kernel for TensorNet's radial tensor embedding.

``fused_radial_embedding``: the embedding's per-edge pipeline — distance
projections ``dp = rbf @ [R,3F]``, the cutoff/pair product
``cz = C·(zw1_i + zw2_j)·mask``, and the nine radial reductions
``I = Σ_k w0``, ``A_d = Σ_k w1·v̂_d``, ``S_c = Σ_k w2·s5_c(v̂)``
(reference ``tensornet.py:405-445, 543-619``) — in one kernel.

XLA materializes ``dp`` [N,K,3F] and the three ``w*`` [N,K,F] blocks in
HBM (≈ 7 GB of round-trips at the 25k MD config); the kernel keeps the
whole chain in VMEM per row tile and writes only the [N, 9F] result.

Backward: recompute-vjp through the numerically identical jnp chain,
row-chunked (same pattern as ``fused_edge_mlp``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 16


def _prec():
    from torchmdnet_tpu.ops.config import get_matmul_precision

    return get_matmul_precision()


def _kernel_prec():
    p = _prec()
    if p == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return p


def radial_embedding_jnp(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f,
                         kall, ball, precision=None):
    """Reference jnp chain — identical numerics; used for bwd + fallback.

    Args: edge_attr [N,K,R]; C/vx/vy/vz/emask_f [N,K]; zw1 [N,F];
    zw2g [N,K,F] (pre-masked gather of the pair-linear half);
    kall [R,3F]; ball [3F].  Returns [N, 9F] = (I, A×3, S×5).
    """
    n, k, _ = edge_attr.shape
    f = zw1.shape[-1]
    if precision is None:
        precision = _prec()
    dp = jnp.einsum("nkr,rf->nkf", edge_attr, kall,
                    precision=precision) + ball
    cz = C[..., None] * (zw1[:, None, :] + zw2g) * emask_f[..., None]
    w0 = cz * dp[..., :f]
    w1 = cz * dp[..., f:2 * f]
    w2 = cz * dp[..., 2 * f:]
    tr3 = (vx * vx + vy * vy + vz * vz) / 3.0
    blocks = [
        jnp.sum(w0, axis=1),
        jnp.sum(w1 * vx[..., None], axis=1),
        jnp.sum(w1 * vy[..., None], axis=1),
        jnp.sum(w1 * vz[..., None], axis=1),
        jnp.sum(w2 * (vx * vx - tr3)[..., None], axis=1),
        jnp.sum(w2 * (vx * vy)[..., None], axis=1),
        jnp.sum(w2 * (vx * vz)[..., None], axis=1),
        jnp.sum(w2 * (vy * vy - tr3)[..., None], axis=1),
        jnp.sum(w2 * (vy * vz)[..., None], axis=1),
    ]
    return jnp.concatenate(blocks, axis=-1)


# Largest K-chunk the kernel computes at once: the [TILE_N, kc, 3F] dp
# plus the cz/w* temporaries must stay under the ~16 MB scoped-VMEM
# limit (the grouped neighbor layout's K' ≈ 3K blew a whole-K kernel up
# to ~50 MB at the 25k config).
_K_CHUNK = 128


def _emb_kernel(ea_ref, c_ref, vx_ref, vy_ref, vz_ref, zw1_ref, zw2g_ref,
                em_ref, kall_ref, ball_ref, out_ref, *, k, r, f):
    zw1 = zw1_ref[:][:, None, :]
    acc = None
    for s in range(0, k, _K_CHUNK):
        kc = min(_K_CHUNK, k - s)
        sl = slice(s, s + kc)
        dp = jax.lax.dot_general(
            ea_ref[:, sl, :].reshape(TILE_N * kc, r), kall_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_kernel_prec(),
        ) + ball_ref[:]
        dp = dp.reshape(TILE_N, kc, 3 * f)
        cz = (c_ref[:, sl][..., None]
              * (zw1 + zw2g_ref[:, sl, :])
              * em_ref[:, sl][..., None])
        w0 = cz * dp[..., :f]
        w1 = cz * dp[..., f:2 * f]
        w2 = cz * dp[..., 2 * f:]
        vx, vy, vz = vx_ref[:, sl], vy_ref[:, sl], vz_ref[:, sl]
        tr3 = (vx * vx + vy * vy + vz * vz) / 3.0
        blocks = [
            jnp.sum(w0, axis=1),
            jnp.sum(w1 * vx[..., None], axis=1),
            jnp.sum(w1 * vy[..., None], axis=1),
            jnp.sum(w1 * vz[..., None], axis=1),
            jnp.sum(w2 * (vx * vx - tr3)[..., None], axis=1),
            jnp.sum(w2 * (vx * vy)[..., None], axis=1),
            jnp.sum(w2 * (vx * vz)[..., None], axis=1),
            jnp.sum(w2 * (vy * vy - tr3)[..., None], axis=1),
            jnp.sum(w2 * (vy * vz)[..., None], axis=1),
        ]
        part = jnp.concatenate(blocks, axis=-1)
        acc = part if acc is None else acc + part
    out_ref[:] = acc


def _forward(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball,
             interpret):
    n, k, r = edge_attr.shape
    f = zw1.shape[-1]
    use_pallas = (
        (jax.default_backend() == "tpu" or interpret)
        and n % TILE_N == 0
        and edge_attr.dtype == jnp.float32
    )
    if not use_pallas:
        return radial_embedding_jnp(edge_attr, C, vx, vy, vz, zw1, zw2g,
                                    emask_f, kall, ball)
    kern = functools.partial(_emb_kernel, k=k, r=r, f=f)
    nk = pl.BlockSpec((TILE_N, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, k, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            nk, nk, nk, nk,
            pl.BlockSpec((TILE_N, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, k, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            nk,
            vmem,
            pl.BlockSpec((1, 3 * f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 9 * f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 9 * f), jnp.float32),
        # Mosaic's default 16 MB scoped-VMEM stack is too small once K
        # exceeds one chunk (the unrolled chunk loop's temporaries stay
        # live across iterations); the grouped layout's K' ≈ 3K needs
        # ~32 MB at the 25k config.  v5e has 128 MB VMEM/core.
        compiler_params=(
            None if k <= _K_CHUNK else
            pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)),
        interpret=interpret,
    )(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f,
      kall, ball.reshape(1, 3 * f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_radial_embedding(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f,
                           kall, ball, interpret=False):
    """[N, 9F] radial embedding; see module docstring."""
    return _forward(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall,
                    ball, interpret)


def _fre_fwd(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball,
             interpret):
    return fused_radial_embedding(
        edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball, interpret
    ), (edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball)


def _emb_bwd_kernel(ea_ref, c_ref, vx_ref, vy_ref, vz_ref, zw1_ref,
                    zw2g_ref, em_ref, g_ref, kall_ref, ball_ref,
                    dea_ref, dc_ref, dvx_ref, dvy_ref, dvz_ref, dzw1_ref,
                    dzw2g_ref, dkall_ref, dball_ref, *, k, r, f):
    """Row-tiled backward of :func:`radial_embedding_jnp`, traced as the
    in-kernel ``jax.vjp`` of the identical jnp chain (correct by
    construction; the chain is recomputed in VMEM per tile instead of
    XLA materializing the [N, K, 3F] ``dp`` pipeline in HBM — that
    chunked recompute loop was 47 ms/step of the 25k MD profile).
    ``dkall``/``dball`` accumulate across the sequential row grid."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        dkall_ref[:] = jnp.zeros_like(dkall_ref)
        dball_ref[:] = jnp.zeros_like(dball_ref)

    dk_acc = None
    db_acc = None
    for s in range(0, k, _K_CHUNK):
        kc = min(_K_CHUNK, k - s)
        sl = slice(s, s + kc)
        kp = _kernel_prec()  # Mosaic rejects HIGH; map to HIGHEST
        kc_ = kc

        def chain(ea2, c, vx, vy, vz, zw1_, zw2g_, em_, kall_, ball_):
            # Same numerics as radial_embedding_jnp, but the rbf
            # projection runs on a 2-D [T·kc, R] operand: the vjp's
            # dkall/dea dots then contract a SINGLE dim (Mosaic's
            # tpu.matmul rejects the [n,k]-batched contraction the
            # 3-D einsum transpose produces).
            dp = jax.lax.dot_general(
                ea2, kall_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=kp) + ball_
            dp = dp.reshape(TILE_N, kc_, 3 * f)
            cz = c[..., None] * (zw1_[:, None, :] + zw2g_) * em_[..., None]
            w0 = cz * dp[..., :f]
            w1 = cz * dp[..., f:2 * f]
            w2 = cz * dp[..., 2 * f:]
            tr3 = (vx * vx + vy * vy + vz * vz) / 3.0
            blocks = [
                jnp.sum(w0, axis=1),
                jnp.sum(w1 * vx[..., None], axis=1),
                jnp.sum(w1 * vy[..., None], axis=1),
                jnp.sum(w1 * vz[..., None], axis=1),
                jnp.sum(w2 * (vx * vx - tr3)[..., None], axis=1),
                jnp.sum(w2 * (vx * vy)[..., None], axis=1),
                jnp.sum(w2 * (vx * vz)[..., None], axis=1),
                jnp.sum(w2 * (vy * vy - tr3)[..., None], axis=1),
                jnp.sum(w2 * (vy * vz)[..., None], axis=1),
            ]
            return jnp.concatenate(blocks, axis=-1)

        args = (ea_ref[:, sl, :].reshape(TILE_N * kc, r), c_ref[:, sl],
                vx_ref[:, sl], vy_ref[:, sl], vz_ref[:, sl],
                zw1_ref[:], zw2g_ref[:, sl, :], em_ref[:, sl],
                kall_ref[:], ball_ref[0])
        _, vjp = jax.vjp(chain, *args)
        (dea, dc, dvx, dvy, dvz, dzw1, dzw2g, _dem, dkall,
         dball) = vjp(g_ref[:])
        dea_ref[:, sl, :] = dea.reshape(TILE_N, kc, r)
        dc_ref[:, sl] = dc
        dvx_ref[:, sl] = dvx
        dvy_ref[:, sl] = dvy
        dvz_ref[:, sl] = dvz
        dzw2g_ref[:, sl, :] = dzw2g
        if s == 0:
            dzw1_ref[:] = dzw1
        else:
            dzw1_ref[:] += dzw1
        dk_acc = dkall if dk_acc is None else dk_acc + dkall
        db_acc = dball if db_acc is None else db_acc + dball
    dkall_ref[:] += dk_acc
    dball_ref[:] += db_acc.reshape(1, 3 * f)


def _bwd_pallas(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball,
                g, interpret):
    n, k, r = edge_attr.shape
    f = zw1.shape[-1]
    kern = functools.partial(_emb_bwd_kernel, k=k, r=r, f=f)
    nk = pl.BlockSpec((TILE_N, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    nkr = pl.BlockSpec((TILE_N, k, r), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    nkf = pl.BlockSpec((TILE_N, k, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    nf = pl.BlockSpec((TILE_N, f), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    acc_kall = pl.BlockSpec((r, 3 * f), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    acc_ball = pl.BlockSpec((1, 3 * f), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(n // TILE_N,),
        in_specs=[
            nkr, nk, nk, nk, nk, nf, nkf, nk,
            pl.BlockSpec((TILE_N, 9 * f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[nkr, nk, nk, nk, nk, nf, nkf, acc_kall, acc_ball],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, r), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, f), jnp.float32),
            jax.ShapeDtypeStruct((n, k, f), jnp.float32),
            jax.ShapeDtypeStruct((r, 3 * f), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, g,
      kall, ball.reshape(1, 3 * f))
    (dea, dc, dvx, dvy, dvz, dzw1t, dzw2g, dkall, dball) = outs
    # dzw1 per-tile rows hold the tile's K-sum; total = row value itself
    # (each row n appears in exactly one tile) — it IS the per-row grad.
    return (dea, dc, dvx, dvy, dvz, dzw1t, dzw2g,
            jnp.zeros_like(emask_f), dkall, dball.reshape(3 * f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _bwd_op(ea, C, vx, vy, vz, zw1, zw2g, em, kall, ball, g, interpret):
    """First-order embedding backward as a differentiable op: the value
    is the Pallas kernel; differentiating THROUGH it (force-loss
    training takes grad of forces) uses the jnp double-vjp below — a
    pallas_call cannot be traced inside another derivative."""
    return _bwd_pallas(ea, C, vx, vy, vz, zw1, zw2g, em, kall, ball, g,
                       interpret)


def _bwd_op_fwd(ea, C, vx, vy, vz, zw1, zw2g, em, kall, ball, g,
                interpret):
    return _bwd_op(ea, C, vx, vy, vz, zw1, zw2g, em, kall, ball, g,
                   interpret), (ea, C, vx, vy, vz, zw1, zw2g, em, kall,
                                ball, g)


def _bwd_op_bwd(interpret, res, cts):
    *args10, g = res

    def first_order(*a):
        _, vjp = jax.vjp(radial_embedding_jnp, *a[:10])
        return vjp(a[10])

    _, vjp2 = jax.vjp(first_order, *args10, g)
    return vjp2(tuple(cts))


_bwd_op.defvjp(_bwd_op_fwd, _bwd_op_bwd)


def _fre_bwd(interpret, res, g):
    edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, kall, ball = res
    n, k, r = edge_attr.shape
    from torchmdnet_tpu.ops.message_passing import _row_chunks

    f = zw1.shape[-1]
    use_pallas = (
        (jax.default_backend() == "tpu" or interpret)
        and n % TILE_N == 0
        and edge_attr.dtype == jnp.float32
        and g.dtype == jnp.float32
    )
    if use_pallas:
        return _bwd_op(edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f,
                       kall, ball, g, interpret)
    chunk = _row_chunks(n, k, 3 * f,
                        src_bytes=zw2g.size * zw2g.dtype.itemsize)
    row_args = (edge_attr, C, vx, vy, vz, zw1, zw2g, emask_f, g)

    def one(args):
        ea_c, c_c, vx_c, vy_c, vz_c, zw1_c, zw2g_c, em_c, g_c = args
        _, vjp = jax.vjp(
            radial_embedding_jnp,
            ea_c, c_c, vx_c, vy_c, vz_c, zw1_c, zw2g_c, em_c, kall, ball,
        )
        return vjp(g_c)

    if chunk >= n:
        return one(row_args)

    # first 8 grads are row-wise; dkall/dball reduce over rows and must be
    # summed across chunks (they would break _map_rows' row reshape).
    main = n - n % chunk
    st = jax.lax.map(
        one,
        tuple(a[:main].reshape((main // chunk, chunk) + a.shape[1:])
              for a in row_args),
    )
    rowg = [x.reshape((main,) + x.shape[2:]) for x in st[:8]]
    dkall, dball = st[8].sum(axis=0), st[9].sum(axis=0)
    if main != n:
        tail = one(tuple(a[main:] for a in row_args))
        rowg = [jnp.concatenate([a, b], axis=0)
                for a, b in zip(rowg, tail[:8])]
        dkall = dkall + tail[8]
        dball = dball + tail[9]
    return (*rowg, dkall, dball)


fused_radial_embedding.defvjp(_fre_fwd, _fre_bwd)
