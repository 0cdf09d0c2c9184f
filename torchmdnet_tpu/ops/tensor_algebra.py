"""Cartesian rank-2 tensor algebra for TensorNet-family models.

The reference implements these ops twice: a pure-torch full-3×3 path
(``torchmdnet/models/tensornet.py:18-146``) and hand-written Warp kernels on
compact irreps with fwd/bwd/bwd_bwd (``extensions/warp_ops/*``).  Here there
is one path: **compact irreducible components** as the canonical
representation —

* ``I``: scalar part, ``[N, F]`` (the tensor is ``I·𝟙``),
* ``A``: antisymmetric part stored as its axial vector, ``[N, 3, F]``,
* ``S``: symmetric-traceless part stored as 5 unique entries, ``[N, 5, F]``
  in order ``(xx, xy, xz, yy, yz)`` with ``zz = -(xx + yy)``,
  ``S[1,0]=S[0,1]`` etc.

Everything is expressed as jnp einsums/elementwise ops — small dense work
that XLA fuses onto the VPU/MXU; no custom VJPs are needed because
``jax.grad`` differentiates twice for free (the reference's double-backward
Warp kernels exist only because torch autograd can't).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Irreps(NamedTuple):
    """Compact irrep triple of a rank-2 Cartesian tensor field."""

    I: jnp.ndarray  # [N, F]
    A: jnp.ndarray  # [N, 3, F]  (axial vector of the antisymmetric part)
    S: jnp.ndarray  # [N, 5, F]  (xx, xy, xz, yy, yz of the sym-traceless part)


def vector_to_skewtensor(vec: jnp.ndarray) -> jnp.ndarray:
    """Axial vector [..., 3, F] → skew-symmetric tensor [..., 3, 3, F].

    Reference: ``tensornet.py:84-103``.
    """
    zero = jnp.zeros_like(vec[..., 0, :])
    vx, vy, vz = vec[..., 0, :], vec[..., 1, :], vec[..., 2, :]
    rows = jnp.stack(
        [zero, -vz, vy, vz, zero, -vx, -vy, vx, zero], axis=-2
    )
    return rows.reshape(vec.shape[:-2] + (3, 3) + vec.shape[-1:])


def skewtensor_to_vector(t: jnp.ndarray) -> jnp.ndarray:
    """Skew tensor [..., 3, 3, F] → axial vector [..., 3, F]
    (reference ``tensornet.py:106-122``)."""
    return 0.5 * jnp.stack(
        [
            t[..., 2, 1, :] - t[..., 1, 2, :],
            t[..., 0, 2, :] - t[..., 2, 0, :],
            t[..., 1, 0, :] - t[..., 0, 1, :],
        ],
        axis=-2,
    )


def compose_tensor(irr: Irreps) -> jnp.ndarray:
    """Compact irreps → full tensor [..., 3, 3, F]
    (reference ``tensornet.py:30-39`` / ``warp_ops/compose_tensor.py``)."""
    I, A, S = irr
    eye = jnp.eye(3, dtype=I.dtype)
    full = I[..., None, None, :] * eye[..., None]
    full = full + vector_to_skewtensor(A)
    sxx, sxy, sxz, syy, syz = (S[..., c, :] for c in range(5))
    szz = -(sxx + syy)
    srows = jnp.stack(
        [sxx, sxy, sxz, sxy, syy, syz, sxz, syz, szz], axis=-2
    ).reshape(S.shape[:-2] + (3, 3) + S.shape[-1:])
    return full + srows


def decompose_tensor(t: jnp.ndarray) -> Irreps:
    """Full tensor [..., 3, 3, F] → compact irreps
    (reference ``tensornet.py:18-27`` / ``warp_ops/decompose_tensor.py``)."""
    I = (t[..., 0, 0, :] + t[..., 1, 1, :] + t[..., 2, 2, :]) / 3.0
    A = skewtensor_to_vector(t)
    sym = lambda a, b: 0.5 * (t[..., a, b, :] + t[..., b, a, :])
    S = jnp.stack(
        [
            t[..., 0, 0, :] - I,
            sym(0, 1),
            sym(0, 2),
            t[..., 1, 1, :] - I,
            sym(1, 2),
        ],
        axis=-2,
    )
    return Irreps(I, A, S)


def irreps_norm2(irr: Irreps):
    """Squared Frobenius norms of the three parts (each [..., F]).

    ‖I·𝟙‖² = 3I²;  ‖A_skew‖² = 2|a|²;  ‖S‖² = 2(xx²+xy²+xz²+yy²+yz²+xx·yy)
    (off-diagonals appear twice; zz = -(xx+yy)).
    Reference: ``warp_kernels/tensor_norm3.py:48-81``.
    """
    I, A, S = irr
    nI = 3.0 * I * I
    nA = 2.0 * jnp.sum(A * A, axis=-2)
    sxx, sxy, sxz, syy, syz = (S[..., c, :] for c in range(5))
    nS = (
        sxx * sxx
        + syy * syy
        + (sxx + syy) ** 2
        + 2.0 * (sxy * sxy + sxz * sxz + syz * syz)
    )
    return nI, nA, nS


def irreps_norm3(irr: Irreps) -> jnp.ndarray:
    """Concatenated per-part squared norms [..., 3F] — the TensorNet readout
    feature (reference ``fn_tensor_norm3``, ``warp_ops/tensor_norm3.py:208``)."""
    nI, nA, nS = irreps_norm2(irr)
    return jnp.concatenate([nI, nA, nS], axis=-1)


def tensor_frobenius_norm2(irr: Irreps) -> jnp.ndarray:
    """‖X‖² of the composed tensor, per (node, channel): [..., F]
    (reference ``tensor_norm``, ``tensornet.py:144-146``)."""
    nI, nA, nS = irreps_norm2(irr)
    return nI + nA + nS


def _matmul_3x3_unrolled(y: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Per-(node, channel) 3×3 matmul as unrolled elementwise ops.

    An einsum over the length-3 axes would lower to batched 3×3
    dot_generals — catastrophic MXU tile padding on TPU.  Unrolled, the
    27 multiply-adds over [..., F] slices are pure VPU work that XLA fuses
    (measured ~20 ms/layer → sub-ms at N=2560, F=128)."""
    rows = []
    for a in range(3):
        cols = []
        for c in range(3):
            cols.append(
                y[..., a, 0, :] * m[..., 0, c, :]
                + y[..., a, 1, :] * m[..., 1, c, :]
                + y[..., a, 2, :] * m[..., 2, c, :]
            )
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def tensor_matmul_o3(y: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """O(3)-equivariant product ``Y·M + M·Y`` on full tensors [..., 3, 3, F]
    (reference ``tensornet.py:42-45`` / ``warp_ops/equivariant_o3_matmul.py``)."""
    return _matmul_3x3_unrolled(y, m) + _matmul_3x3_unrolled(m, y)


def tensor_matmul_so3(y: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """SO(3)-equivariant product ``Y·M`` on full tensors [..., 3, 3, F]
    (reference ``tensornet.py:48-51``)."""
    return _matmul_3x3_unrolled(y, m)
