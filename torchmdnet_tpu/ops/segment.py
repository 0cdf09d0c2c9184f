"""Segment reductions (the TPU-native replacement for torch-scatter).

Reference parity: ``torchmdnet/models/utils.py:658-701`` (``scatter``).
On TPU these lower to deterministic XLA scatter-adds / sorted segment ops;
``num_segments`` is always static (padded molecule count), which is the
static-shape analogue of the reference's ``dim_size`` caching dance
(``output_modules.py:43-73``).
"""

import jax
import jax.numpy as jnp


def segment_sum(x, segment_ids, num_segments: int):
    """Sum ``x[i]`` into ``out[segment_ids[i]]``; trailing dims preserved."""
    return jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)


def segment_mean(x, segment_ids, num_segments: int, include_zero: bool = True):
    """Segment mean.

    ``include_zero=True`` reproduces the reference's ``scatter(...,
    reduce='mean')`` exactly: it is built on ``torch.scatter_reduce`` with
    the default ``include_self=True`` over a zeros output, so the zero
    initial value participates and the denominator is ``count + 1``
    (``models/utils.py:699-701``).  Checkpoints trained with
    ``reduce_op='mean'`` or GN ``aggr='mean'`` depend on this quirk.
    """
    total = segment_sum(x, segment_ids, num_segments)
    ones = jnp.ones(x.shape[:1], dtype=x.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    if include_zero:
        count = count + 1.0
    return total / jnp.maximum(count, 1.0).reshape((-1,) + (1,) * (x.ndim - 1))
