"""Data-parallel training over a device Mesh.

The reference's only parallelism is DDP over NCCL (SURVEY §2.5,
``scripts/train.py:252-258``).  The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over the ``data`` axis; each device holds a full
replica of the params and its own packed molecule batch (leading axis =
device axis).  ``shard_map`` runs the per-device loss and ``pmean``s
gradients over ICI — the psum replaces the NCCL all-reduce.

Multi-host: call ``jax.distributed.initialize()`` first; each host feeds
its local slice of the leading axis and the same code runs unchanged
(GSPMD addresses all devices globally).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchmdnet_tpu.train.step import TrainState, make_train_step


def make_mesh(n_devices: int = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray], axis_name="data"):
    """Place a [D, ...] leading-device-axis batch onto the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.device_put(v, sharding) if v is not None else None
        for k, v in batch.items()
    }


def make_data_parallel_train_step(potential, mesh: Mesh, *, num_mols: int,
                                  axis_name: str = "data", **step_kwargs):
    """Build a jitted SPMD train step over ``mesh``.

    Batch arrays carry a leading device axis of size ``mesh.size``:
    z [D, N], pos [D, N, 3], batch [D, N], y [D, B, 1], neg_dy [D, N, 3],
    mol_mask [D, B].  Params/opt state are replicated; gradients are
    ``pmean``-ed over the axis inside the step.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    local_step = make_train_step(
        potential, num_mols=num_mols, axis_name=axis_name, **step_kwargs
    )

    def per_device(state: TrainState, batch):
        # shard_map hands us the local [1, ...] block; drop the device axis.
        local = {
            k: (v[0] if v is not None and hasattr(v, "ndim") and v.ndim > 0
                else v)
            for k, v in batch.items()
        }
        new_state, metrics = local_step(state, local)
        return new_state, metrics

    batch_specs = P(axis_name)
    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)
