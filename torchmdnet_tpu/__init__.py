"""torchmdnet_tpu — a TPU-native neural-network-potential framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of TorchMD-Net
(reference: /root/reference): it trains and serves models mapping
``(atomic numbers z, positions pos, batch, box, charge q, spin s)`` to
``(per-molecule energy y, per-atom forces -dy/dpos)``.

Design stance (TPU-first, not a port):

* **Static shapes everywhere** — fixed-capacity padded neighbor matrices,
  ghost-atom masking and padded molecule segments are the one true code
  path (the reference bolts this on for CUDA graphs).
* **Dense per-atom neighbor matrix [N, K]** instead of an atomically
  appended flat pair list: deterministic, gather/reduce friendly, maps to
  the MXU/VPU instead of GPU atomics.
* **Forces via ``jax.grad``** of a pure energy function — the reference's
  hand-written double-backward kernels are unnecessary under functional AD.
* **Parallelism via ``jax.sharding`` + ``shard_map``** over a device Mesh;
  gradient ``psum`` over ICI replaces DDP/NCCL.
"""

__version__ = "0.1.0"

from torchmdnet_tpu.models.model import create_model, load_model  # noqa: F401
