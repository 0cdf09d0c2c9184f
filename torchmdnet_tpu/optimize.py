"""Inference-optimization entry point (reference ``torchmdnet/optimize.py``).

The reference swaps TorchMD_GN's CFConv for hand-written NNPOps CUDA
kernels (``optimize.py:11-93``, GN-only, many feature guards).  On TPU the
equivalent role — fusing the message-passing inner loop — is played by XLA
fusion plus the scatter-free gather ops (``ops/message_passing.py``), so
``optimize`` returns a jit-compiled fixed-shape step rather than swapping
modules.  The same feature guards apply conceptually: the step is
specialized to one (atom count, neighbor capacity) signature.
"""

def optimize(potential, variables, z, batch, *, num_mols, box=None, q=None):
    """Return a jitted ``pos -> (E, F)`` step specialized to this system."""
    import jax
    import jax.numpy as jnp

    z = jnp.asarray(z)
    batch = jnp.asarray(batch)

    @jax.jit
    def step(pos):
        return potential.apply(
            variables, z, pos, batch, num_mols=num_mols, box=box, q=q,
        )

    return step
