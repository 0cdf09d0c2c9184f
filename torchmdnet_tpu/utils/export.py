"""Ahead-of-time model export (the reference's TorchScript /
``torch.compile`` / ``torch.export`` deployment matrix, SURVEY §4, collapses
to one mechanism here: ``jax.export`` StableHLO serialization of the jitted
``(pos, box) → (E, F)`` step).

``export_potential`` serializes for fixed shapes; ``load_exported`` rebuilds
a callable from the artifact without the model code."""

def export_potential(potential, variables, z, batch, *, num_mols, box=None,
                     q=None, path=None):
    """Serialize the jitted energy+forces step to StableHLO bytes.

    Shapes (atom count, neighbor capacity) are frozen at export, matching
    the reference's static-shape torch.export contract
    (tests/test_export.py there).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    z = jnp.asarray(z)
    batch = jnp.asarray(batch)

    def step(pos):
        return potential.apply(
            variables, z, pos, batch, num_mols=num_mols, box=box, q=q,
        )

    pos_spec = jax.ShapeDtypeStruct((z.shape[0], 3), jnp.float32)
    exported = jex.export(jax.jit(step))(pos_spec)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported step; returns a callable ``pos -> (E, F)``."""
    from jax import export as jex

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    exported = jex.deserialize(blob)
    return lambda pos: exported.call(pos)
