"""OpenMM integration example (reference examples/openmm-integration.py).

The reference TorchScripts an nn.Module (nm → Å in, eV → kJ/mol out) and
hands it to ``openmmtorch.TorchForce``.  The JAX-native equivalent wraps
the jitted potential in a callable with the same unit contract; OpenMM can
consume it through ``openmm-ml``-style Python forces, or the potential can
be exported as StableHLO (``torchmdnet_tpu.utils.export``) for embedding.

Run:  python examples/openmm_integration.py <checkpoint.ckpt> <pdbfile>
"""

import sys

import numpy as np

NM_TO_ANGSTROM = 10.0
EV_TO_KJ_PER_MOL = 96.4853075


class OpenMMForce:
    """Callable force provider with OpenMM units (nm in, kJ/mol out)."""

    def __init__(self, checkpoint, z, max_num_neighbors=64):
        import jax
        import jax.numpy as jnp

        from torchmdnet_tpu.models.model import load_model

        self.potential, self.variables = load_model(
            checkpoint, derivative=True,
            max_num_neighbors=max_num_neighbors,
        )
        self.z = jnp.asarray(np.asarray(z, np.int32))
        batch = jnp.zeros((len(z),), jnp.int32)
        pot, variables = self.potential, self.variables

        @jax.jit
        def step(pos_angstrom):
            return pot.apply(
                variables, self.z, pos_angstrom, batch, num_mols=1
            )

        self._step = step

    def __call__(self, positions_nm):
        import jax.numpy as jnp

        pos = jnp.asarray(
            np.asarray(positions_nm, np.float32) * NM_TO_ANGSTROM
        )
        y, neg_dy = self._step(pos)
        energy_kj = float(np.asarray(y).reshape(())) * EV_TO_KJ_PER_MOL
        # dE/d(nm) = dE/dÅ × Å/nm
        forces_kj_nm = (
            np.asarray(neg_dy) * EV_TO_KJ_PER_MOL * NM_TO_ANGSTROM
        )
        return energy_kj, forces_kj_nm


def main():
    checkpoint, pdbfile = sys.argv[1], sys.argv[2]
    try:
        from openmm.app import PDBFile
    except ImportError:
        raise SystemExit("openmm is required for this example")
    pdb = PDBFile(pdbfile)
    z = [atom.element.atomic_number for atom in pdb.topology.atoms()]
    force = OpenMMForce(checkpoint, z)
    pos_nm = np.asarray(
        [[v.x, v.y, v.z] for v in pdb.positions]
    )
    energy, forces = force(pos_nm)
    print(f"energy: {energy:.6f} kJ/mol; |F|max: "
          f"{np.abs(forces).max():.6f} kJ/mol/nm")


if __name__ == "__main__":
    main()
