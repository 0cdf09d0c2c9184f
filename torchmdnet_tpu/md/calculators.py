"""Inference adapters (reference ``torchmdnet/calculators.py``).

* :class:`External` — TorchMD-style batched-replica calculator.  The
  reference's CUDA-graph capture/replay (``calculators.py:117-169``)
  becomes a single jitted ``(pos, box) → (E, F)`` function (compiled once,
  shapes static) — the TPU-native equivalent of graph replay.
* :class:`TMDNETCalculator` — ASE Calculator adapter (ase import gated);
  charge via ``atoms.info['charge']``, PBC from ``atoms.cell``.

Unit-transform registry mirrors ``calculators.py:10-23``.
"""

from functools import partial
import numpy as np

transforms = {
    "eV/A -> kcal/mol/A": lambda energy, forces: (
        energy * 23.0609,
        forces * 23.0609,
    ),
    "Hartree/Bohr -> kcal/mol/A": lambda energy, forces: (
        energy * 627.509,
        forces * 627.509 / 0.529177,
    ),
    "Hartree/A -> kcal/mol/A": lambda energy, forces: (
        energy * 627.509,
        forces * 627.509,
    ),
}


def _load(netfile, **kwargs):
    from torchmdnet_tpu.models.model import load_model

    if isinstance(netfile, str):
        return load_model(netfile, derivative=True, **kwargs)
    potential, variables = netfile
    return potential, variables


class External:
    """TorchMD adapter: ``calculate(pos, box) -> (E [B], F [B, n, 3])``.

    ``embeddings`` is [B, n] atom types for B identical replicas; positions
    arrive as [B*n, 3] or [B, n, 3].
    """

    def __init__(self, netfile, embeddings, device=None,
                 output_transform=None, use_cuda_graph=False,
                 cuda_graph_warmup_steps=12, dtype=None, **kwargs):
        import jax
        import jax.numpy as jnp

        self.potential, self.variables = _load(netfile, **kwargs)
        emb = np.asarray(embeddings)
        if emb.ndim == 1:
            emb = emb[None]
        self.n_replicas, self.n_atoms = emb.shape
        self.z = jnp.asarray(emb.reshape(-1).astype(np.int32))
        self.batch = jnp.asarray(
            np.repeat(np.arange(self.n_replicas), self.n_atoms).astype(
                np.int32
            )
        )
        if output_transform is None:
            self.output_transformer = lambda e, f: (e, f)
        elif callable(output_transform):
            self.output_transformer = output_transform
        else:
            self.output_transformer = transforms[output_transform]

        pot, variables, batch, B = (
            self.potential, self.variables, self.batch, self.n_replicas
        )

        @jax.jit
        def _step(pos, box):
            y, neg_dy = pot.apply(
                variables, self.z, pos, batch, num_mols=B, box=box,
            )
            return y, neg_dy

        @jax.jit
        def _step_nobox(pos):
            y, neg_dy = pot.apply(
                variables, self.z, pos, batch, num_mols=B,
            )
            return y, neg_dy

        self._step = _step
        self._step_nobox = _step_nobox

    def calculate(self, pos, box=None):
        import jax.numpy as jnp

        pos = jnp.asarray(np.asarray(pos, np.float32).reshape(-1, 3))
        if box is not None and np.asarray(box).any():
            y, neg_dy = self._step(pos, jnp.asarray(np.asarray(box,
                                                               np.float32)))
        else:
            y, neg_dy = self._step_nobox(pos)
        energy = np.asarray(y).reshape(self.n_replicas)
        forces = np.asarray(neg_dy).reshape(self.n_replicas, self.n_atoms, 3)
        return self.output_transformer(energy, forces)


class TMDNETCalculator:
    """ASE Calculator adapter (reference ``calculators.py:183-320``).

    Energies in eV, forces in eV/Å.  Charge is read from
    ``atoms.info['charge']`` (0 if absent); PBC from ``atoms.cell``.  The
    jitted step is cached per atom count (the static-shapes analogue of the
    reference's torch.compile warm-up).
    """

    implemented_properties = ["energy", "forces"]

    def __init__(self, model_file, device=None, dtype=None, compile=False,
                 **kwargs):
        try:
            from ase.calculators.calculator import Calculator, all_changes
            self._ase_base = Calculator
            self._all_changes = all_changes
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "ase is required for TMDNETCalculator"
            ) from exc
        self.results = {}
        self.atoms = None
        self.remove_ref_energy = kwargs.pop("remove_ref_energy", True)
        self.max_num_neighbors = kwargs.pop("max_num_neighbors", 64)
        self.potential, self.variables = _load(
            model_file,
            remove_ref_energy=self.remove_ref_energy,
            max_num_neighbors=self.max_num_neighbors,
            **kwargs,
        )
        self._compiled = {}
        self.evals = 0

    def _get_step(self, n):
        import jax

        if n not in self._compiled:
            pot, variables = self.potential, self.variables

            @partial(jax.jit, static_argnames=("use_box",))
            def step(z, pos, q, box, use_box):
                import jax.numpy as jnp

                batch = jnp.zeros((z.shape[0],), jnp.int32)
                return pot.apply(
                    variables, z, pos, batch, num_mols=1,
                    box=box if use_box else None, q=q,
                )

            self._compiled[n] = step
        return self._compiled[n]

    def get_potential_energy(self, atoms, **kw):
        self.calculate(atoms)
        return self.results["energy"]

    def get_forces(self, atoms, **kw):
        self.calculate(atoms)
        return self.results["forces"]

    def calculate(self, atoms=None, properties=None, system_changes=None):
        import jax.numpy as jnp

        numbers = np.asarray(atoms.numbers, np.int32)
        positions = np.asarray(atoms.positions, np.float32)
        charge = float(atoms.info.get("charge", 0.0))
        use_box = bool(np.asarray(atoms.pbc).any())
        box = (
            np.asarray(atoms.cell.array, np.float32)
            if use_box
            else np.zeros((3, 3), np.float32)
        )
        step = self._get_step(len(numbers))
        y, neg_dy = step(
            jnp.asarray(numbers),
            jnp.asarray(positions),
            jnp.asarray([charge], jnp.float32),
            jnp.asarray(box),
            use_box,
        )
        self.evals += 1
        self.atoms = atoms
        self.results = {
            "energy": float(np.asarray(y).reshape(())),
            "forces": np.asarray(neg_dy),
        }
