"""QM9q — charged QM9 conformations (reference
``torchmdnet/datasets/qm9q.py``): HDF5 with per-conformation energies
(Hartree), gradients (Hartree/Bohr, negated), fractional electronic charges
and Debye dipoles; ionic reference energies subtracted via a greedy
charge-assignment (``compute_reference_energy``)."""

import os

import numpy as np

from torchmdnet_tpu.datasets.memdataset import MemmappedDataset

HARTREE_TO_EV = 27.211386246
BOHR_TO_ANGSTROM = 0.529177
DEBYE_TO_EANG = 0.2081943


class QM9q(MemmappedDataset):
    HARTREE_TO_EV = HARTREE_TO_EV
    BORH_TO_ANGSTROM = BOHR_TO_ANGSTROM
    DEBYE_TO_EANG = DEBYE_TO_EANG

    ELEMENT_ENERGIES = {
        1: {0: -0.5013312007, 1: 0.0000000000},
        6: {-1: -37.8236383010, 0: -37.8038423252, 1: -37.3826165878},
        7: {-1: -54.4626446440, 0: -54.5269367415, 1: -53.9895574739},
        8: {-1: -74.9699154500, 0: -74.9812632126, 1: -74.4776884006},
        9: {-1: -99.6695561536, 0: -99.6185158728},
    }

    INITIAL_CHARGES = {
        element: sorted(zip(charges.values(), charges.keys()))[0][1]
        for element, charges in ELEMENT_ENERGIES.items()
    }

    def __init__(self, root=None, transform=None, pre_transform=None,
                 pre_filter=None, paths=None):
        self.name = self.__class__.__name__
        self.paths = str(paths)
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y", "neg_dy", "q", "pq", "dp"))

    @property
    def raw_paths(self):
        if os.path.isfile(self.paths):
            return [self.paths]
        if os.path.isdir(self.paths):
            return [
                os.path.join(self.paths, f)
                for f in sorted(os.listdir(self.paths))
                if f.endswith(".h5")
            ]
        raise RuntimeError(f"Cannot load {self.paths}")

    @staticmethod
    def compute_reference_energy(atomic_numbers, charge):
        """Greedy minimal-energy ion assignment summing to the molecular
        charge (reference ``qm9q.py:69-100``)."""
        atomic_numbers = np.asarray(atomic_numbers)
        charge = int(charge)
        charges = [QM9q.INITIAL_CHARGES[int(z)] for z in atomic_numbers]
        energy = sum(
            QM9q.ELEMENT_ENERGIES[int(z)][q]
            for z, q in zip(atomic_numbers, charges)
        )
        while sum(charges) != charge:
            dq = int(np.sign(charge - sum(charges)))
            candidates = []
            for i, (z, q) in enumerate(zip(atomic_numbers, charges)):
                table = QM9q.ELEMENT_ENERGIES[int(z)]
                if (q + dq) in table:
                    candidates.append(
                        (energy - table[q] + table[q + dq], i, q + dq)
                    )
            energy, i, q = sorted(candidates)[0]
            charges[i] = q
        assert sum(charges) == charge
        energy = sum(
            QM9q.ELEMENT_ENERGIES[int(z)][q]
            for z, q in zip(atomic_numbers, charges)
        )
        return energy * QM9q.HARTREE_TO_EV

    def sample_iter(self, mol_ids=False):
        import h5py

        for path in self.raw_paths:
            with h5py.File(path, "r") as f:
                molecules = list(next(iter(f.values())).items())
                for mol_id, mol in molecules:
                    z = np.asarray(mol["atomic_numbers"], np.int64)
                    for conf in mol["energy"]:
                        assert mol["positions"].attrs["units"] == "Å : ångströms"
                        pos = np.asarray(mol["positions"][conf], np.float32)
                        assert mol["energy"].attrs["units"] == "E_h : hartree"
                        y = (
                            np.float64(mol["energy"][conf][()])
                            * self.HARTREE_TO_EV
                        )
                        assert (
                            mol["gradient_vector"].attrs["units"]
                            == "vector : Hartree/Bohr "
                        )
                        neg_dy = (
                            -np.asarray(mol["gradient_vector"][conf], np.float32)
                            * self.HARTREE_TO_EV
                            / self.BORH_TO_ANGSTROM
                        )
                        assert (
                            mol["electronic_charge"].attrs["units"]
                            == "n : fractional electrons"
                        )
                        pq = np.asarray(mol["electronic_charge"][conf],
                                        np.float32)
                        q = int(np.round(pq.sum()))
                        assert mol["dipole_moment"].attrs["units"] == "\\mu : Debye "
                        dp = (
                            np.asarray(mol["dipole_moment"][conf], np.float32)
                            * self.DEBYE_TO_EANG
                        )
                        y -= self.compute_reference_energy(z, q)
                        if np.linalg.norm(neg_dy, axis=1).max() > 100:  # eV/Å
                            continue
                        data = dict(z=z, pos=pos, y=np.asarray(y).reshape(1, 1),
                                    neg_dy=neg_dy, q=q, pq=pq, dp=dp)
                        if mol_ids:
                            data["mol_id"] = mol_id
                        if self.pre_filter is not None and not self.pre_filter(
                            data
                        ):
                            continue
                        if self.pre_transform is not None:
                            data = self.pre_transform(data)
                        yield data
