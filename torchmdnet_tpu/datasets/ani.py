"""ANI dataset family (reference ``torchmdnet/datasets/ani.py``).

Formats: ANI-1 per-file groups with byte-string ``species`` +
``coordinates``/``energies``; ANI-1x/1ccx single file keyed by molecule
with level-of-theory-specific energy/force datasets; ANI-2x grouped arrays
with integer ``species``.  Energies arrive in Hartree → eV; self-energies
(``_ELEMENT_ENERGIES``, Hartree) feed ``get_atomref``.
"""

import os

import numpy as np

from torchmdnet_tpu.datasets._download import download_url, extract_tar
from torchmdnet_tpu.datasets.memdataset import MemmappedDataset

HARTREE_TO_EV = 27.211386246


class ANIBase(MemmappedDataset):
    HARTREE_TO_EV = HARTREE_TO_EV
    _ELEMENT_ENERGIES = {}

    def get_atomref(self, max_z=100):
        refs = np.zeros((max_z, 1), np.float32)
        for key, val in self._ELEMENT_ENERGIES.items():
            refs[key, 0] = val * self.HARTREE_TO_EV
        return refs

    @property
    def raw_paths(self):
        names = self.raw_file_names
        if isinstance(names, str):
            names = [names]
        return [os.path.join(self.raw_dir, n) for n in names]

    def _ensure_raw(self):
        if not all(os.path.exists(p) for p in self.raw_paths):
            self.download()

    def process(self):
        self._ensure_raw()
        super().process()

    def _filtered(self, data):
        if self.pre_filter is not None and not self.pre_filter(data):
            return None
        if self.pre_transform is not None:
            data = self.pre_transform(data)
        return data


class ANI1(ANIBase):
    _ELEMENT_ENERGIES = {
        1: -0.500607632585,
        6: -37.8302333826,
        7: -54.5680045287,
        8: -75.0362229210,
    }

    def __init__(self, root, transform=None, pre_transform=None, pre_filter=None):
        self.name = self.__class__.__name__
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y",))

    @property
    def raw_url(self):
        return "https://ndownloader.figshare.com/files/9057631"

    @property
    def raw_file_names(self):
        return [
            os.path.join("ANI-1_release", f"ani_gdb_s{i:02d}.h5")
            for i in range(1, 9)
        ]

    def download(self):
        archive = download_url(self.raw_url, self.raw_dir)
        extract_tar(archive, self.raw_dir)
        os.remove(archive)

    def sample_iter(self, mol_ids=False):
        import h5py

        atomic_numbers = {b"H": 1, b"C": 6, b"N": 7, b"O": 8}
        for path in self.raw_paths:
            with h5py.File(path, "r") as f:
                molecules = list(next(iter(f.values())).items())
                for mol_id, mol in molecules:
                    z = np.asarray(
                        [atomic_numbers[a] for a in mol["species"]], np.int64
                    )
                    all_pos = np.asarray(mol["coordinates"][:], np.float32)
                    all_y = np.asarray(
                        mol["energies"][:], np.float64
                    ) * self.HARTREE_TO_EV
                    for pos, y in zip(all_pos, all_y):
                        data = dict(z=z, pos=pos, y=np.asarray(y).reshape(1, 1))
                        if mol_ids:
                            data["mol_id"] = mol_id
                        if (data := self._filtered(data)) is not None:
                            yield data


class _ANI1XBase(ANIBase):
    @property
    def raw_url(self):
        return "https://figshare.com/ndownloader/files/18112775"

    @property
    def raw_file_names(self):
        return "ani1x-release.h5"

    def download(self):
        download_url(self.raw_url, self.raw_dir, "ani1x-release.h5")


class ANI1X(_ANI1XBase):
    _ELEMENT_ENERGIES = {
        1: -0.600952980000,
        6: -38.08316124000,
        7: -54.70775770000,
        8: -75.19446356000,
    }

    def sample_iter(self, mol_ids=False):
        import h5py

        with h5py.File(self.raw_paths[0], "r") as h5:
            for mol_id, mol in h5.items():
                z = np.asarray(mol["atomic_numbers"][:], np.int64)
                all_pos = np.asarray(mol["coordinates"][:], np.float32)
                all_y = np.asarray(
                    mol["wb97x_dz.energy"][:], np.float64
                ) * self.HARTREE_TO_EV
                all_f = np.asarray(
                    mol["wb97x_dz.forces"][:], np.float32
                ) * self.HARTREE_TO_EV
                for pos, y, neg_dy in zip(all_pos, all_y, all_f):
                    if np.isnan(y) or np.isnan(neg_dy).any():
                        continue
                    data = dict(z=z, pos=pos, y=np.asarray(y).reshape(1, 1),
                                neg_dy=neg_dy)
                    if mol_ids:
                        data["mol_id"] = mol_id
                    if (data := self._filtered(data)) is not None:
                        yield data


class ANI1CCX(_ANI1XBase):
    _ELEMENT_ENERGIES = {
        1: -0.5991501324919538,
        6: -38.03750806057356,
        7: -54.67448347695333,
        8: -75.16043537275567,
    }

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        self.name = self.__class__.__name__
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y",))

    def sample_iter(self, mol_ids=False):
        import h5py

        with h5py.File(self.raw_paths[0], "r") as h5:
            for mol_id, mol in h5.items():
                z = np.asarray(mol["atomic_numbers"][:], np.int64)
                all_pos = np.asarray(mol["coordinates"][:], np.float32)
                all_y = np.asarray(
                    mol["ccsd(t)_cbs.energy"][:], np.float64
                ) * self.HARTREE_TO_EV
                for pos, y in zip(all_pos, all_y):
                    if np.isnan(y):
                        continue
                    data = dict(z=z, pos=pos, y=np.asarray(y).reshape(1, 1))
                    if mol_ids:
                        data["mol_id"] = mol_id
                    if (data := self._filtered(data)) is not None:
                        yield data


class ANI2X(ANIBase):
    # sae_linfit.dat self energies (ASE_ANI ani-2x_8x)
    _ELEMENT_ENERGIES = {
        1: -0.5978583943827134,
        6: -38.08933878049795,
        7: -54.711968298621066,
        8: -75.19106774742086,
        9: -99.80348506781634,
        16: -398.1577125334925,
        17: -460.1681939421027,
    }

    @property
    def raw_url(self):
        return (
            "https://zenodo.org/records/10108942/files/ANI-2x-wB97X-631Gd.tar.gz"
        )

    @property
    def raw_file_names(self):
        return [os.path.join("final_h5", "ANI-2x-wB97X-631Gd.h5")]

    def download(self):
        archive = download_url(self.raw_url, self.raw_dir)
        extract_tar(archive, self.raw_dir)
        os.remove(archive)

    def sample_iter(self, mol_ids=False):
        import h5py

        with h5py.File(self.raw_paths[0], "r") as h5:
            for key, grp in h5.items():
                all_z = np.asarray(grp["species"][:], np.int64)
                all_pos = np.asarray(grp["coordinates"][:], np.float32)
                all_y = np.asarray(
                    grp["energies"][:], np.float64
                ) * self.HARTREE_TO_EV
                all_f = np.asarray(
                    grp["forces"][:], np.float32
                ) * self.HARTREE_TO_EV
                for i, (pos, y, z, neg_dy) in enumerate(
                    zip(all_pos, all_y, all_z, all_f)
                ):
                    data = dict(z=z, pos=pos, y=np.asarray(y).reshape(1, 1),
                                neg_dy=neg_dy)
                    if mol_ids:
                        data["mol_id"] = f"{key}_{i}"
                    if (data := self._filtered(data)) is not None:
                        yield data
