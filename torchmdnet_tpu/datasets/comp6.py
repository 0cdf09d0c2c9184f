"""COMP6 benchmark suites v1/v2 (reference ``torchmdnet/datasets/comp6.py``).

v1 HDF5 groups carry byte-string ``species`` + ``coordinates``/``energies``/
``forces`` (Hartree → eV; the stored "forces" are actually gradients and
are negated); v2 uses ANI-2x-style integer-species grouped arrays.
"""

import os

import numpy as np

from torchmdnet_tpu.datasets._download import download_url, extract_tar
from torchmdnet_tpu.datasets.ani import ANIBase
from torchmdnet_tpu.datasets.memdataset import Dataset, MemmappedDataset

HARTREE_TO_EV = 27.211386246


class COMP6Base(MemmappedDataset):
    _ELEMENT_ENERGIES = {  # ANI-1x self energies
        1: -0.500607632585,
        6: -37.8302333826,
        7: -54.5680045287,
        8: -75.0362229210,
    }
    ATOMIC_NUMBERS = {b"H": 1, b"C": 6, b"N": 7, b"O": 8}
    HARTREE_TO_EV = HARTREE_TO_EV

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        self.name = self.__class__.__name__
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y", "neg_dy"))

    @property
    def raw_url_name(self):
        return self.__class__.__name__

    @property
    def raw_url(self):
        prefix = "https://raw.githubusercontent.com/isayev/COMP6/master/COMP6v1"
        return [f"{prefix}/{self.raw_url_name}/{n}" for n in self.raw_file_names]

    @property
    def raw_paths(self):
        return [os.path.join(self.raw_dir, n) for n in self.raw_file_names]

    def get_atomref(self, max_z=100):
        refs = np.zeros((max_z, 1), np.float32)
        for key, val in self._ELEMENT_ENERGIES.items():
            refs[key, 0] = val * self.HARTREE_TO_EV
        return refs

    def download(self):
        for url in self.raw_url:
            download_url(url, self.raw_dir)

    def process(self):
        if not all(os.path.exists(p) for p in self.raw_paths):
            self.download()
        super().process()

    def sample_iter(self, mol_ids=False):
        import h5py

        for path in self.raw_paths:
            with h5py.File(path, "r") as f:
                molecules = list(next(iter(f.values())).items())
                for mol_id, mol in molecules:
                    z = np.asarray(
                        [self.ATOMIC_NUMBERS[a] for a in mol["species"]],
                        np.int64,
                    )
                    all_pos = np.asarray(mol["coordinates"][:], np.float32)
                    all_y = np.asarray(
                        mol["energies"][:], np.float64
                    ) * self.HARTREE_TO_EV
                    # COMP6 accidentally stores gradients as "forces" → negate
                    all_neg_dy = -np.asarray(
                        mol["forces"][:], np.float32
                    ) * self.HARTREE_TO_EV
                    for pos, y, neg_dy in zip(all_pos, all_y, all_neg_dy):
                        data = dict(z=z, pos=pos,
                                    y=np.asarray(y).reshape(1, 1),
                                    neg_dy=neg_dy)
                        if mol_ids:
                            data["mol_id"] = (
                                f"{os.path.basename(path)}_{mol_id}"
                            )
                        if self.pre_filter is not None and not self.pre_filter(
                            data
                        ):
                            continue
                        if self.pre_transform is not None:
                            data = self.pre_transform(data)
                        yield data


class ANIMD(COMP6Base):
    @property
    def raw_url_name(self):
        return "ANI-MD"

    @property
    def raw_file_names(self):
        return ["ani_md_bench.h5"]


class DrugBank(COMP6Base):
    @property
    def raw_file_names(self):
        return ["drugbank_testset.h5"]


class GDB07to09(COMP6Base):
    @property
    def raw_file_names(self):
        return ["gdb11_07_test500.h5", "gdb11_08_test500.h5",
                "gdb11_09_test500.h5"]


class GDB10to13(COMP6Base):
    @property
    def raw_file_names(self):
        return ["gdb11_10_test500.h5", "gdb11_11_test500.h5",
                "gdb13_12_test1000.h5", "gdb13_13_test1000.h5"]


class Tripeptides(COMP6Base):
    @property
    def raw_file_names(self):
        return ["tripeptide_full.h5"]


class S66X8(COMP6Base):
    @property
    def raw_url_name(self):
        return "s66x8"

    @property
    def raw_file_names(self):
        return ["s66x8_wb97x6-31gd.h5"]


class COMP6v1(Dataset):
    """Superset of all COMP6 v1 subsets."""

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        self.transform = transform
        self.subsets = [
            DS(root, None, pre_transform, pre_filter)
            for DS in (ANIMD, DrugBank, GDB07to09, GDB10to13, Tripeptides,
                       S66X8)
        ]
        self.subset_indices = np.array(
            [
                [i_subset, i_sample]
                for i_subset, subset in enumerate(self.subsets)
                for i_sample in range(len(subset))
            ]
        )

    def __len__(self):
        return len(self.subset_indices)

    def get(self, idx):
        i_subset, i_sample = self.subset_indices[idx]
        return self.subsets[i_subset][i_sample]

    def get_atomref(self, max_z=100):
        return self.subsets[0].get_atomref(max_z)


class COMP6v2(ANIBase):
    """COMP6 v2 at wB97X/631Gd (ANI-2x elements H C N O F S Cl)."""

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
            "https://zenodo.org/records/10126157/files/COMP6v2_wB97X-631Gd.tar.gz"
        )

    @property
    def raw_file_names(self):
        return [os.path.join("comp6v2_final_h5", "COMP6v2_wB97X-631Gd.h5")]

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
