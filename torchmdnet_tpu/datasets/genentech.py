"""Genentech torsion scans (reference ``torchmdnet/datasets/genentech.py``):
SDF of CCSD(T)/CBS torsion-scan conformations; ΔE (kcal/mol → eV) relative
to the scan minimum; molecules filtered by the ``MinMethod`` property."""

import os

import numpy as np

from torchmdnet_tpu.datasets._download import download_url, extract_zip
from torchmdnet_tpu.datasets.memdataset import MemmappedDataset
from torchmdnet_tpu.utils.periodic_table import ATOMIC_NUMBERS


class GenentechTorsions(MemmappedDataset):
    KCALMOL_TO_EV = 0.0433641153087705

    def __init__(self, root=None, transform=None, pre_transform=None,
                 pre_filter=None, paths=None, theory="CCSD_T_CBS_MP2",
                 energy_field="deltaE"):
        self.name = self.__class__.__name__
        self.paths = str(paths)
        self.theory = theory
        self.energy_field = energy_field
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y",))

    @property
    def raw_url(self):
        return (
            "https://github.com/Acellera/sellers/raw/main/ci6b00614_si_002.zip"
        )

    @property
    def raw_paths(self):
        return [
            os.path.join(
                self.raw_dir,
                "QM_MM_Gas_Phase_Torsion_Scan_Individual_Results_with_"
                "CCSD_T_CBS_baseline.sdf",
            )
        ]

    def download(self):
        archive = download_url(self.raw_url, self.raw_dir)
        extract_zip(archive, self.raw_dir)
        os.remove(archive)

    def process(self):
        if not os.path.exists(self.raw_paths[0]):
            self.download()
        super().process()

    def sample_iter(self, mol_ids=False):
        with open(self.raw_paths[0]) as f:
            molstart_count = 0
            discard = False
            deltaE = None
            mol_id = None
            num_atoms = None
            z, pos = [], []
            for line in f:
                stripped = line.strip()
                if discard and not stripped.startswith("$$$$"):
                    continue
                if 0 <= molstart_count < 4:
                    molstart_count += 1
                if molstart_count == 4:  # counts line of the SDF header
                    num_atoms = int(stripped.split()[0])
                    molstart_count = -1
                    continue
                if stripped.startswith("$$$$"):
                    if not discard and deltaE is not None:
                        data = dict(
                            z=np.asarray(z, np.int64),
                            pos=np.vstack(pos).astype(np.float32),
                            y=np.asarray(
                                deltaE * self.KCALMOL_TO_EV, np.float64
                            ).reshape(1, 1),
                        )
                        if mol_ids:
                            data["mol_id"] = mol_id
                        yield data
                    molstart_count = 0
                    discard = False
                    deltaE = None
                    mol_id = None
                    num_atoms = None
                    z, pos = [], []
                    continue
                if num_atoms is not None:
                    num_atoms -= 1
                    if num_atoms >= 0:
                        px, py, pz, el = stripped.split()[:4]
                        pos.append([float(px), float(py), float(pz)])
                        z.append(ATOMIC_NUMBERS[el])
                if stripped.startswith(">  <MinMethod>"):
                    if next(f).strip() != self.theory:
                        discard = True
                        continue
                if stripped.startswith(f">  <{self.energy_field}>"):
                    deltaE = float(next(f).strip())
                if stripped.startswith(">  <Number>"):
                    mol_id = int(next(f).strip())
