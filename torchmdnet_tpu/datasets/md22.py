"""MD22 large-molecule trajectories (reference
``torchmdnet/datasets/md22.py``; npz keys z/R/E/F)."""

import os
import os.path as osp

import numpy as np

from torchmdnet_tpu.datasets._download import download_url
from torchmdnet_tpu.datasets.memdataset import MemmappedDataset


class MD22(MemmappedDataset):
    gdml_url = "http://quantum-machine.org/gdml/data/npz"

    file_names = {
        "AT-AT-CG-CG": "md22_AT-AT-CG-CG.npz",
        "AT-AT": "md22_AT-AT.npz",
        "Ac-Ala3-NHMe": "md22_Ac-Ala3-NHMe.npz",
        "DHA": "md22_DHA.npz",
        "buckyball-catcher": "md22_buckyball-catcher.npz",
        "dw-nanotube": "md22_dw_nanotube.npz",
        "stachyose": "md22_stachyose.npz",
    }

    def __init__(self, root, molecules, transform=None, pre_transform=None,
                 pre_filter=None):
        if molecules not in self.file_names:
            raise ValueError(f"Unknown dataset name '{molecules}'")
        self.molecule = molecules
        self.name = f"MD22-{molecules}"
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y", "neg_dy"))

    @property
    def raw_dir(self):
        return osp.join(self.root, self.molecule, "raw")

    @property
    def raw_paths(self):
        return [osp.join(self.raw_dir, self.file_names[self.molecule])]

    def download(self):
        download_url(
            f"{self.gdml_url}/{self.file_names[self.molecule]}", self.raw_dir
        )

    def process(self):
        if not all(os.path.exists(p) for p in self.raw_paths):
            self.download()
        super().process()

    def sample_iter(self, mol_ids=False):
        raw = np.load(self.raw_paths[0])
        z = np.asarray(raw["z"], np.int64)
        pos = np.asarray(raw["R"], np.float32)
        energy = np.asarray(raw["E"], np.float64).reshape(-1)
        force = np.asarray(raw["F"], np.float32)
        for i in range(pos.shape[0]):
            data = dict(z=z, pos=pos[i], y=np.asarray(energy[i]).reshape(1, 1),
                        neg_dy=force[i])
            if self.pre_filter is not None and not self.pre_filter(data):
                continue
            if self.pre_transform is not None:
                data = self.pre_transform(data)
            yield data
