"""WaterBox dataset (reference ``torchmdnet/datasets/water.py``): 1593-frame
periodic liquid-water trajectory in extended-XYZ format (TotEnergy + Lattice
in the comment line; per-atom columns: symbol, xyz, forces, Z)."""

import os
import re

import numpy as np

from torchmdnet_tpu.datasets._download import download_url, extract_zip
from torchmdnet_tpu.datasets.memdataset import MemmappedDataset


def parse_extxyz(file_path):
    energies, forces, positions, zs, boxes = [], [], [], [], []
    with open(file_path) as fh:
        while True:
            line = fh.readline()
            if not line:
                break
            n = int(line.strip())
            props = fh.readline()
            e = re.search(r"TotEnergy=(-?\d+\.\d+)", props)
            lat = re.search(r'Lattice="([-?\d+.\d+\s]+)"', props)
            energies.append(float(e.group(1)) if e else np.nan)
            boxes.append(
                np.asarray([float(x) for x in lat.group(1).split()],
                           np.float32).reshape(3, 3)
                if lat else np.zeros((3, 3), np.float32)
            )
            pos = np.zeros((n, 3), np.float32)
            frc = np.zeros((n, 3), np.float32)
            z = np.zeros(n, np.int64)
            for j in range(n):
                parts = fh.readline().split()
                pos[j] = [float(x) for x in parts[1:4]]
                frc[j] = [float(x) for x in parts[4:7]]
                z[j] = int(parts[7])
            positions.append(pos)
            forces.append(frc)
            zs.append(z)
    return energies, forces, positions, zs, boxes


class WaterBox(MemmappedDataset):
    url = (
        "https://archive.materialscloud.org/record/file?record_id=71"
        "&filename=training-set.zip"
    )

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None):
        self.name = self.__class__.__name__
        super().__init__(root, transform, pre_transform, pre_filter,
                         properties=("y", "neg_dy"))
        # all frames share the box; keep it for convenience
        xyz = self._xyz_path()
        if os.path.exists(xyz):
            _, _, _, _, boxes = parse_extxyz(xyz)
            self.box = boxes[0]

    def _xyz_path(self):
        return os.path.join(self.raw_dir, "training-set", "dataset_1593.xyz")

    def download(self):
        archive = download_url(self.url, self.raw_dir, "training-set.zip")
        extract_zip(archive, self.raw_dir)

    def process(self):
        if not os.path.exists(self._xyz_path()):
            self.download()
        super().process()

    def sample_iter(self, mol_ids=False):
        energies, forces, positions, zs, _ = parse_extxyz(self._xyz_path())
        for i in range(len(energies)):
            yield dict(
                z=zs[i],
                pos=positions[i],
                y=np.asarray(energies[i]).reshape(1, 1),
                neg_dy=forces[i],
            )
