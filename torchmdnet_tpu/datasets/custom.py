"""Custom glob-based npy dataset (reference ``torchmdnet/datasets/custom.py``).

Per-file contract: coords [frames, n, 3]; embed (types) [n] shared across
frames; optional energy [frames(,1)] and forces [frames, n, 3].  Small
datasets preload into RAM, large ones use np.load memmaps.
"""

import glob as globmod

import numpy as np

from torchmdnet_tpu.datasets.memdataset import Dataset


class Custom(Dataset):
    def __init__(self, coordglob, embedglob, energyglob=None, forceglob=None,
                 preload_memory_limit=1024, transform=None, **kwargs):
        self.transform = transform
        assert energyglob is not None or forceglob is not None, (
            "Either energies, forces or both must be specified as the target"
        )
        self.has_energies = energyglob is not None
        self.has_forces = forceglob is not None
        self.files = {
            "pos": sorted(globmod.glob(coordglob)),
            "z": sorted(globmod.glob(embedglob)),
        }
        assert len(self.files["pos"]) == len(self.files["z"])
        if self.has_energies:
            self.files["y"] = sorted(globmod.glob(energyglob))
            assert len(self.files["pos"]) == len(self.files["y"])
        if self.has_forces:
            self.files["neg_dy"] = sorted(globmod.glob(forceglob))
            assert len(self.files["pos"]) == len(self.files["neg_dy"])

        self.index = []
        total = 0
        for i, f in enumerate(self.files["pos"]):
            coords = np.load(f, mmap_mode="r")
            embed = np.load(self.files["z"][i])
            assert coords.shape[1] == embed.shape[0], (
                f"Atom count mismatch in file pair {i}"
            )
            total += coords.nbytes + embed.nbytes
            if self.has_energies:
                e = np.load(self.files["y"][i], mmap_mode="r")
                assert coords.shape[0] == e.shape[0]
                total += e.nbytes
            if self.has_forces:
                fr = np.load(self.files["neg_dy"][i], mmap_mode="r")
                assert coords.shape == fr.shape
                total += fr.nbytes
            self.index.extend(zip([i] * coords.shape[0], range(coords.shape[0])))

        mmap_mode = None if total < preload_memory_limit * 1024**2 else "r"
        self.stored = {
            "pos": [np.load(f, mmap_mode=mmap_mode) for f in self.files["pos"]],
            "z": [np.load(f).astype(np.int64) for f in self.files["z"]],
        }
        if self.has_energies:
            self.stored["y"] = [
                np.load(f, mmap_mode=mmap_mode) for f in self.files["y"]
            ]
        if self.has_forces:
            self.stored["neg_dy"] = [
                np.load(f, mmap_mode=mmap_mode) for f in self.files["neg_dy"]
            ]

    def __len__(self):
        return len(self.index)

    def get(self, idx):
        fid, i = self.index[idx]
        out = {
            "pos": np.asarray(self.stored["pos"][fid][i], np.float32),
            "z": self.stored["z"][fid],
        }
        if self.has_energies:
            out["y"] = np.asarray(self.stored["y"][fid][i], np.float32).reshape(
                1, 1
            )
        if self.has_forces:
            out["neg_dy"] = np.asarray(self.stored["neg_dy"][fid][i], np.float32)
        return out
