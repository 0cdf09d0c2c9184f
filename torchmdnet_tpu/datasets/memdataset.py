"""Memory-mapped dataset base.

Capability + *file-format* parity with the reference
``torchmdnet/datasets/memdataset.py`` — identical ``<Name>.<prop>.mmap``
layout (idx int64 prefix-offsets, z int8, pos float32 [A,3], y float64,
neg_dy float32 [A,3], q int8, pq float32, dp float32 [C,3]) with two-phase
processing and tmp-rename atomicity, so datasets processed by either
framework are interchangeable on disk.

No torch_geometric: samples are plain dicts of numpy arrays; O(1) ``get``
slices the memmaps.
"""

import gc
import os
from typing import Dict, Iterator, Sequence

import numpy as np


class Dataset:
    """Minimal dataset protocol: ``len(ds)``, ``ds[i] -> dict``, optional
    ``get_atomref()`` and ``atomic_number``/``distance_scale``/
    ``energy_scale`` attributes consumed by priors."""

    transform = None

    def __len__(self):
        raise NotImplementedError

    def get(self, idx) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def __getitem__(self, idx):
        data = self.get(int(idx))
        if self.transform is not None:
            data = self.transform(data)
        return data

    def get_atomref(self, max_z=100):
        return None


class Subset(Dataset):
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)

    def __len__(self):
        return len(self.indices)

    def get(self, idx):
        return self.dataset[int(self.indices[idx])]

    def __getattr__(self, name):
        # delegate metadata (atomic_number, scales, atomref) to the base
        return getattr(self.dataset, name)


_PROP_SPECS = {
    "idx": (np.int64, 1),
    "z": (np.int8, 1),
    "pos": (np.float32, 3),
    "y": (np.float64, 1),
    "neg_dy": (np.float32, 3),
    "q": (np.int8, 1),
    "pq": (np.float32, 1),
    "dp": (np.float32, 3),
}


class MemmappedDataset(Dataset):
    def __init__(
        self,
        root: str,
        transform=None,
        pre_transform=None,
        pre_filter=None,
        properties: Sequence[str] = ("y", "neg_dy", "q", "pq", "dp"),
    ):
        if not hasattr(self, "name"):
            self.name = self.__class__.__name__
        self.root = os.path.expanduser(root)
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter
        self.properties = tuple(properties)

        os.makedirs(self.processed_dir, exist_ok=True)
        if not all(os.path.exists(p) for p in self.processed_paths):
            self.process()
        self._open()

    # -- layout ------------------------------------------------------------
    @property
    def raw_dir(self):
        return os.path.join(self.root, "raw")

    @property
    def processed_dir(self):
        return os.path.join(self.root, "processed")

    @property
    def processed_file_names(self):
        return [
            f"{self.name}.{prop}.mmap"
            for prop in ["idx", "z", "pos"] + list(self.properties)
        ]

    @property
    def processed_paths(self):
        return [
            os.path.join(self.processed_dir, f) for f in self.processed_file_names
        ]

    @property
    def processed_paths_dict(self):
        return dict(
            zip(["idx", "z", "pos"] + list(self.properties), self.processed_paths)
        )

    # -- abstract ------------------------------------------------------------
    def sample_iter(self, mol_ids=False) -> Iterator[Dict[str, np.ndarray]]:
        """Yield dict samples with at least z (int) and pos [n,3];
        plus any of the declared properties."""
        raise NotImplementedError

    # -- processing ----------------------------------------------------------
    def process(self):
        print("Gathering statistics...")
        num_all_confs = 0
        num_all_atoms = 0
        for data in self.sample_iter():
            num_all_confs += 1
            num_all_atoms += int(np.asarray(data["z"]).shape[0])
        print(f"  Total number of conformers: {num_all_confs}")
        print(f"  Total number of atoms: {num_all_atoms}")
        print(f"  Properties available: {self.properties}")

        fnames = self.processed_paths_dict
        per_conf = {"idx": num_all_confs + 1, "y": num_all_confs,
                    "q": num_all_confs, "dp": num_all_confs}
        mmaps = {}
        for prop in ["idx", "z", "pos"] + list(self.properties):
            dtype, width = _PROP_SPECS[prop]
            count = per_conf.get(prop, num_all_atoms)
            shape = (count,) if width == 1 else (count, width)
            mmaps[prop] = np.memmap(
                fnames[prop] + ".tmp", mode="w+", dtype=dtype, shape=shape
            )

        print("Storing data...")
        i_atom = 0
        for i_conf, data in enumerate(self.sample_iter()):
            n = int(np.asarray(data["z"]).shape[0])
            nxt = i_atom + n
            mmaps["idx"][i_conf] = i_atom
            mmaps["z"][i_atom:nxt] = np.asarray(data["z"], np.int8)
            mmaps["pos"][i_atom:nxt] = np.asarray(data["pos"], np.float32)
            for prop in self.properties:
                if prop == "y":
                    mmaps["y"][i_conf] = float(np.asarray(data["y"]).reshape(()))
                elif prop == "neg_dy":
                    mmaps["neg_dy"][i_atom:nxt] = np.asarray(
                        data["neg_dy"], np.float32
                    )
                elif prop == "q":
                    mmaps["q"][i_conf] = int(np.asarray(data["q"]).reshape(()))
                elif prop == "pq":
                    mmaps["pq"][i_atom:nxt] = np.asarray(data["pq"], np.float32)
                elif prop == "dp":
                    mmaps["dp"][i_conf] = np.asarray(data["dp"], np.float32)
            i_atom = nxt
        mmaps["idx"][-1] = num_all_atoms
        assert i_atom == num_all_atoms

        for prop in list(mmaps.keys()):
            mmaps[prop].flush()
            del mmaps[prop]
        gc.collect()
        for prop, path in fnames.items():
            os.rename(path + ".tmp", path)

    def _open(self):
        fnames = self.processed_paths_dict
        self.mmaps = {}
        self.mmaps["idx"] = np.memmap(fnames["idx"], mode="r", dtype=np.int64)
        self.mmaps["z"] = np.memmap(fnames["z"], mode="r", dtype=np.int8)
        num_all_confs = self.mmaps["idx"].shape[0] - 1
        num_all_atoms = self.mmaps["z"].shape[0]
        self.mmaps["pos"] = np.memmap(
            fnames["pos"], mode="r", dtype=np.float32, shape=(num_all_atoms, 3)
        )
        if "y" in self.properties:
            self.mmaps["y"] = np.memmap(fnames["y"], mode="r", dtype=np.float64)
        if "neg_dy" in self.properties:
            self.mmaps["neg_dy"] = np.memmap(
                fnames["neg_dy"], mode="r", dtype=np.float32,
                shape=(num_all_atoms, 3),
            )
        if "q" in self.properties:
            self.mmaps["q"] = np.memmap(fnames["q"], mode="r", dtype=np.int8)
        if "pq" in self.properties:
            self.mmaps["pq"] = np.memmap(fnames["pq"], mode="r", dtype=np.float32)
        if "dp" in self.properties:
            self.mmaps["dp"] = np.memmap(
                fnames["dp"], mode="r", dtype=np.float32,
                shape=(num_all_confs, 3),
            )
        assert self.mmaps["idx"][0] == 0
        assert self.mmaps["idx"][-1] == num_all_atoms

    def __len__(self):
        return len(self.mmaps["idx"]) - 1

    def get(self, idx):
        atoms = slice(int(self.mmaps["idx"][idx]), int(self.mmaps["idx"][idx + 1]))
        out = {
            "z": np.asarray(self.mmaps["z"][atoms], np.int64),
            "pos": np.array(self.mmaps["pos"][atoms], np.float32),
        }
        if "y" in self.properties:
            out["y"] = np.array([[self.mmaps["y"][idx]]], np.float64)
        if "neg_dy" in self.properties:
            out["neg_dy"] = np.array(self.mmaps["neg_dy"][atoms], np.float32)
        if "q" in self.properties:
            out["q"] = np.asarray(self.mmaps["q"][idx], np.int64)
        if "pq" in self.properties:
            out["pq"] = np.array(self.mmaps["pq"][atoms], np.float32)
        if "dp" in self.properties:
            out["dp"] = np.array(self.mmaps["dp"][idx], np.float32)
        return out
