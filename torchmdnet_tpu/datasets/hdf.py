"""Generic HDF5 dataset (reference ``torchmdnet/datasets/hdf.py``).

File contract: each group holds same-atom-count samples with arrays
``types`` [n] (atom types), ``pos`` [s, n, 3], and at least one of
``energy`` [s] / ``forces`` [s, n, 3]; optional ``partial_charges``;
a ``_metadata`` group's arrays become dataset attributes.  ``filename``
may be a semicolon-separated list; small datasets are preloaded into RAM.
"""

from typing import Dict

import numpy as np

from torchmdnet_tpu.datasets.memdataset import Dataset


class HDF5(Dataset):
    def __init__(self, filename, dataset_preload_limit=1024, **kwargs):
        import h5py

        self.filename = filename
        self.num_molecules = 0
        self.fields = None
        total_size = 0
        for fname in filename.split(";"):
            with h5py.File(fname, "r") as f:
                total_size += f.id.get_filesize()
                for group_name, group in f.items():
                    if group_name == "_metadata":
                        for name in group:
                            setattr(self, name, np.asarray(group[name]))
                        continue
                    self.num_molecules += len(group["pos"])
                    if self.fields is None:
                        self.fields = [("pos", "pos", np.float32),
                                       ("z", "types", np.int64)]
                        if "energy" in group:
                            self.fields.append(("y", "energy", np.float32))
                        if "forces" in group:
                            self.fields.append(("neg_dy", "forces", np.float32))
                        if "partial_charges" in group:
                            self.fields.append(
                                ("partial_charges", "partial_charges", np.float32)
                            )
                        assert "energy" in group or "forces" in group, (
                            "Each group must contain at least energies or forces"
                        )
        self.cached = total_size <= dataset_preload_limit * 1024**2
        self._index = None
        self._groups = None
        if self.cached:
            self._preload()

    def _iter_groups(self):
        import h5py

        for fname in self.filename.split(";"):
            f = h5py.File(fname, "r")
            for group_name, group in f.items():
                if group_name != "_metadata":
                    yield group

    def _preload(self):
        self._data = {name: [] for name, _, _ in self.fields}
        self._index = []
        gi = 0
        for group in self._iter_groups():
            size = len(group["pos"])
            for name, key, dtype in self.fields:
                arr = np.asarray(group[key], dtype=dtype)
                if arr.ndim == 1:
                    if len(arr) == size:
                        arr = arr[:, None]
                    else:
                        arr = np.broadcast_to(arr[None, :], (size, arr.shape[0]))
                self._data[name].append(arr)
            self._index.extend(zip([gi] * size, range(size)))
            gi += 1

    def _setup_lazy_index(self):
        self._index = []
        self._groups = []
        gi = 0
        for group in self._iter_groups():
            size = len(group["pos"])
            self._groups.append(group)
            self._index.extend(zip([gi] * size, range(size)))
            gi += 1

    def __len__(self):
        return self.num_molecules

    def get(self, idx) -> Dict[str, np.ndarray]:
        if self._index is None:
            self._setup_lazy_index()
        gi, i = self._index[idx]
        out = {}
        if self.cached:
            for name, _, dtype in self.fields:
                out[name] = np.asarray(self._data[name][gi][i])
        else:
            group = self._groups[gi]
            size = len(group["pos"])
            for name, key, dtype in self.fields:
                d = group[key]
                if d.ndim == 1:
                    val = np.asarray([d[i]] if len(d) == size else d[:], dtype)
                else:
                    val = np.asarray(d[i], dtype)
                out[name] = val
        out["z"] = np.asarray(out["z"], np.int64).reshape(-1)
        if "y" in out:
            out["y"] = np.asarray(out["y"], np.float32).reshape(1, 1)
        return out
