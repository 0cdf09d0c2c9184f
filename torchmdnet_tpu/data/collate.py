"""Static-shape batch packing (the TPU-native collation layer).

The reference relies on torch-geometric's dynamic flat concatenation;
under jit every batch must have the same shapes, so samples are packed
into fixed ``(max_atoms, max_mols)`` buffers:

* atoms are concatenated along one axis, padded with ghost atoms whose
  segment id is ``max_mols`` (dropped by every segment reduction),
* per-molecule arrays (y, q, s, dp) are padded with zeros and masked by
  ``mol_mask``.

A C fast path for the inner packing loop lives in ``csrc/`` (optional);
the numpy path below is the reference implementation.
"""

import math
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_ATOM_KEYS = ("pos", "neg_dy", "pq", "partial_charges")
_MOL_SCALAR_KEYS = ("q", "s")


def pad_samples(
    samples: List[Dict[str, np.ndarray]],
    max_atoms: int,
    max_mols: int,
    extra_atom_keys: Sequence[str] = (),
    use_native: bool = False,
) -> Dict[str, np.ndarray]:
    """Pack a list of dict samples into one padded batch dict.

    ``use_native`` packs the atom-level fields in C++ (csrc/packer.cpp);
    measured slower than numpy at typical batch sizes due to per-call
    ctypes marshalling, so it is off by default — the fast native path is
    :func:`torchmdnet_tpu.data._native.pack_from_memmap`, which the loader
    uses automatically for memmapped datasets.
    """
    if use_native:
        from torchmdnet_tpu.data._native import pack_batch_native

        try:
            native = pack_batch_native(samples, max_atoms, max_mols)
        except ValueError:
            raise
        except Exception:
            native = None
        if native is not None:
            out = native
            has = {k: all(k in s for s in samples) for k in
                   ("y", "q", "s", "dp", "box", "partial_charges")}
            if has["y"]:
                out["y"] = np.asarray(
                    [float(np.asarray(s["y"]).reshape(())) for s in samples]
                    + [0.0] * (max_mols - len(samples)), np.float32
                ).reshape(max_mols, 1)
            if has["q"]:
                out["q"] = np.asarray(
                    [float(np.asarray(s["q"]).reshape(())) for s in samples]
                    + [0.0] * (max_mols - len(samples)), np.float32
                )
            if has["s"]:
                out["s"] = np.asarray(
                    [float(np.asarray(s["s"]).reshape(())) for s in samples]
                    + [0.0] * (max_mols - len(samples)), np.float32
                )
            if has["dp"]:
                dp = np.zeros((max_mols, 3), np.float32)
                for m, smp in enumerate(samples):
                    dp[m] = np.asarray(smp["dp"]).reshape(3)
                out["dp"] = dp
            if has["box"]:
                box = np.zeros((max_mols, 3, 3), np.float32)
                for m, smp in enumerate(samples):
                    box[m] = np.asarray(smp["box"]).reshape(3, 3)
                out["box"] = box
            if has["partial_charges"]:
                pc = np.zeros(max_atoms, np.float32)
                o = 0
                for smp in samples:
                    n = len(smp["z"])
                    pc[o:o + n] = np.asarray(
                        smp["partial_charges"]).reshape(-1)
                    o += n
                out["partial_charges"] = pc
            return out
    n_mols = len(samples)
    assert n_mols <= max_mols, f"{n_mols} molecules > max_mols={max_mols}"
    total_atoms = sum(len(s["z"]) for s in samples)
    assert total_atoms <= max_atoms, (
        f"{total_atoms} atoms > max_atoms={max_atoms}"
    )

    out = {
        "z": np.zeros(max_atoms, np.int32),
        "pos": np.zeros((max_atoms, 3), np.float32),
        "batch": np.full(max_atoms, max_mols, np.int32),
        "mol_mask": np.zeros(max_mols, bool),
    }
    has = {k: all(k in s for s in samples) for k in
           ("y", "neg_dy", "q", "s", "pq", "dp", "box", "partial_charges")}
    if has["y"]:
        out["y"] = np.zeros((max_mols, 1), np.float32)
    if has["neg_dy"]:
        out["neg_dy"] = np.zeros((max_atoms, 3), np.float32)
    if has["q"]:
        out["q"] = np.zeros(max_mols, np.float32)
    if has["s"]:
        out["s"] = np.zeros(max_mols, np.float32)
    if has["pq"]:
        out["pq"] = np.zeros(max_atoms, np.float32)
    if has["partial_charges"]:
        out["partial_charges"] = np.zeros(max_atoms, np.float32)
    if has["dp"]:
        out["dp"] = np.zeros((max_mols, 3), np.float32)
    if has["box"]:
        out["box"] = np.zeros((max_mols, 3, 3), np.float32)

    o = 0
    for m, s in enumerate(samples):
        n = len(s["z"])
        out["z"][o:o + n] = np.asarray(s["z"]).reshape(-1)
        out["pos"][o:o + n] = s["pos"]
        out["batch"][o:o + n] = m
        out["mol_mask"][m] = True
        if has["y"]:
            out["y"][m, 0] = float(np.asarray(s["y"]).reshape(()))
        if has["neg_dy"]:
            out["neg_dy"][o:o + n] = s["neg_dy"]
        if has["q"]:
            out["q"][m] = float(np.asarray(s["q"]).reshape(()))
        if has["s"]:
            out["s"][m] = float(np.asarray(s["s"]).reshape(()))
        if has["pq"]:
            out["pq"][o:o + n] = np.asarray(s["pq"]).reshape(-1)
        if has["partial_charges"]:
            out["partial_charges"][o:o + n] = np.asarray(
                s["partial_charges"]
            ).reshape(-1)
        if has["dp"]:
            out["dp"][m] = np.asarray(s["dp"]).reshape(3)
        if has["box"]:
            out["box"][m] = np.asarray(s["box"]).reshape(3, 3)
        o += n
    return out


class PaddedLoader:
    """Iterates a dataset as padded static-shape batches.

    One fixed (max_atoms, max_mols) shape per loader ⇒ one XLA compile.
    ``max_atoms`` defaults to ``batch_size × (max sample size)`` scanned
    from the dataset (cheap for memmapped datasets), rounded up to a
    multiple of 64 lanes.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        max_atoms: Optional[int] = None,
        drop_last: bool = False,
        indices: Optional[np.ndarray] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.indices = (
            np.asarray(indices, np.int64)
            if indices is not None
            else np.arange(len(dataset), dtype=np.int64)
        )
        if max_atoms is None:
            max_size = self._max_sample_size()
            max_atoms = self.batch_size * max_size
        self.max_atoms = int(math.ceil(max_atoms / 64) * 64)
        self._epoch = 0

    def _max_sample_size(self) -> int:
        ds = self.dataset
        base = getattr(ds, "dataset", ds)
        if hasattr(base, "mmaps"):  # MemmappedDataset: O(#confs) from idx
            idx = np.asarray(base.mmaps["idx"])
            return int(np.max(np.diff(idx)))
        sizes = [len(ds[int(i)]["z"]) for i in
                 self.indices[: min(len(self.indices), 1000)]]
        return int(max(sizes))

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def _memmap_base(self):
        """(base MemmappedDataset, index remap) when the direct C++
        memmap→batch path applies (no transforms in the chain)."""
        from torchmdnet_tpu.datasets.memdataset import (
            MemmappedDataset,
            Subset,
        )

        ds = self.dataset
        remap = None
        if isinstance(ds, Subset):
            remap = ds.indices
            ds = ds.dataset
        if isinstance(ds, MemmappedDataset) and ds.transform is None:
            return ds, remap
        return None, None

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(order)
        base, remap = self._memmap_base()
        if base is not None:
            from torchmdnet_tpu.data._native import (
                native_available,
                pack_from_memmap,
            )

            if not native_available():
                base = None
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            if base is not None:
                ids = remap[chunk] if remap is not None else chunk
                batch = pack_from_memmap(
                    base, ids, self.max_atoms, self.batch_size
                )
                if batch is not None:
                    yield batch
                    continue
            samples = [self.dataset[int(i)] for i in chunk]
            yield pad_samples(samples, self.max_atoms, self.batch_size)
