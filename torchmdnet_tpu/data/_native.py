"""ctypes bindings for the native batch packer (csrc/packer.cpp).

Compiled on first use with g++; falls back to the numpy packer when the
toolchain is unavailable.
"""

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        import sys

        sys.path.insert(0, os.path.join(here, "csrc"))
        from build_ext import build

        lib = ctypes.CDLL(build(verbose=False))
    except Exception:
        _LIB = False
        return False
    lib.pack_from_memmap.restype = ctypes.c_int64
    lib.pack_from_memmap.argtypes = [ctypes.c_int64] + [
        ctypes.c_void_p
    ] * 8 + [ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 8
    lib.pack_batch.restype = ctypes.c_int64
    lib.pack_batch.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _LIB = lib
    return lib


def native_available():
    return bool(_load())


def _vp(arr):
    return arr.ctypes.data_as(ctypes.c_void_p) if arr is not None else None


def pack_from_memmap(dataset, mol_ids, max_atoms, max_mols):
    """Pack a batch straight from a MemmappedDataset's mapped files —
    zero intermediate per-sample allocations.  Returns None when the
    native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    mm = dataset.mmaps
    props = dataset.properties
    mol_ids = np.ascontiguousarray(np.asarray(mol_ids, np.int64))
    n_mols = len(mol_ids)

    z_out = np.zeros(max_atoms, np.int32)
    batch_out = np.full(max_atoms, max_mols, np.int32)
    pos_out = np.zeros((max_atoms, 3), np.float32)
    y_out = np.zeros((max_mols, 1), np.float32) if "y" in props else None
    negdy_out = (
        np.zeros((max_atoms, 3), np.float32) if "neg_dy" in props else None
    )
    q_out = np.zeros(max_mols, np.float32) if "q" in props else None
    pq_out = np.zeros(max_atoms, np.float32) if "pq" in props else None
    mol_mask = np.zeros(max_mols, np.uint8)

    rc = lib.pack_from_memmap(
        n_mols,
        _vp(mol_ids),
        _vp(mm["idx"]),
        _vp(mm["z"]),
        _vp(mm["pos"]),
        _vp(mm["y"]) if "y" in props else None,
        _vp(mm["neg_dy"]) if "neg_dy" in props else None,
        _vp(mm["q"]) if "q" in props else None,
        _vp(mm["pq"]) if "pq" in props else None,
        max_atoms,
        max_mols,
        _vp(z_out),
        _vp(batch_out),
        _vp(pos_out),
        _vp(y_out),
        _vp(negdy_out),
        _vp(q_out),
        _vp(pq_out),
        _vp(mol_mask),
    )
    if rc < 0:
        raise ValueError(
            f"batch exceeds capacity (max_atoms={max_atoms}, "
            f"max_mols={max_mols})"
        )
    out = {
        "z": z_out, "pos": pos_out, "batch": batch_out,
        "mol_mask": mol_mask.astype(bool),
    }
    if y_out is not None:
        out["y"] = y_out
    if negdy_out is not None:
        out["neg_dy"] = negdy_out
    if q_out is not None:
        out["q"] = q_out
    if pq_out is not None:
        out["pq"] = pq_out
    return out


def pack_batch_native(samples, max_atoms, max_mols):
    """Native fast path for the atom-level fields of pad_samples;
    returns None when unavailable (caller falls back to numpy)."""
    lib = _load()
    if not lib:
        return None
    n_mols = len(samples)
    has_negdy = all("neg_dy" in s for s in samples)
    has_pq = all("pq" in s for s in samples)

    sizes = np.array([len(s["z"]) for s in samples], np.int64)
    z_arrs = [np.ascontiguousarray(np.asarray(s["z"], np.int64).reshape(-1))
              for s in samples]
    pos_arrs = [np.ascontiguousarray(np.asarray(s["pos"], np.float32))
                for s in samples]
    negdy_arrs = (
        [np.ascontiguousarray(np.asarray(s["neg_dy"], np.float32))
         for s in samples] if has_negdy else None
    )
    pq_arrs = (
        [np.ascontiguousarray(np.asarray(s["pq"], np.float32).reshape(-1))
         for s in samples] if has_pq else None
    )

    def ptr_array(arrs):
        arr = (ctypes.c_void_p * n_mols)()
        for i, a in enumerate(arrs):
            arr[i] = a.ctypes.data_as(ctypes.c_void_p).value
        return arr

    z_out = np.zeros(max_atoms, np.int32)
    batch_out = np.full(max_atoms, max_mols, np.int32)
    pos_out = np.zeros((max_atoms, 3), np.float32)
    negdy_out = np.zeros((max_atoms, 3), np.float32) if has_negdy else None
    pq_out = np.zeros(max_atoms, np.float32) if has_pq else None
    mol_mask = np.zeros(max_mols, np.uint8)

    rc = lib.pack_batch(
        n_mols,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ptr_array(z_arrs),
        ptr_array(pos_arrs),
        ptr_array(negdy_arrs) if has_negdy else None,
        ptr_array(pq_arrs) if has_pq else None,
        max_atoms,
        max_mols,
        z_out.ctypes.data_as(ctypes.c_void_p),
        batch_out.ctypes.data_as(ctypes.c_void_p),
        pos_out.ctypes.data_as(ctypes.c_void_p),
        negdy_out.ctypes.data_as(ctypes.c_void_p) if has_negdy else None,
        pq_out.ctypes.data_as(ctypes.c_void_p) if has_pq else None,
        mol_mask.ctypes.data_as(ctypes.c_void_p),
    )
    if rc < 0:
        raise ValueError(
            f"batch exceeds capacity (max_atoms={max_atoms}, "
            f"max_mols={max_mols})"
        )
    out = {
        "z": z_out,
        "pos": pos_out,
        "batch": batch_out,
        "mol_mask": mol_mask.astype(bool),
    }
    if has_negdy:
        out["neg_dy"] = negdy_out
    if has_pq:
        out["pq"] = pq_out
    return out
