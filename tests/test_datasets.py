"""Data-layer roundtrips (reference tests/test_datasets.py, test_utils.py):
write synthetic raw files, load through the dataset classes, compare."""

import os

import h5py
import numpy as np
import pytest

from torchmdnet_tpu.data.collate import PaddedLoader, pad_samples
from torchmdnet_tpu.data.splits import make_splits
from torchmdnet_tpu.datasets import HDF5, Ace, Custom
from torchmdnet_tpu.datasets.memdataset import MemmappedDataset


def make_hdf5(path, ngroups=2, nsamples=4, natoms=5, with_pq=False):
    rng = np.random.RandomState(0)
    ref = []
    with h5py.File(path, "w") as f:
        for g in range(ngroups):
            grp = f.create_group(f"g{g}")
            types = rng.randint(1, 9, natoms + g)
            pos = rng.randn(nsamples, natoms + g, 3).astype(np.float32)
            energy = rng.randn(nsamples).astype(np.float32)
            forces = rng.randn(nsamples, natoms + g, 3).astype(np.float32)
            grp["types"] = types
            grp["pos"] = pos
            grp["energy"] = energy
            grp["forces"] = forces
            if with_pq:
                grp["partial_charges"] = rng.randn(
                    nsamples, natoms + g
                ).astype(np.float32)
            for i in range(nsamples):
                ref.append((types, pos[i], energy[i], forces[i]))
    return ref


@pytest.mark.parametrize("preload", [True, False])
def test_hdf5_roundtrip(tmp_path, preload):
    path = str(tmp_path / "data.h5")
    ref = make_hdf5(path)
    ds = HDF5(path, dataset_preload_limit=1024 if preload else 0)
    assert len(ds) == len(ref)
    for i, (types, pos, energy, forces) in enumerate(ref):
        s = ds[i]
        np.testing.assert_array_equal(s["z"], types)
        np.testing.assert_allclose(s["pos"], pos, rtol=1e-6)
        np.testing.assert_allclose(float(s["y"].reshape(())), energy,
                                   rtol=1e-5)
        np.testing.assert_allclose(s["neg_dy"], forces, rtol=1e-6)


def test_custom_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    nfiles, frames, atoms = 3, 6, 7
    for i in range(nfiles):
        np.save(tmp_path / f"coords_{i}.npy",
                rng.randn(frames, atoms, 3).astype(np.float32))
        np.save(tmp_path / f"embed_{i}.npy", rng.randint(1, 9, atoms))
        np.save(tmp_path / f"energy_{i}.npy",
                rng.randn(frames).astype(np.float32))
        np.save(tmp_path / f"forces_{i}.npy",
                rng.randn(frames, atoms, 3).astype(np.float32))
    ds = Custom(
        str(tmp_path / "coords_*.npy"),
        str(tmp_path / "embed_*.npy"),
        str(tmp_path / "energy_*.npy"),
        str(tmp_path / "forces_*.npy"),
    )
    assert len(ds) == nfiles * frames
    s = ds[7]
    coords = np.load(tmp_path / "coords_1.npy")
    np.testing.assert_allclose(s["pos"], coords[1], rtol=1e-6)


def make_ace_v2(path, nmols=3, natoms=4, nconfs=5):
    rng = np.random.RandomState(2)
    with h5py.File(path, "w") as f:
        f.attrs["layout"] = "Ace"
        f.attrs["layout_version"] = "2.0"
        f.attrs["name"] = "test"
        master = f.create_group("master")
        for m in range(nmols):
            mol = master.create_group(f"mol_{m}")
            mol["atomic_numbers"] = rng.randint(1, 9, natoms)
            mol["formal_charges"] = np.zeros(natoms, np.int64)
            for key, arr in [
                ("positions", rng.randn(nconfs, natoms, 3)),
                ("forces", rng.randn(nconfs, natoms, 3)),
                ("partial_charges", rng.randn(nconfs, natoms)),
                ("dipole_moments", rng.randn(nconfs, 3)),
                ("formation_energies", rng.randn(nconfs)),
            ]:
                mol[key] = arr
            mol["positions"].attrs["units"] = "Å"
            mol["forces"].attrs["units"] = "eV/Å"
            mol["partial_charges"].attrs["units"] = "e"
            mol["dipole_moments"].attrs["units"] = "e*Å"
            mol["formation_energies"].attrs["units"] = "eV"


def test_ace_v2_memmapped_roundtrip(tmp_path):
    raw = str(tmp_path / "ace.h5")
    make_ace_v2(raw)
    ds = Ace(root=str(tmp_path / "root"), paths=raw)
    assert len(ds) == 15
    s = ds[0]
    assert s["pos"].shape == (4, 3)
    assert s["y"].shape == (1, 1)
    assert "pq" in s and "dp" in s and "q" in s
    # processed .mmap files exist (reference-compatible layout)
    files = os.listdir(tmp_path / "root" / "processed")
    assert any(f.endswith(".idx.mmap") for f in files)
    # reopening loads from processed without the raw file
    ds2 = Ace(root=str(tmp_path / "root"), paths=raw)
    np.testing.assert_allclose(ds2[3]["pos"], ds[3]["pos"])


def test_make_splits_semantics(tmp_path):
    tr, va, te = make_splits(100, 0.7, 0.2, None, seed=0)
    assert len(tr) == 70 and len(va) == 20 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100
    fname = str(tmp_path / "splits.npz")
    tr2, va2, te2 = make_splits(100, 0.7, 0.2, None, seed=0, filename=fname)
    tr3, va3, te3 = make_splits(100, None, None, None, seed=1, splits=fname)
    np.testing.assert_array_equal(tr2, tr3)
    # count semantics
    tr, va, te = make_splits(100, 50, 25, 25, seed=0)
    assert len(tr) == 50 and len(va) == 25 and len(te) == 25


def test_padded_loader(tmp_path):
    path = str(tmp_path / "data.h5")
    make_hdf5(path, ngroups=2, nsamples=4, natoms=5)
    ds = HDF5(path)
    loader = PaddedLoader(ds, batch_size=3, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["z"].shape == b["batch"].shape
    assert b["pos"].shape == (len(b["z"]), 3)
    assert b["mol_mask"].shape == (3,)
    # ghost atoms are in the extra segment
    ghosts = b["batch"] == 3
    assert (b["z"][ghosts] == 0).all()
    # deterministic across epochs with same seed+epoch
    loader.set_epoch(0)
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["z"], again[0]["z"])
    loader.set_epoch(1)
    shuffled = list(loader)
    assert any(
        not np.array_equal(a["z"], b2["z"])
        for a, b2 in zip(batches, shuffled)
    )


def test_acehf_parquet_roundtrip(tmp_path):
    """AceHF (reference ``datasets/ace.py:335-392``): HF-datasets parquet
    variant serves the same sample dict as Ace, incl. the max_gradient
    NaN/norm filter."""
    datasets_hf = pytest.importorskip("datasets")

    rng = np.random.RandomState(0)
    rows = {
        "atomic_numbers": [], "positions": [], "formation_energy": [],
        "forces": [], "formal_charges": [], "partial_charges": [],
        "dipole_moment": [],
    }
    n_rows = 6
    for i in range(n_rows):
        n = 3 + i % 3
        rows["atomic_numbers"].append(rng.randint(1, 9, n).tolist())
        rows["positions"].append(rng.randn(n, 3).astype(np.float64).tolist())
        rows["formation_energy"].append(float(rng.randn()))
        # one row gets a huge force so max_gradient filters it
        f = rng.randn(n, 3)
        if i == 4:
            f[0] = 1e3
        rows["forces"].append(f.tolist())
        rows["formal_charges"].append(
            rng.randint(-1, 2, n).astype(np.int64).tolist()
        )
        rows["partial_charges"].append(rng.randn(n).tolist())
        rows["dipole_moment"].append(rng.randn(3).tolist())
    pq_path = str(tmp_path / "shard.parquet")
    datasets_hf.Dataset.from_dict(rows).to_parquet(pq_path)

    from torchmdnet_tpu.datasets import AceHF

    ds = AceHF(root="parquet", paths=[pq_path], split="train")
    assert len(ds) == n_rows
    s = ds.get(1)
    np.testing.assert_array_equal(s["z"], rows["atomic_numbers"][1])
    np.testing.assert_allclose(
        s["pos"], np.asarray(rows["positions"][1], np.float32)
    )
    assert s["y"].shape == (1, 1)
    assert s["y"][0, 0] == pytest.approx(rows["formation_energy"][1])
    np.testing.assert_allclose(
        s["neg_dy"], np.asarray(rows["forces"][1], np.float32)
    )
    assert s["q"] == sum(rows["formal_charges"][1])
    assert s["pq"].shape == (len(rows["atomic_numbers"][1]),)
    assert s["dp"].shape == (3,)

    filtered = AceHF(root="parquet", paths=[pq_path], split="train",
                     max_gradient=100.0)
    assert len(filtered) == n_rows - 1
