"""Parser roundtrips for the download-gated datasets: synthetic raw files
in each native format → dataset classes → samples."""

import os
import tarfile

import h5py
import numpy as np
import pytest

HARTREE_TO_EV = 27.211386246


def test_md17_npz(tmp_path):
    from torchmdnet_tpu.datasets import MD17

    raw_dir = tmp_path / "aspirin" / "raw"
    os.makedirs(raw_dir)
    rng = np.random.RandomState(0)
    n, frames = 21, 7
    z = rng.randint(1, 9, n)
    R = rng.randn(frames, n, 3).astype(np.float32)
    E = rng.randn(frames)
    F = rng.randn(frames, n, 3).astype(np.float32)
    np.savez(raw_dir / "md17_aspirin.npz", z=z, R=R, E=E, F=F)

    ds = MD17(str(tmp_path), molecules="aspirin")
    assert len(ds) == frames
    s = ds[3]
    np.testing.assert_array_equal(s["z"], z)
    np.testing.assert_allclose(s["pos"], R[3], rtol=1e-6)
    np.testing.assert_allclose(float(s["y"].reshape(())), E[3], rtol=1e-6)


def test_md22_npz(tmp_path):
    from torchmdnet_tpu.datasets import MD22

    raw_dir = tmp_path / "DHA" / "raw"
    os.makedirs(raw_dir)
    rng = np.random.RandomState(1)
    n, frames = 10, 5
    np.savez(raw_dir / "md22_DHA.npz", z=rng.randint(1, 9, n),
             R=rng.randn(frames, n, 3), E=rng.randn(frames),
             F=rng.randn(frames, n, 3))
    ds = MD22(str(tmp_path), molecules="DHA")
    assert len(ds) == frames


def test_ani1_h5(tmp_path):
    from torchmdnet_tpu.datasets import ANI1

    raw_dir = tmp_path / "raw" / "ANI-1_release"
    os.makedirs(raw_dir)
    rng = np.random.RandomState(2)
    for i in range(1, 9):
        with h5py.File(raw_dir / f"ani_gdb_s{i:02d}.h5", "w") as f:
            g = f.create_group("gdb")
            mol = g.create_group(f"mol{i}")
            mol["species"] = np.array([b"C", b"H", b"H", b"O"])
            mol["coordinates"] = rng.randn(3, 4, 3).astype(np.float32)
            mol["energies"] = rng.randn(3)
    ds = ANI1(str(tmp_path))
    assert len(ds) == 24
    s = ds[0]
    assert set(s["z"]) <= {1, 6, 8}
    refs = ds.get_atomref()
    assert refs[1, 0] != 0.0


def test_spice_h5(tmp_path):
    from torchmdnet_tpu.datasets import SPICE

    rng = np.random.RandomState(3)
    raw_dir = tmp_path / "raw" / "spice" / "1.1.3"
    os.makedirs(raw_dir)
    with h5py.File(raw_dir / "SPICE-1.1.3.hdf5", "w") as f:
        mol = f.create_group("molA")
        mol["atomic_numbers"] = np.array([6, 1, 1, 1, 1])
        mol["conformations"] = rng.randn(4, 5, 3).astype(np.float32)
        mol["formation_energy"] = rng.randn(4)
        mol["dft_total_gradient"] = rng.randn(4, 5, 3).astype(np.float32)
        mol["subset"] = np.array([b"SPICE PubChem Set 1"])
    ds = SPICE(str(tmp_path), version="1.1.3")
    assert len(ds) == 4
    s = ds[1]
    assert s["pos"].shape == (5, 3)
    assert s["neg_dy"].shape == (5, 3)


def test_comp6_drugbank(tmp_path):
    from torchmdnet_tpu.datasets import DrugBank

    rng = np.random.RandomState(4)
    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    with h5py.File(raw_dir / "drugbank_testset.h5", "w") as f:
        g = f.create_group("drugbank")
        mol = g.create_group("m0")
        mol["species"] = np.array([b"C", b"N", b"O"])
        mol["coordinates"] = rng.randn(2, 3, 3).astype(np.float32)
        mol["energies"] = rng.randn(2)
        mol["forces"] = rng.randn(2, 3, 3).astype(np.float32)
    ds = DrugBank(str(tmp_path))
    assert len(ds) == 2
    # gradients negated to forces
    s = ds[0]
    assert s["neg_dy"].shape == (3, 3)


def test_maceoff_tar(tmp_path):
    from torchmdnet_tpu.datasets import MACEOFF

    raw_dir = tmp_path / "raw" / "maceoff" / "1.0"
    os.makedirs(raw_dir)
    xyz = (
        "3\n"
        'Properties=species:S:1:pos:R:3 energy=-12.5 pbc="F F F"\n'
        "O 0.0 0.0 0.0 0.1 0.2 0.3 0 0 0\n"
        "H 0.9 0.0 0.0 -0.1 0.0 0.0 0 0 0\n"
        "H 0.0 0.9 0.0 0.0 -0.2 0.0 0 0 0\n"
    )
    xyz_path = tmp_path / "frame.xyz"
    xyz_path.write_text(xyz)
    with tarfile.open(raw_dir / "train_large_neut_no_bad_clean.tar.gz",
                      "w:gz") as tar:
        tar.add(xyz_path, arcname="frame.xyz")
    ds = MACEOFF(str(tmp_path), version="1.0")
    assert len(ds) == 1
    s = ds[0]
    np.testing.assert_array_equal(s["z"], [8, 1, 1])
    np.testing.assert_allclose(float(s["y"].reshape(())), -12.5)


def test_genentech_sdf(tmp_path):
    from torchmdnet_tpu.datasets import GenentechTorsions

    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    sdf = (
        "mol1\n  prog\ncomment\n"
        "  2  1  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0\n"
        "    1.5000    0.0000    0.0000 O   0  0\n"
        "  1  2  1  0\nM  END\n"
        ">  <MinMethod>\nCCSD_T_CBS_MP2\n\n"
        ">  <deltaE>\n2.5\n\n"
        ">  <Number>\n7\n\n"
        "$$$$\n"
    )
    path = raw_dir / ("QM_MM_Gas_Phase_Torsion_Scan_Individual_Results_"
                      "with_CCSD_T_CBS_baseline.sdf")
    path.write_text(sdf)
    ds = GenentechTorsions(str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    np.testing.assert_array_equal(s["z"], [6, 8])
    np.testing.assert_allclose(
        float(s["y"].reshape(())), 2.5 * 0.0433641153087705, rtol=1e-6
    )
