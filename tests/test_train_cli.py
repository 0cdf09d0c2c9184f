"""End-to-end CLI test: tmdnet-train main() with a YAML config on a
synthetic HDF5 dataset (analogue of reference tests/test_examples.py +
train-script smoke)."""

import os

import h5py
import numpy as np
import yaml

import pytest
pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _write_h5(path, nsamples=12, natoms=6):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("g0")
        grp["types"] = rng.randint(1, 9, natoms)
        grp["pos"] = rng.randn(nsamples, natoms, 3).astype(np.float32)
        grp["energy"] = rng.randn(nsamples).astype(np.float32)
        grp["forces"] = rng.randn(nsamples, natoms, 3).astype(np.float32)


def test_cli_trains_from_yaml(tmp_path):
    h5path = str(tmp_path / "data.h5")
    _write_h5(h5path)
    log_dir = str(tmp_path / "logs")
    conf = dict(
        model="tensornet",
        dataset="HDF5",
        dataset_root=h5path,
        embedding_dimension=16,
        num_layers=1,
        num_rbf=8,
        num_epochs=2,
        batch_size=4,
        inference_batch_size=4,
        derivative=True,
        train_size=8,
        val_size=2,
        test_size=2,
        lr=1e-3,
        log_dir=log_dir,
        save_interval=1,
        max_num_neighbors=8,
        max_z=20,
        seed=0,
    )
    conf_path = str(tmp_path / "conf.yaml")
    with open(conf_path, "w") as fh:
        yaml.dump(conf, fh)

    from torchmdnet_tpu.train.train import main

    results = main(["--conf", conf_path])
    assert np.isfinite(results["test_y_l1_loss"])
    assert os.path.exists(os.path.join(log_dir, "metrics.csv"))
    assert os.path.exists(os.path.join(log_dir, "input.yaml"))
    assert os.path.exists(os.path.join(log_dir, "splits.npz"))
    assert any(f.endswith(".ckpt") for f in os.listdir(log_dir))


def test_example_yamls_parse():
    """All shipped example YAMLs must be consumable by the arg parser
    (reference tests/test_examples.py:17)."""
    import glob

    from torchmdnet_tpu.utils.config import get_argparse

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    examples = glob.glob(os.path.join(here, "examples", "*.yaml"))
    assert examples
    parser = get_argparse()
    for path in examples:
        with open(path) as fh:
            config = yaml.safe_load(fh)
        known = set(vars(parser.parse_args([]))) | {"conf"}
        unknown = set(config) - known
        assert not unknown, f"{path}: unknown keys {unknown}"
    # full reference recipe coverage (11 recipes, VERDICT round-1 item 7)
    names = {os.path.basename(p) for p in examples}
    expected = {
        "ET-ANI1.yaml", "ET-MD17.yaml", "ET-QM9.yaml", "ET-SPICE.yaml",
        "TensorNet-ANI1X.yaml", "TensorNet-ANI2X.yaml",
        "TensorNet-MACEOFF.yaml", "TensorNet-QM9.yaml",
        "TensorNet-SPICE.yaml", "TensorNet-rMD17.yaml",
        "TensorNet2-AceFF.yaml",
    }
    missing = expected - names
    assert not missing, f"missing example recipes: {missing}"


def test_cli_resume_from_checkpoint(tmp_path):
    h5path = str(tmp_path / "data.h5")
    _write_h5(h5path)
    log_dir = str(tmp_path / "logs")
    conf = dict(
        model="tensornet", dataset="HDF5", dataset_root=h5path,
        embedding_dimension=16, num_layers=1, num_rbf=8, num_epochs=2,
        batch_size=4, inference_batch_size=4, derivative=True,
        train_size=8, val_size=2, test_size=2, lr=1e-3, log_dir=log_dir,
        save_interval=1, max_num_neighbors=8, max_z=20, seed=0,
    )
    conf_path = str(tmp_path / "conf.yaml")
    with open(conf_path, "w") as fh:
        yaml.dump(conf, fh)

    from torchmdnet_tpu.train.train import main

    main(["--conf", conf_path])
    best = os.path.join(log_dir, "best.ckpt")
    assert os.path.exists(best) and os.path.exists(best + ".native")

    # resume: optimizer state + step restored from the sidecar
    log_dir2 = str(tmp_path / "logs2")
    results = main([
        "--conf", conf_path, "--load-model", best,
        "--log-dir", log_dir2, "--num-epochs", "1",
    ])
    import numpy as np

    assert np.isfinite(results["test_y_l1_loss"])
