"""DataModule semantics (reference tests/test_datamodule.py): standardize
mean/std with and without Atomref removal."""

import numpy as np
import pytest

from torchmdnet_tpu.data.datamodule import DataModule
from utils_dummy import DummyDataset


def _hp(**kw):
    hp = dict(
        dataset=None, batch_size=4, inference_batch_size=4, seed=0,
        train_size=12, val_size=4, test_size=4, log_dir=None, splits=None,
        standardize=True, prior_model=None,
    )
    hp.update(kw)
    return hp


@pytest.mark.parametrize("remove_atomref", [False, True])
def test_standardize(remove_atomref):
    ds = DummyDataset(num_samples=20, has_atomref=True)
    hp = _hp(prior_model="Atomref" if remove_atomref else None)
    dm = DataModule(hp, dataset=ds)
    dm.setup("fit")

    expected = []
    atomref = ds.get_atomref() if remove_atomref else None
    for i in dm.idx_train:
        s = ds[int(i)]
        y = float(np.asarray(s["y"]).reshape(()))
        if atomref is not None:
            y -= float(atomref[s["z"], 0].sum())
        expected.append(y)
    expected = np.asarray(expected)
    np.testing.assert_allclose(dm.mean, expected.mean(), rtol=1e-6)
    np.testing.assert_allclose(dm.std, expected.std(ddof=1), rtol=1e-6)


def test_atomref_property():
    ds = DummyDataset(num_samples=20, has_atomref=True)
    dm = DataModule(_hp(standardize=False), dataset=ds)
    dm.setup("fit")
    assert dm.atomref is not None
    assert dm.atomref.shape == (100, 1)

    ds2 = DummyDataset(num_samples=20, has_atomref=False)
    dm2 = DataModule(_hp(standardize=False), dataset=ds2)
    dm2.setup("fit")
    assert dm2.atomref is None
