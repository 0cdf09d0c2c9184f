"""DataModule (reference ``torchmdnet/data.py:18-176``): dataset
instantiation by name, split handling with ``splits.npz``, cached padded
loaders, and the (deprecated) ``standardize`` mean/std computation with
Atomref removal."""

import os
import warnings
from typing import Optional

import numpy as np

from torchmdnet_tpu import datasets as datasets_pkg
from torchmdnet_tpu.data.collate import PaddedLoader
from torchmdnet_tpu.data.splits import make_splits
from torchmdnet_tpu.datasets.memdataset import Subset


class MissingEnergyException(Exception):
    pass


class DataModule:
    def __init__(self, hparams: dict, dataset=None):
        self.hparams = dict(hparams)
        self._mean = None
        self._std = None
        self._loaders = {}
        self.dataset = dataset

    def setup(self, stage: Optional[str] = None):
        hp = self.hparams
        if self.dataset is None:
            if hp["dataset"] == "Custom":
                self.dataset = datasets_pkg.Custom(
                    hp["coord_files"],
                    hp["embed_files"],
                    hp["energy_files"],
                    hp["force_files"],
                    hp.get("dataset_preload_limit", 1024),
                )
            else:
                dataset_arg = dict(hp.get("dataset_arg") or {})
                if hp["dataset"] == "HDF5":
                    dataset_arg["dataset_preload_limit"] = hp.get(
                        "dataset_preload_limit", 1024
                    )
                    self.dataset = datasets_pkg.HDF5(
                        hp["dataset_root"], **dataset_arg
                    )
                else:
                    self.dataset = getattr(datasets_pkg, hp["dataset"])(
                        hp["dataset_root"], **dataset_arg
                    )

        split_file = (
            os.path.join(hp["log_dir"], "splits.npz")
            if hp.get("log_dir")
            else None
        )
        self.idx_train, self.idx_val, self.idx_test = make_splits(
            len(self.dataset),
            hp["train_size"],
            hp["val_size"],
            hp["test_size"],
            hp["seed"],
            split_file,
            hp.get("splits"),
        )
        print(
            f"train {len(self.idx_train)}, val {len(self.idx_val)}, "
            f"test {len(self.idx_test)}"
        )
        self.train_dataset = Subset(self.dataset, self.idx_train)
        self.val_dataset = Subset(self.dataset, self.idx_val)
        self.test_dataset = Subset(self.dataset, self.idx_test)

        if hp.get("standardize"):
            warnings.warn(
                "The standardize option is deprecated and will be removed "
                "in the future.",
                DeprecationWarning,
            )
            self._standardize()

    @property
    def atomref(self):
        if hasattr(self.dataset, "get_atomref"):
            return self.dataset.get_atomref()
        return None

    @property
    def mean(self):
        return self._mean

    @property
    def std(self):
        return self._std

    def _loader(self, dataset, stage, indices=None):
        key = stage
        if key in self._loaders:
            return self._loaders[key]
        bs = (
            self.hparams["batch_size"]
            if stage == "train"
            else self.hparams.get("inference_batch_size",
                                  self.hparams["batch_size"])
        )
        loader = PaddedLoader(
            dataset,
            batch_size=bs,
            shuffle=(stage == "train"),
            seed=self.hparams.get("seed", 0),
            max_atoms=self.hparams.get("max_num_atoms_per_batch"),
        )
        self._loaders[key] = loader
        return loader

    def train_dataloader(self):
        return self._loader(self.train_dataset, "train")

    def val_dataloader(self):
        return self._loader(self.val_dataset, "val")

    def test_dataloader(self):
        return self._loader(self.test_dataset, "test")

    def _standardize(self):
        """Mean/std of train energies, minus atomrefs when the Atomref prior
        is configured (reference ``data.py:146-176``)."""
        atomref = (
            self.atomref
            if self.hparams.get("prior_model") == "Atomref"
            else None
        )
        ys = []
        for i in self.idx_train:
            sample = self.dataset[int(i)]
            if "y" not in sample or sample["y"] is None:
                warnings.warn(
                    "Standardize is true but failed to compute dataset mean "
                    "and standard deviation. Maybe the dataset only contains "
                    "forces."
                )
                return
            y = float(np.asarray(sample["y"]).reshape(()))
            if atomref is not None:
                y -= float(
                    np.asarray(atomref).reshape(-1)[
                        np.asarray(sample["z"]).reshape(-1)
                    ].sum()
                )
            ys.append(y)
        ys = np.asarray(ys)
        self._mean = float(ys.mean())
        self._std = float(ys.std(ddof=1))
