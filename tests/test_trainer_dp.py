"""Trainer with ngpus>1: data-parallel fit over the virtual CPU mesh."""

import numpy as np
import pytest

import jax

from torchmdnet_tpu.data.datamodule import DataModule
from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.train.trainer import Trainer
from utils_dummy import DummyDataset

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def test_dp_trainer_fit(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    hp = dict(
        model="tensornet", embedding_dimension=16, num_layers=1, num_rbf=8,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=100, max_num_neighbors=16,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        batch_size=2, inference_batch_size=2, lr=1e-3, lr_patience=5,
        lr_min=1e-7, lr_factor=0.5, lr_warmup_steps=0, weight_decay=0.0,
        y_weight=1.0, neg_dy_weight=1.0, train_loss="mse_loss",
        ema_alpha_y=1.0, ema_alpha_neg_dy=1.0, num_epochs=2,
        save_interval=10, early_stopping_patience=30, seed=0,
        train_size=16, val_size=2, test_size=2, log_dir=str(tmp_path),
        standardize=False, dataset=None, splits=None,
        ngpus=4,
    )
    ds = DummyDataset(num_samples=20)
    dm = DataModule(hp, dataset=ds)
    dm.setup("fit")
    pot = create_model(hp)
    trainer = Trainer(pot, hp, dm)
    assert trainer.n_devices == 4
    trainer.fit()
    results = trainer.test()
    assert np.isfinite(results["test_y_l1_loss"])
