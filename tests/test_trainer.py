"""Training-harness smoke (reference tests/test_module.py: short Lightning
fit on DummyDataset): losses drop, metrics.csv written, checkpoints appear,
exported .ckpt reloads through the reference-compat loader."""

import os

import numpy as np
import pytest

from torchmdnet_tpu.data.datamodule import DataModule
from torchmdnet_tpu.models.model import create_model, load_model
from torchmdnet_tpu.train.trainer import Trainer
from utils_dummy import DummyDataset

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _hparams(tmp_path, **kw):
    hp = dict(
        model="tensornet",
        embedding_dimension=16,
        num_layers=1,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=100,
        max_num_neighbors=16,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
        batch_size=4,
        inference_batch_size=4,
        lr=1e-3,
        lr_patience=5,
        lr_min=1e-7,
        lr_factor=0.5,
        lr_warmup_steps=2,
        weight_decay=0.0,
        y_weight=1.0,
        neg_dy_weight=1.0,
        train_loss="mse_loss",
        ema_alpha_y=1.0,
        ema_alpha_neg_dy=1.0,
        num_epochs=3,
        save_interval=1,
        early_stopping_patience=30,
        seed=0,
        train_size=12,
        val_size=4,
        test_size=4,
        log_dir=str(tmp_path),
        standardize=False,
        dataset=None,
        splits=None,
    )
    hp.update(kw)
    return hp


def test_fit_smoke_and_checkpoint_roundtrip(tmp_path):
    hp = _hparams(tmp_path)
    ds = DummyDataset(num_samples=20)
    dm = DataModule(hp, dataset=ds)
    dm.setup("fit")
    pot = create_model(hp)
    trainer = Trainer(pot, hp, dm)
    trainer.fit()

    assert os.path.exists(tmp_path / "metrics.csv")
    rows = open(tmp_path / "metrics.csv").read().splitlines()
    assert len(rows) >= 3  # header + epochs
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert len(ckpts) >= 2  # epoch ckpts + best.ckpt

    results = trainer.test()
    assert np.isfinite(results["test_y_l1_loss"])

    # exported checkpoint reloads through the reference-compat loader
    pot2, variables2 = load_model(str(tmp_path / "best.ckpt"))
    import jax
    import jax.numpy as jnp

    s = ds[0]
    n = len(s["z"])
    y, f = pot2.apply(
        variables2,
        jnp.asarray(s["z"].astype(np.int32)),
        jnp.asarray(s["pos"]),
        jnp.zeros(n, jnp.int32),
        num_mols=1,
    )
    assert np.isfinite(np.asarray(y)).all()
    assert f.shape == (n, 3)


def test_fit_with_prefetch_matches_sync(tmp_path):
    """num_workers>0 enables the background prefetch thread; training must
    produce bit-identical metrics to the synchronous path."""
    import shutil

    metrics = {}
    for tag, workers in (("sync", 0), ("prefetch", 2)):
        log_dir = tmp_path / tag
        os.makedirs(log_dir, exist_ok=True)
        hp = _hparams(tmp_path, num_workers=workers, num_epochs=2)
        hp["log_dir"] = str(log_dir)
        ds = DummyDataset(num_samples=20)
        dm = DataModule(hp, dataset=ds)
        dm.setup("fit")
        pot = create_model(hp)
        Trainer(pot, hp, dm).fit()
        metrics[tag] = open(log_dir / "metrics.csv").read()
        shutil.rmtree(log_dir)
    assert metrics["sync"] == metrics["prefetch"]


def test_exported_ckpt_matches_reference_model(tmp_path):
    """Checkpoints we export must load into the *reference torch* framework
    and produce the same energies (bidirectional compatibility)."""
    import torch

    import reference_oracle

    reference_oracle.install()
    from torchmdnet.models.model import create_model as ref_create_model

    import jax
    import jax.numpy as jnp

    hp = _hparams(tmp_path)
    ds = DummyDataset(num_samples=20)
    dm = DataModule(hp, dataset=ds)
    dm.setup("fit")
    pot = create_model(hp)
    trainer = Trainer(pot, hp, dm)
    first = next(iter(dm.train_dataloader()))
    trainer._init_state(first)
    trainer._save_checkpoint(0, 1.0)

    path = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")][0]
    ckpt = torch.load(str(tmp_path / path), map_location="cpu",
                      weights_only=False)
    ref = ref_create_model(ckpt["hyper_parameters"])
    sd = {k.replace("model.", "", 1): v for k, v in ckpt["state_dict"].items()}
    ref.load_state_dict(sd)
    ref.eval()

    s = ds[0]
    n = len(s["z"])
    pos_t = torch.tensor(s["pos"], requires_grad=True)
    y_ref, f_ref = ref(torch.tensor(s["z"]), pos_t, torch.zeros(n).long())

    y, f = pot.apply(
        {"params": trainer.state.params},
        jnp.asarray(s["z"].astype(np.int32)),
        jnp.asarray(s["pos"]),
        jnp.zeros(n, jnp.int32),
        num_mols=1,
    )
    np.testing.assert_allclose(
        np.asarray(y), y_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f), f_ref.detach().numpy(), rtol=1e-3, atol=1e-4
    )


def test_plateau_scheduler_matches_torch():
    """Plateau controller reproduces torch ReduceLROnPlateau (mode=min,
    default threshold=1e-4 rel / cooldown=0 — the reference LNNP's config,
    module.py:131-137) on a noisy recorded metric sequence."""
    import torch

    from torchmdnet_tpu.train.trainer import ReduceLROnPlateau

    rng = np.random.RandomState(0)
    # slowly-decaying metric with noise smaller than the relative
    # threshold — exactly the regime where strict-< diverges from torch
    metrics = list(1.0 - 1e-5 * np.arange(60) + 1e-6 * rng.randn(60))
    metrics += [0.5, 0.5 + 1e-6, 0.5 - 1e-6, 0.49] * 5

    for factor, patience, cooldown in [(0.8, 3, 0), (0.5, 2, 2)]:
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=factor, patience=patience,
            cooldown=cooldown, min_lr=1e-6,
        )
        ours = ReduceLROnPlateau(factor=factor, patience=patience,
                                 cooldown=cooldown, min_lr=1e-6)
        lr = 0.1
        for i, m in enumerate(metrics):
            tsched.step(m)
            lr = ours.step(m, lr)
            torch_lr = opt.param_groups[0]["lr"]
            assert np.isclose(lr, torch_lr, rtol=1e-12), (
                f"step {i}: ours={lr} torch={torch_lr} "
                f"(factor={factor}, patience={patience})"
            )
