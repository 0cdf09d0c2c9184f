"""Training orchestration (the reference's Lightning Trainer + LNNP
equivalents, ``torchmdnet/module.py`` / ``scripts/train.py:182-279``):

* epoch loop over padded static-shape batches, one jitted train step,
* val loop recording l1 + train-loss metrics with the reference's
  ``{stage}_{type}_{loss}`` naming, epoch-mean aggregation,
* ReduceLROnPlateau on the monitored metric (factor/patience/min_lr),
  manual LR warmup inside the step,
* EarlyStopping, top-k checkpointing (reference ModelCheckpoint top-10),
* CSV metrics logging (reference CSVLogger; old metrics.csv backed up),
* checkpoints saved as reference-loadable torch ``.ckpt`` plus a native
  msgpack sidecar carrying the optimizer state for exact resume.
"""

import csv
import os
import pickle
import time
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.train.step import (
    TrainState,
    create_train_state,
    make_train_step,
)


def prefetch_to_device(iterator, size=2):
    """Run ``iterator`` in a background thread, keeping up to ``size``
    ready batches queued. Host-side collation (padding / memmap packing)
    overlaps with the device step; jnp.asarray transfers are issued
    ahead of use so the device never waits on PCIe (the reference gets
    this from torch DataLoader ``num_workers``; here one thread suffices
    because collation is numpy/C, which releases the GIL)."""
    import queue
    import threading

    q = queue.Queue(maxsize=max(1, size))
    sentinel = object()
    errors = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # surface in consumer
            errors.append(exc)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if errors:
                raise errors[0]
            return
        yield item


class CSVLogger:
    """metrics.csv logger; backs up a pre-existing file with a timestamp
    (reference ``utils.py:408-417``)."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.csv")
        if os.path.exists(self.path):
            backup = self.path + f".bak-{int(time.time())}"
            os.rename(self.path, backup)
        self._fieldnames = None

    def log(self, metrics: dict):
        metrics = {k: (float(v) if hasattr(v, "item") or isinstance(
            v, (int, float, np.floating)) else v) for k, v in metrics.items()}
        write_header = self._fieldnames is None
        if write_header:
            self._fieldnames = list(metrics.keys())
        with open(self.path, "a", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=self._fieldnames,
                                    extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow(metrics)


class ReduceLROnPlateau:
    """Host-side plateau controller with torch's full mode=min semantics
    (torch/optim/lr_scheduler.py ReduceLROnPlateau): an epoch only counts
    as an improvement when the metric beats ``best`` by ``threshold``
    (relative by default, 1e-4), and a ``cooldown`` window after each
    reduction suppresses the bad-epoch counter. The reference's LNNP
    uses torch defaults for both (``module.py:131-137``)."""

    def __init__(self, factor=0.8, patience=10, min_lr=1e-6,
                 threshold=1e-4, threshold_mode="rel", cooldown=0):
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"unknown threshold_mode {threshold_mode!r}")
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.best = float("inf")
        self.bad_epochs = 0

    def _is_better(self, metric):
        if self.threshold_mode == "rel":
            return metric < self.best * (1.0 - self.threshold)
        return metric < self.best - self.threshold

    def step(self, metric, lr):
        if self._is_better(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.bad_epochs = 0
        if self.bad_epochs > self.patience:
            self.cooldown_counter = self.cooldown
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr


class EarlyStopping:
    def __init__(self, patience=30):
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric):
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


class Trainer:
    def __init__(self, potential, hparams: dict, datamodule):
        self.potential = potential
        self.hp = dict(hparams)
        self.dm = datamodule
        self.log_dir = self.hp.get("log_dir", "/tmp/logs")
        # CSV always on; W&B / TensorBoard opt-in (reference
        # scripts/train.py:229-246), gated on package availability.
        self.logger = CSVLogger(self.log_dir)
        self.extra_loggers = []
        if self.hp.get("wandb_use"):
            try:
                import wandb

                wandb.init(
                    project=self.hp.get("wandb_project", "training_"),
                    name=self.hp.get("wandb_name", "training"),
                    id=self.hp.get("wandb_resume_from_id"),
                    resume="must" if self.hp.get("wandb_resume_from_id")
                    else None,
                    config=self.hp,
                )
                self.extra_loggers.append(lambda row: wandb.log(row))
            except ImportError:
                import warnings

                warnings.warn("wandb_use=True but wandb is not installed")
        if self.hp.get("tensorboard_use"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                writer = SummaryWriter(self.log_dir)

                def tb_log(row, _w=writer):
                    step = int(row.get("epoch", 0))
                    for k, v in row.items():
                        if isinstance(v, (int, float)):
                            _w.add_scalar(k, v, step)

                self.extra_loggers.append(tb_log)
            except ImportError:
                import warnings

                warnings.warn(
                    "tensorboard_use=True but tensorboard is not installed"
                )
        self.plateau = ReduceLROnPlateau(
            factor=self.hp.get("lr_factor", 0.8),
            patience=self.hp.get("lr_patience", 10),
            min_lr=self.hp.get("lr_min", 1e-6),
        )
        self.early = EarlyStopping(self.hp.get("early_stopping_patience", 30))
        self.monitor = self.hp.get(
            "checkpoint_monitor",
            f"val_total_{self.hp.get('train_loss', 'mse_loss')}",
        )
        self.best_ckpts = []  # (metric, path), keep top-10
        self.best_metric = float("inf")
        self.dropped_batches = 0  # DP remainder batches dropped this run
        self.state: Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None
        # data parallelism: ngpus device replicas (reference: Lightning DDP,
        # scripts/train.py:252-258); -1 = all local devices, 1 = off
        ngpus = int(self.hp.get("ngpus", 1) or 1)
        avail = len(jax.devices())
        self.n_devices = avail if ngpus == -1 else min(max(ngpus, 1), avail)

    # -- setup ----------------------------------------------------------
    def _init_state(self, example_batch):
        # a DP group needs n_devices batches per step; degrade to
        # single-device for tiny datasets
        if self.n_devices > 1:
            n_batches = len(self.dm.train_dataloader())
            if n_batches < self.n_devices:
                import warnings

                warnings.warn(
                    f"only {n_batches} train batches per epoch < "
                    f"{self.n_devices} devices; running single-device"
                )
                self.n_devices = 1
        pot = self.potential
        num_mols = int(self.hp["batch_size"])
        variables = pot.init(
            jax.random.PRNGKey(self.hp.get("seed", 1)),
            jnp.asarray(example_batch["z"]),
            jnp.asarray(example_batch["pos"]),
            jnp.asarray(example_batch["batch"]),
            num_mols=num_mols,
            q=jnp.asarray(example_batch["q"]) if "q" in example_batch else None,
        )
        if self.hp.get("load_weights"):
            from torchmdnet_tpu.utils.torch_ckpt import (
                apply_reference_compat,
                convert_state_dict,
                read_torch_checkpoint,
            )
            from flax.core import unfreeze

            hparams, sd = read_torch_checkpoint(self.hp["load_weights"])
            sd = apply_reference_compat(sd, self.hp, hparams, {})
            params = convert_state_dict(
                sd, jax.tree.map(np.asarray, unfreeze(variables["params"]))
            )
            variables = {"params": jax.tree.map(jnp.asarray, params)}
        self.state = create_train_state(
            variables["params"],
            lr=self.hp["lr"],
            weight_decay=self.hp.get("weight_decay", 0.0),
            gradient_clipping=self.hp.get("gradient_clipping", 0.0) or 0.0,
        )
        step_kwargs = dict(
            num_mols=num_mols,
            lr=self.hp["lr"],
            weight_decay=self.hp.get("weight_decay", 0.0),
            y_weight=self.hp.get("y_weight", 1.0),
            neg_dy_weight=self.hp.get("neg_dy_weight", 1.0),
            lr_warmup_steps=self.hp.get("lr_warmup_steps", 0),
            ema_alpha_y=self.hp.get("ema_alpha_y", 1.0),
            ema_alpha_neg_dy=self.hp.get("ema_alpha_neg_dy", 1.0),
            train_loss=self.hp.get("train_loss", "mse_loss"),
            gradient_clipping=self.hp.get("gradient_clipping", 0.0) or 0.0,
        )
        if self.n_devices > 1:
            from torchmdnet_tpu.parallel.dp import (
                make_data_parallel_train_step,
                make_mesh,
            )

            self._mesh = make_mesh(self.n_devices)
            self._train_step = make_data_parallel_train_step(
                pot, self._mesh, **step_kwargs
            )
        else:
            step = make_train_step(pot, **step_kwargs)
            self._train_step = jax.jit(step, donate_argnums=0)

        def eval_step(params, batch, loss_name):
            from torchmdnet_tpu.train.step import compute_losses

            ly, lneg, _ = compute_losses(
                pot, params, batch, num_mols, loss_name
            )
            return ly, lneg

        self._eval_fns = {
            name: jax.jit(lambda p, b, n=name: eval_step(p, b, n))
            for name in ("l1_loss", self.hp.get("train_loss", "mse_loss"))
        }

    def _iter_train(self, loader):
        """Yield device batches; with n_devices > 1, stack per-device
        batches along a leading axis and shard over the mesh."""
        if self.n_devices == 1:
            for batch in loader:
                yield self._to_device_batch(batch)
            return
        from torchmdnet_tpu.parallel.dp import shard_batch

        group = []
        for batch in loader:
            group.append(batch)
            if len(group) == self.n_devices:
                stacked = {
                    k: jnp.stack([jnp.asarray(b[k]) for b in group])
                    for k in group[0]
                }
                yield shard_batch(self._mesh, stacked)
                group = []
        if group:
            # remainder dropped (replicas must stay in lockstep); surface
            # the loss so silent data starvation is visible in logs
            self.dropped_batches += len(group)
            import warnings

            warnings.warn(
                f"data-parallel epoch dropped {len(group)} remainder "
                f"batch(es) (< {self.n_devices} device group); "
                f"{self.dropped_batches} dropped so far this run"
            )

    def _to_device_batch(self, batch):
        out = {}
        for k, v in batch.items():
            if k == "mol_mask":
                out[k] = jnp.asarray(v)
            elif isinstance(v, np.ndarray):
                out[k] = jnp.asarray(v)
            else:
                out[k] = v
        return out

    # -- loops ----------------------------------------------------------
    def fit(self):
        hp = self.hp
        train_loader = self.dm.train_dataloader()
        val_loader = self.dm.val_dataloader()
        first = next(iter(train_loader))
        if self.state is None:
            self._init_state(first)

        y_w = hp.get("y_weight", 1.0)
        negdy_w = hp.get("neg_dy_weight", 1.0)
        train_loss_name = hp.get("train_loss", "mse_loss")
        num_epochs = hp.get("num_epochs", 300)

        for epoch in range(num_epochs):
            train_loader.set_epoch(epoch)
            # train
            tmetrics = defaultdict(list)
            last_lr = self.state.base_lr
            batches = self._iter_train(train_loader)
            n_prefetch = int(self.hp.get("num_workers", 0) or 0)
            if n_prefetch > 0:
                batches = prefetch_to_device(batches, size=min(n_prefetch, 4))
            for batch in batches:
                self.state, metrics = self._train_step(
                    self.state, batch
                )
                tmetrics["loss"].append(metrics["loss"])
                tmetrics["loss_y"].append(metrics["loss_y"])
                tmetrics["loss_neg_dy"].append(metrics["loss_neg_dy"])
                last_lr = metrics["lr"]
            # val
            vmetrics = defaultdict(list)
            for batch in val_loader:
                db = self._to_device_batch(batch)
                for name, fn in self._eval_fns.items():
                    ly, lneg = fn(self.state.params, db)
                    vmetrics[f"y_{name}"].append(ly)
                    vmetrics[f"neg_dy_{name}"].append(lneg)
                    vmetrics[f"total_{name}"].append(
                        y_w * ly + negdy_w * lneg
                    )

            row = {
                "epoch": float(epoch),
                "lr": float(jax.device_get(last_lr)),
            }
            for key in ("loss", "loss_y", "loss_neg_dy"):
                row[f"train_{'total' if key == 'loss' else key[5:]}_"
                    f"{train_loss_name}"] = float(
                    np.mean(jax.device_get(tmetrics[key]))
                )
            for key, vals in vmetrics.items():
                row[f"val_{key}"] = float(np.mean(jax.device_get(vals)))

            # periodic in-training test pass (reference val-as-test trick,
            # module.py:161-177 / data.py:86-93)
            test_interval = hp.get("test_interval", -1) or -1
            if (
                test_interval > 0
                and epoch > 0
                and epoch % test_interval == 0
            ):
                tst = defaultdict(list)
                for batch in self.dm.test_dataloader():
                    db = self._to_device_batch(batch)
                    ly, lneg = self._eval_fns["l1_loss"](
                        self.state.params, db
                    )
                    tst["test_y_l1_loss"].append(ly)
                    tst["test_neg_dy_l1_loss"].append(lneg)
                for key, vals in tst.items():
                    row[key] = float(np.mean(jax.device_get(vals)))
            self.logger.log(row)
            for log_fn in self.extra_loggers:
                log_fn(row)

            monitor_val = row.get(self.monitor, row.get(
                f"val_total_{train_loss_name}", row[
                    f"train_total_{train_loss_name}"]))

            # plateau LR on the monitored metric (epoch cadence)
            lr_metric_stage = hp.get("lr_metric", "val")
            lr_monitor = row.get(
                f"{lr_metric_stage}_total_{train_loss_name}", monitor_val
            )
            new_lr = self.plateau.step(lr_monitor, float(self.state.base_lr))
            if new_lr != float(self.state.base_lr):
                self.state = self.state._replace(
                    base_lr=jnp.asarray(new_lr, jnp.float32)
                )

            # checkpointing
            save_interval = hp.get("save_interval", 10)
            if (epoch + 1) % max(save_interval, 1) == 0 or epoch == (
                num_epochs - 1
            ):
                self._save_checkpoint(epoch, monitor_val)
            self._save_checkpoint(epoch, monitor_val, best_only=True)

            if self.early.step(monitor_val):
                print(f"Early stopping at epoch {epoch}")
                break
            if float(self.state.base_lr) < hp.get("lr_min", 1e-6):
                print(f"LR below lr_min at epoch {epoch}; stopping")
                break
        return self.state

    def test(self, loader=None):
        loader = loader or self.dm.test_dataloader()
        metrics = defaultdict(list)
        for batch in loader:
            db = self._to_device_batch(batch)
            ly, lneg = self._eval_fns["l1_loss"](self.state.params, db)
            metrics["test_y_l1_loss"].append(ly)
            metrics["test_neg_dy_l1_loss"].append(lneg)
        out = {k: float(np.mean(jax.device_get(v)))
               for k, v in metrics.items()}
        self.logger.log({"epoch": -1.0, "lr": 0.0, **out})
        return out

    # -- checkpointing ----------------------------------------------------
    def _save_checkpoint(self, epoch, monitor_val, best_only=False):
        from torchmdnet_tpu.utils.torch_ckpt import save_torch_checkpoint

        if best_only:
            if monitor_val >= self.best_metric:
                return
            self.best_metric = monitor_val
            path = os.path.join(self.log_dir, "best.ckpt")
        else:
            path = os.path.join(
                self.log_dir,
                f"epoch={epoch}-{self.monitor}={monitor_val:.6f}.ckpt",
            )
        save_torch_checkpoint(
            path,
            self.potential,
            {"params": jax.device_get(self.state.params)},
            hparams=self.hp,
        )
        # native sidecar with full optimizer state for exact resume
        with open(path + ".native", "wb") as fh:
            pickle.dump(
                {
                    "params": jax.device_get(self.state.params),
                    "opt_state": jax.device_get(self.state.opt_state),
                    "step": int(self.state.step),
                    "base_lr": float(self.state.base_lr),
                    "hparams": self.hp,
                },
                fh,
            )
        if best_only:
            return
        else:
            self.best_ckpts.append((monitor_val, path))
            self.best_ckpts.sort(key=lambda t: t[0])
            # keep top-10 epoch checkpoints (reference ModelCheckpoint)
            for _, old in self.best_ckpts[10:]:
                if os.path.exists(old) and "best" not in old:
                    os.remove(old)
                    if os.path.exists(old + ".native"):
                        os.remove(old + ".native")
            self.best_ckpts = self.best_ckpts[:10]
