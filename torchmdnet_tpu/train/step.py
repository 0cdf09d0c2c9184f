"""Jittable training step (reference ``torchmdnet/module.py`` LNNP).

The reference wraps the model in a LightningModule with AdamW +
ReduceLROnPlateau, manual LR warmup inside ``optimizer_step``
(``module.py:295-307``), weighted y/neg_dy losses (``:282-291``) and
per-loss-type EMA smoothing (``:224-240``, note the EMA-smoothed loss *is*
backpropagated, scaling gradients by α).  Here the whole step — forward,
force grad, loss, EMA, warmup, AdamW update — is one pure function that
jits and shards.
"""

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from torchmdnet_tpu.train.loss import LOSS_FUNCTIONS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 global step
    base_lr: jnp.ndarray  # plateau-scheduled LR (warmup applied on top)
    ema_y: jnp.ndarray  # EMA of the y train loss (-1 = uninitialized)
    ema_neg_dy: jnp.ndarray


def make_optimizer(weight_decay: float, gradient_clipping: float = 0.0):
    """AdamW with injected learning rate (reference ``module.py:120-127``);
    optional global-norm gradient clipping (reference
    ``scripts/train.py:263`` Trainer(gradient_clip_val=...))."""
    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, weight_decay=weight_decay
    )
    if gradient_clipping and gradient_clipping > 0:
        return optax.chain(
            optax.clip_by_global_norm(gradient_clipping), adamw
        )
    return adamw


def create_train_state(params, *, lr: float, weight_decay: float = 0.0,
                       gradient_clipping: float = 0.0):
    opt = make_optimizer(weight_decay, gradient_clipping)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
        base_lr=jnp.asarray(lr, jnp.float32),
        ema_y=jnp.asarray(-1.0, jnp.float32),
        ema_neg_dy=jnp.asarray(-1.0, jnp.float32),
    )


def compute_losses(
    potential,
    params,
    batch: Dict[str, jnp.ndarray],
    num_mols: int,
    loss_fn_name: str = "mse_loss",
):
    """Weighted y / neg_dy losses on one padded batch.

    ``batch`` keys: z [N], pos [N,3], batch [N], mol_mask [B] (+ optional
    y [B,1], neg_dy [N,3], q [B], s [B], box, extra args).
    """
    loss_fn = LOSS_FUNCTIONS[loss_fn_name]
    y, neg_dy = potential.apply(
        {"params": params},
        batch["z"],
        batch["pos"],
        batch["batch"],
        num_mols=num_mols,
        box=batch.get("box"),
        q=batch.get("q"),
        s=batch.get("s"),
        extra_args=batch.get("extra_args"),
    )
    mol_mask = batch.get("mol_mask")
    atom_mask = batch["batch"] < num_mols
    loss_y = jnp.zeros((), y.dtype)
    loss_neg_dy = jnp.zeros((), y.dtype)
    if "y" in batch and batch["y"] is not None:
        target = batch["y"].reshape(y.shape)
        loss_y = loss_fn(y, target, mol_mask)
    if neg_dy is not None and "neg_dy" in batch and batch["neg_dy"] is not None:
        loss_neg_dy = loss_fn(neg_dy, batch["neg_dy"], atom_mask)
    return loss_y, loss_neg_dy, (y, neg_dy)


def make_train_step(
    potential,
    *,
    num_mols: int,
    lr: float,
    weight_decay: float = 0.0,
    y_weight: float = 1.0,
    neg_dy_weight: float = 1.0,
    lr_warmup_steps: int = 0,
    ema_alpha_y: float = 1.0,
    ema_alpha_neg_dy: float = 1.0,
    train_loss: str = "mse_loss",
    axis_name: Optional[str] = None,
    remat: bool = False,
    gradient_clipping: float = 0.0,
):
    """Build a pure ``(state, batch) -> (state, metrics)`` step.

    When ``axis_name`` is set the step is meant to run under
    ``shard_map``/``pmap`` over that mesh axis: losses and gradients are
    ``pmean``-ed across devices (DDP all-reduce equivalent, SURVEY §2.5).
    """
    opt = make_optimizer(weight_decay, gradient_clipping)
    clipped = bool(gradient_clipping and gradient_clipping > 0)

    def loss_and_state(params, ema_y, ema_neg_dy, batch):
        compute = compute_losses
        if remat:
            compute = jax.checkpoint(
                compute_losses, static_argnums=(0, 3, 4)
            )
        loss_y, loss_neg_dy, _ = compute(
            potential, params, batch, num_mols, train_loss
        )
        # EMA smoothing enters the backprop graph (reference :224-240):
        # loss' = α·loss + (1-α)·stop_grad(ema)
        def smooth(loss, ema, alpha):
            if not (0.0 < alpha < 1.0):
                return loss, loss
            prev = jnp.where(ema < 0, jax.lax.stop_gradient(loss), ema)
            sm = alpha * loss + (1.0 - alpha) * prev
            return sm, jax.lax.stop_gradient(sm)

        sm_y, new_ema_y = smooth(loss_y, ema_y, ema_alpha_y)
        sm_neg, new_ema_neg = smooth(loss_neg_dy, ema_neg_dy, ema_alpha_neg_dy)
        total = y_weight * sm_y + neg_dy_weight * sm_neg
        aux = dict(
            loss_y=loss_y,
            loss_neg_dy=loss_neg_dy,
            total=total,
            new_ema_y=new_ema_y,
            new_ema_neg=new_ema_neg,
        )
        return total, aux

    def train_step(state: TrainState, batch):
        (_, aux), grads = jax.value_and_grad(
            loss_and_state, has_aux=True
        )(state.params, state.ema_y, state.ema_neg_dy, batch)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = {k: jax.lax.pmean(v, axis_name) for k, v in aux.items()}
        # LR warmup (reference module.py:295-307).
        if lr_warmup_steps > 0:
            scale = jnp.minimum(
                1.0, (state.step.astype(jnp.float32) + 1.0) / lr_warmup_steps
            )
        else:
            scale = 1.0
        opt_state = state.opt_state
        inner = opt_state[1] if clipped else opt_state
        inner.hyperparams["learning_rate"] = state.base_lr * scale
        updates, new_opt_state = opt.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            base_lr=state.base_lr,
            ema_y=aux["new_ema_y"],
            ema_neg_dy=aux["new_ema_neg"],
        )
        metrics = dict(
            loss=aux["total"],
            loss_y=aux["loss_y"],
            loss_neg_dy=aux["loss_neg_dy"],
            lr=state.base_lr * scale,
        )
        return new_state, metrics

    return train_step
