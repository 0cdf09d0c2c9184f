"""Loss registry (reference ``torchmdnet/loss.py``) with padding masks.

The reference uses plain ``torch.nn.functional`` mse/l1/huber over dense
batches; here every batch is padded to static shapes, so each loss takes a
mask and reduces over valid elements only.
"""

import jax.numpy as jnp


def _masked_mean(err, mask):
    if mask is None:
        return jnp.mean(err)
    mask = jnp.broadcast_to(
        mask.reshape(mask.shape + (1,) * (err.ndim - mask.ndim)), err.shape
    ).astype(err.dtype)
    total = jnp.sum(err * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def masked_mse(pred, target, mask=None):
    return _masked_mean((pred - target) ** 2, mask)


def masked_l1(pred, target, mask=None):
    return _masked_mean(jnp.abs(pred - target), mask)


def masked_huber(pred, target, mask=None, delta: float = 1.0):
    err = jnp.abs(pred - target)
    quad = jnp.minimum(err, delta)
    loss = 0.5 * quad * quad + delta * (err - quad)
    return _masked_mean(loss, mask)


LOSS_FUNCTIONS = {
    "mse_loss": masked_mse,
    "l1_loss": masked_l1,
    "huber_loss": masked_huber,
}
