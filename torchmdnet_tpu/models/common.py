"""Shared flax building blocks.

Capability parity with ``torchmdnet/models/utils.py`` (MLP, activations,
CosineCutoff, RBF modules, GatedEquivariantBlock) re-expressed as flax
modules.  Submodule names deliberately mirror the reference's torch
attribute paths (``linears_tensor_0``, ``layers_2`` …) so checkpoint
conversion (``utils/torch_ckpt.py``) is mechanical.

Initializers reproduce the torch defaults so that training-from-scratch
matches the reference's initialization statistics:

* torch ``nn.Linear`` default: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for
  both weight and bias.
* xavier_uniform + zero bias where the reference calls it explicitly
  (MLP.reset_parameters, ET projections, NeighborEmbedding).
* torch ``nn.Embedding`` default: N(0, 1).
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from torchmdnet_tpu.ops import rbf as rbf_ops
from torchmdnet_tpu.ops.config import get_matmul_precision


# ---------------------------------------------------------------------------
# Initializers (torch-default statistics)
# ---------------------------------------------------------------------------

def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/√fan_in); flax kernel shape is (fan_in, fan_out)."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_embedding_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class Linear(nn.Module):
    """nn.Dense with torch-compatible default init.

    ``init='torch'`` = torch nn.Linear default; ``init='xavier_zeros'`` =
    xavier_uniform weight + zero bias (used where the reference calls
    ``nn.init.xavier_uniform_`` explicitly).
    """

    features: int
    use_bias: bool = True
    init: str = "torch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.init == "torch":
            kinit = torch_linear_kernel_init
            binit = make_torch_bias_init(fan_in)
        elif self.init == "xavier_zeros":
            kinit = xavier_uniform_init
            binit = nn.initializers.zeros
        else:
            raise ValueError(self.init)
        kernel = self.param("kernel", kinit, (fan_in, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jnp.einsum(
            "...i,io->...o",
            x.astype(dtype),
            kernel.astype(dtype),
            precision=get_matmul_precision(),
        )
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class LinearParams(nn.Module):
    """Parameter holder with Linear-compatible naming (kernel/bias) for ops
    that consume raw weights (e.g. the Pallas fused edge MLP)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_linear_kernel_init,
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", make_torch_bias_init(self.in_features),
            (self.features,), jnp.float32,
        )
        return kernel, bias


class Embedding(nn.Module):
    """Torch-default (N(0,1)) embedding lookup; param name ``embedding``."""

    num_embeddings: int
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, idx):
        table = self.param(
            "embedding",
            torch_embedding_init,
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        if self.dtype is not None:
            table = table.astype(self.dtype)
        return table[idx]


class LayerNorm(nn.Module):
    """LayerNorm with torch eps (1e-5); params ``scale``/``bias`` live at
    this module's own path (torch keys ``<name>.weight``/``<name>.bias``)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        # accumulate in at least f32 (never downcast f64)
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations (reference act_class_mapping, models/utils.py:706-713)
# ---------------------------------------------------------------------------

def shifted_softplus(x):
    return jax.nn.softplus(x) - math.log(2.0)


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS: dict = {
    "ssp": shifted_softplus,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "swish": swish,
    "mish": mish,
}


class GLU(nn.Module):
    """Gated linear unit ``W(x) * act(V(x))`` (reference ``GLU``,
    models/utils.py:410-437; torch naming: submodules ``W`` / ``V``)."""

    hidden_channels: int
    activation: Callable = jax.nn.sigmoid

    @nn.compact
    def __call__(self, x):
        w = Linear(self.hidden_channels, name="W")(x)
        v = Linear(self.hidden_channels, name="V")(x)
        return w * self.activation(v)


class SwiGLU(nn.Module):
    """SwiGLU: GLU gated by Swish (reference ``SwiGLU``,
    models/utils.py:476-499; wraps a ``glu`` submodule)."""

    hidden_features: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        return GLU(
            self.hidden_features,
            activation=lambda v: v * jax.nn.sigmoid(self.beta * v),
            name="glu",
        )(x)


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(
            f'Unknown activation function "{name}". '
            f'Choose from {", ".join(ACTIVATIONS)}.'
        )
    return ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# RBF modules (trainable parameters live here; numerics in ops/rbf.py)
# ---------------------------------------------------------------------------

class ExpNormalSmearing(nn.Module):
    """Reference ``models/utils.py:356-407``.

    ``initial_values`` overrides the config-derived (means, betas); the
    checkpoint loader uses it so non-trainable torch *buffers* whose values
    differ from the standard initialization still load faithfully
    (reference loads buffers unconditionally via ``load_state_dict``)."""

    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    num_rbf: int = 50
    trainable: bool = True
    initial_values: Optional[tuple] = None  # ((means...), (betas...))

    @nn.compact
    def __call__(self, dist):
        means0, betas0 = rbf_ops.expnorm_initial_params(
            self.cutoff_lower, self.cutoff_upper, self.num_rbf
        )
        if self.initial_values is not None:
            means0 = jnp.asarray(self.initial_values[0], means0.dtype)
            betas0 = jnp.asarray(self.initial_values[1], betas0.dtype)
        if self.trainable:
            means = self.param("means", lambda k: means0)
            betas = self.param("betas", lambda k: betas0)
        else:
            means, betas = means0, betas0
        alpha = 5.0 / (self.cutoff_upper - self.cutoff_lower)
        return rbf_ops.expnorm_rbf(
            dist,
            means.astype(dist.dtype),
            betas.astype(dist.dtype),
            alpha,
            self.cutoff_upper,
            self.cutoff_lower,
        )


class GaussianSmearing(nn.Module):
    """Reference ``models/utils.py:316-353``."""

    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    num_rbf: int = 50
    trainable: bool = True
    initial_values: Optional[tuple] = None  # ((offset...), (coeff...))

    @nn.compact
    def __call__(self, dist):
        offset0, coeff0 = rbf_ops.gauss_initial_params(
            self.cutoff_lower, self.cutoff_upper, self.num_rbf
        )
        if self.initial_values is not None:
            offset0 = jnp.asarray(self.initial_values[0], offset0.dtype)
            coeff0 = jnp.asarray(self.initial_values[1], coeff0.dtype)
        if self.trainable:
            offset = self.param("offset", lambda k: offset0)
            coeff = self.param("coeff", lambda k: coeff0)
        else:
            offset, coeff = offset0, coeff0
        return rbf_ops.gauss_rbf(
            dist, offset.astype(dist.dtype), coeff.astype(dist.dtype)
        )


RBF_CLASSES = {"gauss": GaussianSmearing, "expnorm": ExpNormalSmearing}


def make_rbf(rbf_type, cutoff_lower, cutoff_upper, num_rbf, trainable, name,
             initial_values=None):
    if rbf_type not in RBF_CLASSES:
        raise ValueError(
            f'Unknown RBF type "{rbf_type}". Choose from {", ".join(RBF_CLASSES)}.'
        )
    return RBF_CLASSES[rbf_type](
        cutoff_lower=cutoff_lower,
        cutoff_upper=cutoff_upper,
        num_rbf=num_rbf,
        trainable=trainable,
        name=name,
        initial_values=initial_values,
    )


# ---------------------------------------------------------------------------
# MLP (reference models/utils.py:531-580)
# ---------------------------------------------------------------------------

class MLP(nn.Module):
    """Linear/act stack; submodule names mirror the torch nn.Sequential
    indices (Linear at 0, 2, 4, …) for mechanical checkpoint mapping."""

    out_channels: int
    hidden_channels: int
    activation: str = "silu"
    num_hidden_layers: int = 0
    init: str = "xavier_zeros"  # reference MLP.reset_parameters

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        widths = [self.hidden_channels] * (1 + self.num_hidden_layers) + [
            self.out_channels
        ]
        torch_idx = 0
        for li, w in enumerate(widths):
            x = Linear(w, init=self.init, name=f"layers_{torch_idx}")(x)
            if li < len(widths) - 1:
                x = act(x)
            torch_idx += 2
        return x


class GatedEquivariantBlock(nn.Module):
    """Schütt et al. 2021 gated equivariant block
    (reference ``models/utils.py:583-655``).

    The zero-vector NaN-grad guard of the reference (masking atoms whose
    vector features are exactly zero) is reproduced with a double-where.
    """

    hidden_channels: int
    out_channels: int
    intermediate_channels: Optional[int] = None
    activation: str = "silu"
    scalar_activation: bool = False

    @nn.compact
    def __call__(self, x, v):
        inter = self.intermediate_channels or self.hidden_channels
        vec1_buffer = Linear(
            self.hidden_channels, use_bias=False, init="xavier_zeros",
            name="vec1_proj",
        )(v)  # [N, 3, H]
        # norm over the spatial axis with zero-safe gradient
        sq = jnp.sum(vec1_buffer**2, axis=-2)  # [N, H]
        nonzero_row = jnp.any(
            (vec1_buffer != 0).reshape(vec1_buffer.shape[0], -1), axis=1
        )
        keep = (sq > 0) & nonzero_row[:, None]
        safe = jnp.where(keep, sq, 1.0)
        vec1 = jnp.where(keep, jnp.sqrt(safe), 0.0)
        vec2 = Linear(
            self.out_channels, use_bias=False, init="xavier_zeros",
            name="vec2_proj",
        )(v)
        x = jnp.concatenate([x, vec1], axis=-1)
        x = MLP(
            out_channels=self.out_channels * 2,
            hidden_channels=inter,
            activation=self.activation,
            name="update_net",
        )(x)
        x, vgate = jnp.split(x, 2, axis=-1)
        v = vgate[:, None, :] * vec2
        if self.scalar_activation:
            x = get_activation(self.activation)(x)
        return x, v


def cosine_cutoff_fn(cutoff_lower, cutoff_upper):
    def fn(dist):
        return rbf_ops.cosine_cutoff(dist, cutoff_upper, cutoff_lower)

    return fn
