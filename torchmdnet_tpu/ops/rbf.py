"""Radial basis expansions and cutoff functions (pure jnp).

Reference parity: ``torchmdnet/models/utils.py:316-407`` (GaussianSmearing,
ExpNormalSmearing) and ``:500-528`` (CosineCutoff).  Parameter
initialization lives in ``models/common.py`` flax modules; these are the
shape-polymorphic numerics used by both the modules and the priors.
"""

import math

import jax.numpy as jnp


def cosine_cutoff(dist, cutoff_upper: float, cutoff_lower: float = 0.0):
    """Cosine switching function, 1 at the (lower) cutoff → 0 at the upper.

    Reference ``models/utils.py:506-528``: for ``cutoff_lower > 0`` the
    window is shifted/scaled and zeroed outside ``(lower, upper)``
    (strict inequalities); otherwise ``0.5·(cos(πd/upper)+1)`` zeroed at
    ``d >= upper``.
    """
    if cutoff_lower > 0.0:
        c = 0.5 * (
            jnp.cos(
                math.pi
                * (2.0 * (dist - cutoff_lower) / (cutoff_upper - cutoff_lower) + 1.0)
            )
            + 1.0
        )
        c = c * (dist < cutoff_upper) * (dist > cutoff_lower)
        return c
    c = 0.5 * (jnp.cos(dist * math.pi / cutoff_upper) + 1.0)
    return c * (dist < cutoff_upper)


def gauss_rbf(dist, offset, coeff):
    """Gaussian smearing: ``exp(coeff · (d - offset)²)``
    (reference ``models/utils.py:351-353``).  ``offset``: [R]; ``coeff``
    scalar or [R]."""
    d = dist[..., None] - offset
    return jnp.exp(coeff * d * d)


def gauss_initial_params(cutoff_lower, cutoff_upper, num_rbf, dtype=jnp.float32):
    offset = jnp.linspace(cutoff_lower, cutoff_upper, num_rbf, dtype=dtype)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    return offset, jnp.asarray(coeff, dtype=dtype)


def expnorm_rbf(dist, means, betas, alpha: float, cutoff_upper: float,
                cutoff_lower: float = 0.0):
    """Exponential-normal smearing with PhysNet parameterization
    (reference ``models/utils.py:402-407``)::

        f_k(d) = cutoff(d) · exp(-β_k (exp(α(-d + lower)) - μ_k)²)

    where the cutoff window is always ``CosineCutoff(0, upper)``.
    """
    d = dist[..., None]
    window = cosine_cutoff(d, cutoff_upper, 0.0)
    arg = jnp.exp(alpha * (-d + cutoff_lower)) - means
    return window * jnp.exp(-betas * arg * arg)


def expnorm_initial_params(cutoff_lower, cutoff_upper, num_rbf, dtype=jnp.float32):
    """PhysNet defaults (reference ``models/utils.py:382-395``)."""
    start_value = math.exp(-cutoff_upper + cutoff_lower)
    means = jnp.linspace(start_value, 1.0, num_rbf, dtype=dtype)
    beta = (2.0 / num_rbf * (1.0 - start_value)) ** -2
    betas = jnp.full((num_rbf,), beta, dtype=dtype)
    return means, betas
