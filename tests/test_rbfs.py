"""RBF / cutoff numerics vs the reference modules
(reference tests/test_rbfs.py)."""

import numpy as np
import torch

import jax.numpy as jnp

import reference_oracle

reference_oracle.install()

from torchmdnet.models.utils import (  # noqa: E402
    CosineCutoff as RefCosineCutoff,
    ExpNormalSmearing as RefExpNormal,
    GaussianSmearing as RefGaussian,
)

from torchmdnet_tpu.ops.rbf import (  # noqa: E402
    cosine_cutoff,
    expnorm_initial_params,
    expnorm_rbf,
    gauss_initial_params,
    gauss_rbf,
)


def test_cosine_cutoff_matches():
    d = np.linspace(0, 7, 200).astype(np.float32)
    for lo, hi in ((0.0, 5.0), (2.0, 6.0)):
        ref = RefCosineCutoff(lo, hi)(torch.tensor(d)).numpy()
        ours = np.asarray(cosine_cutoff(jnp.asarray(d), hi, lo))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_expnorm_matches():
    d = np.linspace(0, 6, 100).astype(np.float32)
    for lo, hi, n in ((0.0, 5.0, 32), (1.0, 6.0, 16)):
        ref = RefExpNormal(lo, hi, n, trainable=False)(torch.tensor(d)).numpy()
        means, betas = expnorm_initial_params(lo, hi, n)
        alpha = 5.0 / (hi - lo)
        ours = np.asarray(expnorm_rbf(jnp.asarray(d), means, betas, alpha,
                                      hi, lo))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gaussian_matches():
    d = np.linspace(0, 6, 100).astype(np.float32)
    for lo, hi, n in ((0.0, 5.0, 32), (1.0, 6.0, 16)):
        ref = RefGaussian(lo, hi, n, trainable=False)(torch.tensor(d)).numpy()
        offset, coeff = gauss_initial_params(lo, hi, n)
        ours = np.asarray(gauss_rbf(jnp.asarray(d), offset, coeff))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_glu_swiglu_match_reference():
    """GLU / SwiGLU modules vs the reference torch utility classes with
    identical weights (reference models/utils.py:410-499)."""
    import jax
    from torchmdnet.models.utils import SwiGLU as RefSwiGLU
    from torchmdnet_tpu.models.common import SwiGLU

    torch.manual_seed(0)
    ref = RefSwiGLU(6, hidden_features=10, beta=1.3)
    x = np.random.RandomState(1).randn(5, 6).astype(np.float32)
    want = ref(torch.tensor(x)).detach().numpy()

    m = SwiGLU(10, beta=1.3)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "glu": {
            "W": {"kernel": ref.glu.W.weight.detach().numpy().T,
                  "bias": ref.glu.W.bias.detach().numpy()},
            "V": {"kernel": ref.glu.V.weight.detach().numpy().T,
                  "bias": ref.glu.V.bias.detach().numpy()},
        }
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
