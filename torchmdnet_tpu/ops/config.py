"""Global numerics configuration.

``matmul_precision`` controls the MXU pass count for f32 matmuls across
the framework (Linear layers, pair linears, the Pallas edge MLP):

* ``"highest"`` (default) — f32-exact (bf16_6x passes); required for the
  1e-4 reference-parity contract.
* ``"high"`` — bf16_3x (~2× faster matmuls, ~1e-6 relative error).
* ``"default"`` — single-pass bf16 (fastest, for bf16-tolerant serving).
"""

import os

import jax

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_current = os.environ.get("TMDNET_MATMUL", "highest")
if _current not in _PRECISIONS:  # pragma: no cover - env typo guard
    _current = "highest"


def set_matmul_precision(name: str):
    global _current
    if name not in _PRECISIONS:
        raise ValueError(f"matmul_precision must be one of {list(_PRECISIONS)}")
    _current = name


def get_matmul_precision():
    return _PRECISIONS[_current]


def get_matmul_precision_name():
    return _current
