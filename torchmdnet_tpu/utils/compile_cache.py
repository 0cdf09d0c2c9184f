"""Persistent XLA compilation cache.

The first TPU compile of the flagship configs is expensive (minutes via
the remote compile service); wiring ``jax_compilation_cache_dir`` makes
every subsequent process deserialize the executable in seconds.  The
reference framework gets this for free from ``torch.compile``'s inductor
cache; here it is one opt-out knob.

Disable with ``TMDNET_NO_COMPILE_CACHE=1`` or point the location elsewhere
with ``TMDNET_COMPILE_CACHE_DIR``.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "torchmdnet_tpu", "xla_cache"
)

_enabled = False


def enable_persistent_cache(cache_dir=None):
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    if _enabled or os.environ.get("TMDNET_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("TMDNET_COMPILE_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time, not only
        # multi-second compiles (default threshold is 1s wall)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # cache is an optimization; never fail the run
        pass
