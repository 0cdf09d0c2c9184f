"""Test configuration: force JAX onto a simulated 8-device CPU platform
(SURVEY.md §4 TPU translation) before jax initializes."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin in this image ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME does force CPU.
os.environ["JAX_PLATFORM_NAME"] = "cpu"

# Belt and braces: if some pytest plugin already imported jax, force the
# platform through the config as well (works until a backend initializes).
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
