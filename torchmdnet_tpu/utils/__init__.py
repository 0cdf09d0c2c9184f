from torchmdnet_tpu.utils.periodic_table import (  # noqa: F401
    ATOMIC_MASSES,
    ATOMIC_NUMBERS,
)
