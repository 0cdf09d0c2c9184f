from torchmdnet_tpu.md.integrators import (  # noqa: F401
    MDState,
    make_md_step,
    run_md,
)
from torchmdnet_tpu.md.calculators import External, TMDNETCalculator  # noqa: F401
