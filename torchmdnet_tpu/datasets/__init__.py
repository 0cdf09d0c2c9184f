"""Dataset zoo (reference ``torchmdnet/datasets/__init__.py``: 25 classes).

All datasets return plain dict samples (numpy arrays) instead of
torch_geometric ``Data``; download helpers are gated behind explicit calls
(this environment has no egress — place raw files under ``root/raw``).
"""

from torchmdnet_tpu.datasets.memdataset import MemmappedDataset  # noqa: F401
from torchmdnet_tpu.datasets.hdf import HDF5  # noqa: F401
from torchmdnet_tpu.datasets.custom import Custom  # noqa: F401
from torchmdnet_tpu.datasets.ace import Ace, AceHF  # noqa: F401
from torchmdnet_tpu.datasets.ani import ANI1, ANI1CCX, ANI1X, ANI2X  # noqa: F401
from torchmdnet_tpu.datasets.comp6 import (  # noqa: F401
    ANIMD,
    COMP6v1,
    COMP6v2,
    DrugBank,
    GDB07to09,
    GDB10to13,
    Tripeptides,
    S66X8,
)
from torchmdnet_tpu.datasets.md17 import MD17  # noqa: F401
from torchmdnet_tpu.datasets.md22 import MD22  # noqa: F401
from torchmdnet_tpu.datasets.qm9 import QM9  # noqa: F401
from torchmdnet_tpu.datasets.qm9q import QM9q  # noqa: F401
from torchmdnet_tpu.datasets.spice import SPICE  # noqa: F401
from torchmdnet_tpu.datasets.water import WaterBox  # noqa: F401
from torchmdnet_tpu.datasets.genentech import GenentechTorsions  # noqa: F401
from torchmdnet_tpu.datasets.maceoff import MACEOFF  # noqa: F401
from torchmdnet_tpu.datasets.mdcath import MDCATH  # noqa: F401

__all__ = [
    "Ace",
    "AceHF",
    "ANIMD",
    "ANI1",
    "ANI1CCX",
    "ANI1X",
    "ANI2X",
    "COMP6v1",
    "COMP6v2",
    "Custom",
    "DrugBank",
    "GDB07to09",
    "GDB10to13",
    "GenentechTorsions",
    "HDF5",
    "MACEOFF",
    "MD17",
    "MD22",
    "MDCATH",
    "MemmappedDataset",
    "QM9",
    "QM9q",
    "SPICE",
    "S66X8",
    "Tripeptides",
    "WaterBox",
]
