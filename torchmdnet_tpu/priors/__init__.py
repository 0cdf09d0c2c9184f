from torchmdnet_tpu.priors.base import BasePrior  # noqa: F401
from torchmdnet_tpu.priors.atomref import Atomref, LearnableAtomref  # noqa: F401
from torchmdnet_tpu.priors.zbl import ZBL  # noqa: F401
from torchmdnet_tpu.priors.coulomb import Coulomb  # noqa: F401
from torchmdnet_tpu.priors.d2 import D2  # noqa: F401

__all__ = ["BasePrior", "Atomref", "LearnableAtomref", "ZBL", "Coulomb", "D2"]

PRIOR_CLASSES = {name: cls for name, cls in [
    ("Atomref", Atomref),
    ("LearnableAtomref", LearnableAtomref),
    ("ZBL", ZBL),
    ("Coulomb", Coulomb),
    ("D2", D2),
]}
