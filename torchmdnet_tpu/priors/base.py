"""Prior-model base class (reference ``torchmdnet/priors/base.py``)."""

from flax import linen as nn


class BasePrior(nn.Module):
    """Priors hook into the energy pipeline at two points:

    * ``pre_reduce(x, z, pos, batch, extra_args)`` — per-atom scalar terms,
    * ``post_reduce(y, z, pos, batch, box, extra_args, ...)`` — per-molecule
      terms (these typically build their own neighbor lists).

    ``get_init_args()`` returns constructor kwargs for checkpoint round-trip
    (reference ``priors/base.py:9-63``).
    """

    def get_init_args(self):
        return {}

    def pre_reduce(self, x, z, pos, batch, extra_args=None, num_mols=None):
        return x

    def post_reduce(self, y, z, pos, batch, box=None, extra_args=None, num_mols=None):
        return y

    def __call__(self, x, z, pos, batch, extra_args=None, num_mols=None):
        return self.pre_reduce(x, z, pos, batch, extra_args, num_mols)
