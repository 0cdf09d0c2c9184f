"""Atomref prior (reference ``torchmdnet/priors/atomref.py``)."""

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from torchmdnet_tpu.priors.base import BasePrior


class Atomref(BasePrior):
    """Adds per-element reference energies: ``x' = x + atomref[z]``.

    ``initial_atomref`` may come from a dataset's ``get_atomref()``; when
    ``trainable`` the table is a flax parameter (named ``atomref/embedding``
    to match the torch key ``atomref.weight``), otherwise a baked constant.
    ``enable=False`` turns it into a no-op (delta-learning,
    reference ``atomref.py:93-96``).
    """

    max_z: Optional[int] = None
    initial_atomref: Optional[np.ndarray] = None
    trainable: bool = False
    enable: bool = True

    def _initial_table(self):
        if self.initial_atomref is not None:
            table = np.asarray(self.initial_atomref, np.float32)
            if table.ndim == 1:
                table = table[:, None]
            return table
        if self.max_z is None:
            raise ValueError(
                "Can't instantiate Atomref prior, all arguments are None."
            )
        return np.zeros((self.max_z, 1), np.float32)

    @nn.compact
    def pre_reduce(self, x, z, pos, batch, extra_args=None, num_mols=None):
        table0 = self._initial_table()
        if self.trainable:
            # torch key `atomref.weight` maps onto this leaf.
            table = self.param("atomref", lambda key: jnp.asarray(table0))
        else:
            table = jnp.asarray(table0)
        if not self.enable:
            return x
        return x + table.astype(x.dtype)[z]

    def get_init_args(self):
        table = self._initial_table()
        return dict(max_z=table.shape[0], trainable=self.trainable, enable=self.enable)


class LearnableAtomref(Atomref):
    trainable: bool = True
