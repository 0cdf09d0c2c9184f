"""Representation-model wrappers (reference ``torchmdnet/models/wrappers.py``).

``AtomFilter`` drops atoms with Z ≤ ``remove_threshold`` *after* the
representation (``wrappers.py:33-67``).  Static shapes forbid dropping
rows, so the TPU-native formulation zeroes the filtered atoms' features —
their contribution to every downstream reduction is exactly the reference's
removal.  (The head applies this inline via its ``atom_filter`` attribute;
this module provides the standalone wrapper for API parity.)
"""

from typing import Optional

from flax import linen as nn


class BaseWrapper(nn.Module):
    model: nn.Module

    def __call__(self, *args, **kwargs):
        return self.model(*args, **kwargs)


class AtomFilter(BaseWrapper):
    model: nn.Module
    remove_threshold: int = -1

    def __call__(self, z, pos, batch, box=None, q=None, s=None,
                 atom_mask=None, nbr=None, num_mols: Optional[int] = None):
        x, v = self.model(
            z, pos, batch, box=box, q=q, s=s, atom_mask=atom_mask, nbr=nbr,
            num_mols=num_mols,
        )
        keep = (z > self.remove_threshold)[:, None].astype(x.dtype)
        x = x * keep
        if v is not None:
            v = v * keep[:, :, None]
        return x, v
