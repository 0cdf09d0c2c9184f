"""Synthetic dataset fixture (analogue of the reference tests/utils.py
DummyDataset): random molecules with energies/forces and a known atomref,
duck-typed atomic_number/distance_scale/energy_scale for priors."""

import numpy as np

from torchmdnet_tpu.datasets.memdataset import Dataset


class DummyDataset(Dataset):
    def __init__(self, num_samples=20, min_atoms=4, max_atoms=10,
                 has_atomref=True, seed=1234):
        rng = np.random.RandomState(seed)
        self.samples = []
        for _ in range(num_samples):
            n = rng.randint(min_atoms, max_atoms + 1)
            self.samples.append(
                dict(
                    z=rng.randint(1, 9, n).astype(np.int64),
                    pos=rng.uniform(-4, 4, (n, 3)).astype(np.float32),
                    y=rng.randn(1, 1).astype(np.float64),
                    neg_dy=rng.randn(n, 3).astype(np.float32),
                    q=np.int64(0),
                )
            )
        self.has_atomref = has_atomref
        self._atomref = rng.randn(100, 1).astype(np.float32)
        self.atomic_number = list(range(100))
        self.distance_scale = 1e-10
        self.energy_scale = 1.602176634e-19

    def __len__(self):
        return len(self.samples)

    def get(self, idx):
        return dict(self.samples[idx])

    def get_atomref(self, max_z=100):
        return self._atomref if self.has_atomref else None
