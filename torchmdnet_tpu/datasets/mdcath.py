"""mdCATH protein-domain trajectory dataset
(reference ``torchmdnet/datasets/mdcath.py``).

Per-domain HDF5 files ``mdcath_dataset_<pdbid>.h5`` with groups
``<pdb>/<temp>/<replica>`` holding ``coords``/``forces`` [frames, atoms, 3]
and top-level ``z``; a ``mdcath_source.h5`` catalogs per-domain/replica
attributes used for filtering (atom/residue counts, gyration radius,
secondary-structure fractions, frame counts) with ``skip_frames``
subsampling.
"""

import logging
import os
from os.path import join as opj

import numpy as np

from torchmdnet_tpu.datasets._download import download_url
from torchmdnet_tpu.datasets.memdataset import Dataset

logger = logging.getLogger("mdcath")


def load_pdb_list(pdb_list):
    if isinstance(pdb_list, list):
        return pdb_list
    if isinstance(pdb_list, str) and os.path.isfile(pdb_list):
        with open(pdb_list) as fh:
            return [line.strip() for line in fh if line.strip()]
    raise ValueError("Invalid pdb_list. Must be a list or a file path.")


class MDCATH(Dataset):
    def __init__(
        self,
        root,
        transform=None,
        pre_transform=None,
        pre_filter=None,
        numAtoms=5000,
        numNoHAtoms=None,
        numResidues=1000,
        temperatures=("348",),
        skip_frames=1,
        pdb_list=None,
        min_gyration_radius=None,
        max_gyration_radius=None,
        alpha_beta_coil=None,
        solid_ss=None,
        numFrames=None,
        source_file="mdcath_source.h5",
        file_basename="mdcath_dataset",
    ):
        self.url = (
            "https://huggingface.co/datasets/compsciencelab/mdCATH/resolve/main/"
        )
        self.root = root
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter
        self.source_file = source_file
        self.file_basename = file_basename
        self.numAtoms = numAtoms
        self.numNoHAtoms = numNoHAtoms
        self.numResidues = numResidues
        self.temperatures = [str(t) for t in temperatures]
        self.skip_frames = skip_frames
        self.pdb_list = (
            load_pdb_list(pdb_list) if pdb_list is not None else None
        )
        self.min_gyration_radius = min_gyration_radius
        self.max_gyration_radius = max_gyration_radius
        self.alpha_beta_coil = alpha_beta_coil
        self.solid_ss = solid_ss
        self.numFrames = numFrames
        os.makedirs(root, exist_ok=True)
        self._ensure_source_file()
        self._filter_and_prepare_data()
        self._ensure_raw_files()
        self.idx = None

    def _ensure_source_file(self):
        path = opj(self.root, self.source_file)
        if not os.path.exists(path):
            assert self.source_file == "mdcath_source.h5", (
                "Only 'mdcath_source.h5' is supported for download."
            )
            download_url(self.url + self.source_file, self.root,
                         self.source_file)

    def _ensure_raw_files(self):
        for pdb_id in self.processed:
            fname = f"{self.file_basename}_{pdb_id}.h5"
            path = opj(self.root, fname)
            if not os.path.exists(path):
                download_url(
                    self.url + f"data/{fname}", self.root, fname
                )

    def _filter_and_prepare_data(self):
        import h5py

        self.processed = {}
        self.num_conformers = 0
        with h5py.File(opj(self.root, self.source_file), "r") as f:
            pdb_ids = self.pdb_list if self.pdb_list is not None else list(f)
            for pdb_id in pdb_ids:
                grp = f[pdb_id]
                if (
                    self.numAtoms is not None
                    and grp.attrs["numProteinAtoms"] > self.numAtoms
                ):
                    continue
                if (
                    self.numResidues is not None
                    and grp.attrs["numResidues"] > self.numResidues
                ):
                    continue
                if (
                    self.numNoHAtoms is not None
                    and grp.attrs["numNoHAtoms"] > self.numNoHAtoms
                ):
                    continue
                entries = []
                for temp in self.temperatures:
                    if temp not in grp:
                        continue
                    for replica in grp[temp]:
                        rgrp = grp[temp][replica]
                        if (
                            self.numFrames is not None
                            and rgrp.attrs["numFrames"] < self.numFrames
                        ):
                            continue
                        if (
                            self.min_gyration_radius is not None
                            and rgrp.attrs["min_gyration_radius"]
                            < self.min_gyration_radius
                        ):
                            continue
                        if (
                            self.max_gyration_radius is not None
                            and rgrp.attrs["max_gyration_radius"]
                            > self.max_gyration_radius
                        ):
                            continue
                        if self.solid_ss is not None:
                            alpha = rgrp.attrs["alpha"]
                            beta = rgrp.attrs["beta"]
                            ss = (alpha + beta) / grp.attrs["numResidues"] * 100
                            if ss > self.solid_ss:
                                continue
                        num = int(
                            rgrp.attrs["numFrames"] // self.skip_frames
                        )
                        if num > 0:
                            entries.append((temp, replica, num))
                            self.num_conformers += num
                if entries:
                    self.processed[pdb_id] = entries
        logger.info(
            f"domains: {len(self.processed)}, conformers: {self.num_conformers}"
        )

    def _setup_idx(self):
        self.idx = []
        for pdb, entries in self.processed.items():
            path = opj(self.root, f"{self.file_basename}_{pdb}.h5")
            for temp, replica, num in entries:
                self.idx.extend(
                    (pdb, path, temp, replica, ci) for ci in range(num)
                )
        assert len(self.idx) == self.num_conformers

    def __len__(self):
        return self.num_conformers

    def get(self, element):
        import h5py

        if self.idx is None:
            self._setup_idx()
        pdb_id, path, temp, replica, conf_idx = self.idx[element]
        frame = conf_idx * self.skip_frames
        with h5py.File(path, "r") as f:
            z = np.asarray(f[pdb_id]["z"][:], np.int64)
            grp = f[f"{pdb_id}/{temp}/{replica}"]
            coords = np.asarray(grp["coords"][frame], np.float32)
            forces = np.asarray(grp["forces"][frame], np.float32)
        return dict(z=z, pos=coords, neg_dy=forces,
                    info=f"{pdb_id}_{temp}_{replica}_{conf_idx}")
