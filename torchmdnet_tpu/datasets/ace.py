"""AceFF HDF5 datasets, layouts 1.0 and 2.0
(reference ``torchmdnet/datasets/ace.py:14-292``).

Layout contract (see the reference docstring, units asserted):
positions Å, formation energy eV, forces eV/Å, partial charges e,
dipole moments e·Å; v1.0 nests per-conformation groups, v2.0 stores
conformation-stacked arrays per molecule.  Failed calculations (missing
energy / NaN energy) and over-``max_gradient`` frames are skipped.
"""

import hashlib
import os

import numpy as np

from torchmdnet_tpu.datasets.memdataset import MemmappedDataset


class Ace(MemmappedDataset):
    def __init__(
        self,
        root=None,
        transform=None,
        pre_transform=None,
        pre_filter=None,
        paths=None,
        max_gradient=None,
        subsample_molecules=1,
    ):
        assert isinstance(paths, (str, list))
        arg_hash = hashlib.md5(
            f"{paths}{max_gradient}{subsample_molecules}".encode()
        ).hexdigest()
        self.name = f"{self.__class__.__name__}-{arg_hash}"
        self.paths = paths
        self.max_gradient = max_gradient
        self.subsample_molecules = int(subsample_molecules)
        super().__init__(
            root, transform, pre_transform, pre_filter,
            properties=("y", "neg_dy", "q", "pq", "dp"),
        )

    @property
    def raw_paths(self):
        paths_init = self.paths if isinstance(self.paths, list) else [self.paths]
        paths = []
        for path in paths_init:
            if os.path.isfile(path):
                paths.append(path)
            elif os.path.isdir(path):
                paths.extend(
                    os.path.join(path, f)
                    for f in sorted(os.listdir(path))
                    if f.endswith(".h5")
                )
            else:
                raise RuntimeError(f"{path} is neither a directory nor a file")
        return paths

    @staticmethod
    def _confs_v1(mol, n_atoms):
        for conf in mol["conformations"].values():
            if "formation_energy" not in conf:
                continue  # failed calculation
            assert conf["positions"].attrs["units"] == "Å"
            pos = np.asarray(conf["positions"][...], np.float32)
            assert conf["formation_energy"].attrs["units"] == "eV"
            y = np.float64(conf["formation_energy"][()])
            assert conf["forces"].attrs["units"] == "eV/Å"
            neg_dy = np.asarray(conf["forces"][...], np.float32)
            assert conf["partial_charges"].attrs["units"] == "e"
            pq = np.asarray(conf["partial_charges"][:], np.float32)
            assert conf["dipole_moment"].attrs["units"] == "e*Å"
            dp = np.asarray(conf["dipole_moment"][:], np.float32)
            yield pos, y, neg_dy, pq, dp

    @staticmethod
    def _confs_v2(mol, n_atoms):
        assert mol["positions"].attrs["units"] == "Å"
        all_pos = np.asarray(mol["positions"][...], np.float32)
        assert mol["formation_energies"].attrs["units"] == "eV"
        all_y = np.asarray(mol["formation_energies"][:], np.float64)
        assert mol["forces"].attrs["units"] == "eV/Å"
        all_f = np.asarray(mol["forces"][...], np.float32)
        assert mol["partial_charges"].attrs["units"] == "e"
        all_pq = np.asarray(mol["partial_charges"][...], np.float32)
        assert mol["dipole_moments"].attrs["units"] == "e*Å"
        all_dp = np.asarray(mol["dipole_moments"][...], np.float32)
        for pos, y, f, pq, dp in zip(all_pos, all_y, all_f, all_pq, all_dp):
            if np.isnan(y):
                continue
            yield pos, y, f, pq, dp

    def sample_iter(self, mol_ids=False):
        import h5py

        assert self.subsample_molecules > 0
        for i_path, path in enumerate(self.raw_paths):
            with h5py.File(path, "r") as h5:
                assert h5.attrs["layout"] == "Ace"
                version = h5.attrs["layout_version"]
                if version == "1.0":
                    assert "name" in h5.attrs
                    mols = list(h5.items())
                    load_confs = self._confs_v1
                elif version == "2.0":
                    assert len(h5.keys()) == 1
                    mols = list(next(iter(h5.values())).items())
                    load_confs = self._confs_v2
                else:
                    raise RuntimeError(f"Unsupported layout version: {version}")

                for i_mol, (mol_id, mol) in enumerate(mols):
                    if i_mol % self.subsample_molecules != 0:
                        continue
                    z = np.asarray(mol["atomic_numbers"], np.int64)
                    q = int(np.asarray(mol["formal_charges"]).sum())
                    for i_conf, (pos, y, neg_dy, pq, dp) in enumerate(
                        load_confs(mol, n_atoms=len(z))
                    ):
                        if self.max_gradient is not None:
                            if np.linalg.norm(neg_dy, axis=1).max() > float(
                                self.max_gradient
                            ):
                                continue
                        data = dict(
                            z=z, pos=pos, y=np.asarray(y).reshape(1, 1),
                            neg_dy=neg_dy, q=q, pq=pq, dp=dp,
                        )
                        if mol_ids:
                            data.update(i_path=i_path, mol_id=mol_id,
                                        i_conf=i_conf)
                        if self.pre_filter is not None and not self.pre_filter(
                            data
                        ):
                            continue
                        if self.pre_transform is not None:
                            data = self.pre_transform(data)
                        yield data


def download_gitea_dataset(path, tmpdir):
    """Fetch a parquet file referenced by a gitea ``ssh://`` URL into
    ``tmpdir`` via GitPython (reference ``datasets/ace.py:296-332``).
    Requires network + GitPython; gated behind explicit use."""
    try:
        from git import Repo
    except ImportError as exc:
        raise ImportError(
            "Could not import GitPython; install it to use gitea paths."
        ) from exc

    assert path.startswith("ssh://")
    pieces = path.split("/")
    repo_url = "/".join(pieces[:5])
    user, repo_name = pieces[3], pieces[4]
    file_name = pieces[-1]
    branch = "main"
    commit = None
    if "branch" in pieces:
        branch = pieces[pieces.index("branch") + 1]
    if "commit" in pieces:
        commit = pieces[pieces.index("commit") + 1]

    outdir = os.path.join(tmpdir, f"{user}_{repo_name}")
    if not os.path.exists(outdir):
        repo = Repo.clone_from(repo_url, outdir, no_checkout=True)
    else:
        repo = Repo(outdir)
    repo.remotes.origin.pull()
    repo.git.checkout(commit if commit is not None else branch)
    return os.path.join(outdir, file_name)


class AceHF:
    """HuggingFace-datasets variant of :class:`Ace`
    (reference ``datasets/ace.py:335-392``): loads parquet shards through
    ``datasets.load_dataset`` and serves the same dict samples
    (z/pos/y/neg_dy/q/pq/dp) without the memmap conversion pass.

    ``root`` is the HF builder name (default ``"parquet"``), ``paths`` the
    data files (gitea ``ssh://`` URLs are fetched via GitPython)."""

    def __init__(self, root="parquet", paths=None, split="train",
                 max_gradient=None):
        from datasets import load_dataset

        newpaths = list(paths)
        for i, path in enumerate(newpaths):
            if "gitea" in path:
                newpaths[i] = download_gitea_dataset(path, "/tmp")

        self.dataset = load_dataset(root, data_files=newpaths, split=split)
        if max_gradient is not None:

            def _filter(x):
                forces = np.asarray(x["forces"])
                energy = np.asarray(x["formation_energy"])
                if np.isnan(forces).any() or np.isnan(energy).any():
                    return False
                return np.max(np.linalg.norm(forces, axis=1)) < max_gradient

            self.dataset = self.dataset.filter(
                _filter, desc="Filtering",
                num_proc=max((os.cpu_count() or 2) // 2, 1),
            )
        self.dataset = self.dataset.with_format("numpy")

    def __len__(self):
        return self.dataset.num_rows

    def get(self, idx):
        data = self.dataset[int(idx)]
        return {
            "z": np.asarray(data["atomic_numbers"], np.int64),
            "pos": np.asarray(data["positions"], np.float32),
            "y": np.asarray(data["formation_energy"],
                            np.float64).reshape(1, 1),
            "neg_dy": np.asarray(data["forces"], np.float32),
            "q": np.int64(np.asarray(data["formal_charges"]).sum()),
            "pq": np.asarray(data["partial_charges"], np.float32),
            "dp": np.asarray(data["dipole_moment"], np.float32),
        }

    def __getitem__(self, idx):
        return self.get(idx)
