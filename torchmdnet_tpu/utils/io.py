"""Dataset writer helpers (reference ``torchmdnet/utils.py:349-385``
``write_as_hdf5``)."""

import numpy as np


def write_as_hdf5(files, hdf5_dataset, tile_embed=True):
    """Transcode Custom-format npy file triplets (coords/embed/energy/force)
    into one HDF5 file with the generic HDF5-dataset layout
    (one group per source file: pos/types/energy/forces)."""
    import h5py

    with h5py.File(hdf5_dataset, "w") as f:
        for i in range(len(files["pos"])):
            grp = f.create_group(f"group_{i}")
            coord_data = np.load(files["pos"][i], mmap_mode="r")
            embed_data = np.load(files["z"][i]).astype(np.int64)
            grp["pos"] = coord_data
            if tile_embed:
                grp["types"] = np.tile(embed_data, (coord_data.shape[0], 1))
            else:
                grp["types"] = embed_data
            if "y" in files:
                grp["energy"] = np.load(files["y"][i], mmap_mode="r")
            if "neg_dy" in files:
                grp["forces"] = np.load(files["neg_dy"][i], mmap_mode="r")
