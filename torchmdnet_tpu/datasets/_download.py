"""Download helpers — gated (this environment has no network egress).

The reference downloads raw archives on first use
(e.g. ``datasets/ani.py:126-128``).  Here ``download_url`` attempts a
plain-urllib fetch and, on failure, raises an actionable error telling the
user to place the raw files manually.
"""

import os
import tarfile
import zipfile


def download_url(url: str, folder: str, filename: str = None) -> str:
    filename = filename or url.rsplit("/", 1)[-1].split("?")[0]
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    if os.path.exists(path):
        return path
    try:
        import urllib.request

        print(f"Downloading {url} -> {path}")
        urllib.request.urlretrieve(url, path)
        return path
    except Exception as exc:
        raise RuntimeError(
            f"Could not download {url} (no network access?). "
            f"Place the file manually at {path} and retry."
        ) from exc


def extract_tar(path: str, folder: str):
    with tarfile.open(path) as tf:
        tf.extractall(folder)


def extract_zip(path: str, folder: str):
    with zipfile.ZipFile(path) as zf:
        zf.extractall(folder)
