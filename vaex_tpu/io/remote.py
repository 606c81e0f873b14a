"""Remote file access (s3://, gs://, http://, memory://, ...) via fsspec.

Re-design of the reference's ``vaex/file/`` layer (s3/gcs handlers +
``CachedFile`` mmap-backed block cache, file/cache.py): remote objects are
materialized once into a local content cache (keyed by url + size + mtime)
and then opened through the normal zero-cost local path (mmap for hdf5,
row-group streaming for parquet), so repeated opens cost nothing and the
data never resides in python memory.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def cache_dir():
    d = os.environ.get("VAEX_TPU_FILE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".vaex_tpu", "file-cache"))
    os.makedirs(d, exist_ok=True)
    return d


def is_remote(path: str) -> bool:
    return "://" in str(path) and not str(path).startswith("file://")


def fetch(path: str, fs_options=None) -> str:
    """Return a local path for a remote url, downloading into the cache once."""
    import fsspec
    fs_options = fs_options or {}
    protocol = str(path).split("://", 1)[0]
    fs = fsspec.filesystem(protocol, **fs_options)
    try:
        info = fs.info(path)
        token = f"{path}-{info.get('size')}-{info.get('mtime', info.get('LastModified', ''))}"
    except Exception:
        token = str(path)
    key = hashlib.sha256(token.encode()).hexdigest()[:24]
    name = os.path.basename(str(path).rstrip("/")) or "data"
    local = os.path.join(cache_dir(), f"{key}-{name}")
    if not os.path.exists(local):
        tmp = local + ".tmp"
        with fs.open(path, "rb") as src, open(tmp, "wb") as dst:
            shutil.copyfileobj(src, dst, length=1 << 20)
        os.replace(tmp, local)  # atomic: concurrent opens see all-or-nothing
    return local


def open_remote(path, fs_options=None):
    from .. import open as open_local
    local = fetch(path, fs_options)
    return open_local(local)
