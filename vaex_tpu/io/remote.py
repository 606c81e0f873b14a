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


BLOCK = 1 << 20  # 1 MiB fetch granularity (reference file/cache.py:19-50)


class CachedFile:
    """Block-level lazy cache of one remote object (reference: ``CachedFile``
    + ``FileSystemHandlerCached``, vaex/file/cache.py:19-50).

    The local mirror is a sparse file with the remote's exact layout plus a
    one-byte-per-block presence map; reads fault in only the missing 1 MiB
    blocks with ranged GETs, so a column-subset query on a 100 GB object
    fetches only that column's bytes.  Also file-like (read/seek/tell) so
    h5py can parse metadata through it.
    """

    def __init__(self, fs, path, size, local_base):
        self.fs = fs
        self.path = path
        self.size = int(size)
        self.data_path = local_base + ".blocks"
        mask_path = local_base + ".present"
        n_blocks = max(-(-self.size // BLOCK), 1)
        fresh = not (os.path.exists(self.data_path) and os.path.exists(mask_path))
        if fresh:
            with open(self.data_path, "wb") as f:
                f.truncate(self.size)  # sparse
            with open(mask_path, "wb") as f:
                f.truncate(n_blocks)
        import numpy as np
        self.present = np.memmap(mask_path, dtype=np.uint8, mode="r+", shape=(n_blocks,))
        self._data = np.memmap(self.data_path, dtype=np.uint8, mode="r+",
                               shape=(self.size,)) if self.size else np.empty(0, np.uint8)
        self._pos = 0

    # -- block faulting ------------------------------------------------------
    def ensure(self, start, end):
        """Fetch any missing blocks covering [start, end)."""
        if self.size == 0 or end <= start:
            return
        end = min(end, self.size)
        b0, b1 = start // BLOCK, (end - 1) // BLOCK
        b = b0
        while b <= b1:
            if self.present[b]:
                b += 1
                continue
            run0 = b
            while b <= b1 and not self.present[b]:
                b += 1
            lo = run0 * BLOCK
            hi = min(b * BLOCK, self.size)
            data = self.fs.cat_file(self.path, start=lo, end=hi)
            self._data[lo:lo + len(data)] = memoryview(data)
            self.present[run0:b] = 1

    def read_range(self, start, end):
        self.ensure(start, end)
        return self._data[start:min(end, self.size)]

    @property
    def blocks_fetched(self):
        import numpy as np
        return int(np.asarray(self.present).sum())

    # -- file-like (h5py metadata parsing) ------------------------------------
    def read(self, n=-1):
        if n is None or n < 0:
            n = self.size - self._pos
        out = bytes(self.read_range(self._pos, self._pos + n))
        self._pos += len(out)
        return out

    def seek(self, offset, whence=0):
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self.size + offset
        return self._pos

    def tell(self):
        return self._pos

    def readable(self):
        return True

    def seekable(self):
        return True

    def flush(self):
        pass

    def close(self):
        pass


class ColumnBlockedRemote:
    """A column over a CachedFile region: slicing faults in only the touched
    blocks, then reads through a local memmap (reference: ColumnFile,
    vaex/file/column.py)."""

    def __init__(self, cached: CachedFile, offset, dtype, length):
        import numpy as np
        self.cached = cached
        self.offset = int(offset)
        self.dtype = np.dtype(dtype)
        self.length = int(length)
        self._view = np.memmap(cached.data_path, dtype=self.dtype, mode="r",
                               offset=self.offset, shape=(self.length,))

    def __len__(self):
        return self.length

    def __getitem__(self, item):
        if isinstance(item, slice):
            i1, i2, step = item.indices(self.length)
            self.cached.ensure(self.offset + i1 * self.dtype.itemsize,
                               self.offset + i2 * self.dtype.itemsize)
            return self._view[item]
        import numpy as np
        idx = np.asarray(item)
        if idx.size:
            lo = int(idx.min()) * self.dtype.itemsize
            hi = (int(idx.max()) + 1) * self.dtype.itemsize
            self.cached.ensure(self.offset + lo, self.offset + hi)
        return self._view[idx]


def open_cached(path, fs_options=None) -> CachedFile:
    """A block-cached handle on a remote object (no full download)."""
    import fsspec
    fs_options = fs_options or {}
    protocol = str(path).split("://", 1)[0]
    fs = fsspec.filesystem(protocol, **fs_options)
    info = fs.info(path)
    size = info.get("size") or 0
    token = f"{path}-{size}-{info.get('mtime', info.get('LastModified', ''))}"
    key = hashlib.sha256(token.encode()).hexdigest()[:24]
    name = os.path.basename(str(path).rstrip("/")) or "data"
    return CachedFile(fs, path, size, os.path.join(cache_dir(), f"{key}-{name}"))


def open_remote(path, fs_options=None):
    from .. import open as open_local
    p = str(path)
    base = p.split("?", 1)[0].lower()
    if base.endswith((".hdf5", ".h5")):
        from .hdf5 import Hdf5Dataset
        from .. import from_dataset
        cached = open_cached(p, fs_options)
        return from_dataset(Hdf5Dataset(p, cached=cached))
    if base.endswith((".parquet", ".pq")):
        # pyarrow datasets do their own ranged reads over fsspec: row groups
        # stream lazily, nothing is downloaded up front
        import fsspec
        from .arrow import ParquetDataset
        from .. import from_dataset
        protocol = p.split("://", 1)[0]
        fs = fsspec.filesystem(protocol, **(fs_options or {}))
        return from_dataset(ParquetDataset(p, filesystem=fs))
    local = fetch(path, fs_options)
    return open_local(local)
