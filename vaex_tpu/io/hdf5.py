"""HDF5 open (mmap) + export, vaex file layout.

Re-design of ``packages/vaex-hdf5`` (dataset.py:58-412 Hdf5MemoryMapped,
writer.py Writer).  Layout: ``/table/columns/<name>/data`` plus optional
``mask`` sibling (inverted-validity bool), strings as ``data``+``indices``
arrow layout (later round).  Columns are mapped with ``np.memmap`` so opening
is metadata-only and tiles stream at disk/page-cache bandwidth into the
device pipeline — the reference's out-of-core story, unchanged on the host
side.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from ..dataset import DatasetFile


class Hdf5Dataset(DatasetFile):
    """Memory-mapped vaex-layout hdf5 file.

    With ``cached=`` (an :class:`~vaex_tpu.io.remote.CachedFile`) the file is
    a remote object behind a 1 MiB block cache: h5py parses metadata through
    the file-like handle, and columns become
    :class:`~vaex_tpu.io.remote.ColumnBlockedRemote` that fault in only the
    byte ranges a query touches (reference: vaex/file/cache.py:19-50 +
    vaex/file/column.py ColumnFile)."""

    def __init__(self, path, cached=None):
        super().__init__(path)
        assert h5py is not None, "h5py is required for hdf5 files"
        self._cached = cached
        self._load()

    def _load(self):
        with h5py.File(self._cached if self._cached is not None else self.path, "r") as f:
            root = None
            for candidate in ("table/columns", "columns", "data"):
                if candidate in f:
                    root = candidate
                    break
            if root is None:
                raise IOError(f"{self.path}: no vaex column layout found")
            columns = {}
            for name in f[root]:
                node = f[root][name]
                if isinstance(node, h5py.Dataset):
                    ds = node
                    mask_ds = None
                else:
                    if "data" not in node:
                        continue
                    ds = node["data"]
                    mask_ds = node.get("mask")
                columns[name] = self._map_array(ds, mask_ds)
        for name, col in columns.items():
            self.add_column(name, col)

    def _map_array(self, ds, mask_ds):
        """Map by file offset (reference hdf5/dataset.py:246 _map_hdf5_array)."""
        if h5py.check_string_dtype(ds.dtype):
            import pyarrow as pa
            data = ds.asstr()[:]
            return pa.array([None if v is None else str(v) for v in data])
        offset = ds.id.get_offset()
        logical = ds.attrs.get("dtype")
        if self._cached is not None:
            if (offset is None or ds.compression is not None or mask_ds is not None
                    or (logical is not None and np.dtype(logical).kind in "Mm")):
                # compressed/masked/datetime remote columns: read eagerly
                # through the block cache (still only this column's blocks)
                data = ds[:]
                if logical is not None and np.dtype(logical).kind in "Mm":
                    data = data.view(np.dtype(logical))
                if mask_ds is not None:
                    return np.ma.MaskedArray(data, ~mask_ds[:].astype(bool))
                return data
            from .remote import ColumnBlockedRemote
            return ColumnBlockedRemote(self._cached, offset, ds.dtype, ds.shape[0])
        if offset is None or ds.compression is not None:
            data = ds[:]
        else:
            data = np.memmap(self.path, dtype=ds.dtype, shape=ds.shape,
                             offset=offset, mode="r")
        if logical is not None and np.dtype(logical).kind in "Mm":
            data = data.view(np.dtype(logical))
        if mask_ds is not None:
            moffset = mask_ds.id.get_offset()
            if moffset is None or mask_ds.compression is not None:
                mask = mask_ds[:]
            else:
                mask = np.memmap(self.path, dtype=mask_ds.dtype, shape=mask_ds.shape,
                                 offset=moffset, mode="r")
            return np.ma.MaskedArray(data, ~mask.astype(bool))
        return data


def open_hdf5(path):
    from .. import from_dataset
    return from_dataset(Hdf5Dataset(path))


def export_hdf5(df, path, progress=None, chunk_size=None, byteorder="="):
    """Chunked export in the vaex layout (reference vaex-hdf5/writer.py:19)."""
    assert h5py is not None
    from .. import array_types, settings
    from ..datatype import DataType
    chunk_size = chunk_size or df._tile_rows or settings.TILE_ROWS
    names = df.get_column_names()
    n = len(df)
    with h5py.File(path, "w") as f:
        table = f.create_group("table")
        table.attrs["type"] = "table"
        columns = table.create_group("columns")
        writers = {}
        for name in names:
            dt = DataType(df.data_type(name))
            g = columns.create_group(name)
            if dt.is_string:
                # strings stored as utf-8 bytes + offsets (arrow-ish)
                writers[name] = _StringWriter(g, n)
            else:
                npdt = dt.numpy
                if npdt.kind == "M":
                    ds = g.create_dataset("data", (n,), dtype=np.int64)
                    ds.attrs["dtype"] = str(npdt)
                    writers[name] = _PrimitiveWriter(ds, None, datetime64=npdt)
                else:
                    ds = g.create_dataset("data", (n,), dtype=npdt)
                    writers[name] = _PrimitiveWriter(ds, g, maybe_mask=True, length=n)
        for i1, i2, _ in df.evaluate_iterator(names[0], chunk_size=chunk_size) if names else []:
            for name in names:
                values = df.evaluate(name, i1, i2)
                writers[name].write(i1, i2, values)
    return path


class _PrimitiveWriter:
    def __init__(self, ds, group, maybe_mask=False, length=None, datetime64=None):
        self.ds = ds
        self.group = group
        self.maybe_mask = maybe_mask
        self.length = length
        self.mask_ds = None
        self.datetime64 = datetime64

    def write(self, i1, i2, values):
        from .. import array_types
        data, mask = array_types.data_and_mask(values)
        if self.datetime64 is not None:
            data = data.view(np.int64)
        self.ds[i1:i2] = data
        if mask is not None and self.maybe_mask:
            if self.mask_ds is None:
                self.mask_ds = self.group.create_dataset("mask", (self.length,), dtype=bool)
                self.mask_ds[:] = True
            self.mask_ds[i1:i2] = ~mask


class _StringWriter:
    """Round 1: strings via h5py variable-length strings (simple, readable)."""

    def __init__(self, group, n):
        self.ds = group.create_dataset("data", (n,), dtype=h5py.string_dtype())

    def write(self, i1, i2, values):
        from .. import array_types
        data, mask = array_types.data_and_mask(values)
        out = ["" if (mask is not None and mask[k]) or v is None else str(v)
               for k, v in enumerate(data)]
        self.ds[i1:i2] = out
