"""Arrow IPC / Parquet / Feather / CSV ingestion and export.

Replaces the reference's ``vaex/arrow/dataset.py`` (DatasetArrowBase /
DatasetParquet fragment streaming) and the pyarrow-writer export methods
(reference dataframe.py:6344-6425).
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import pyarrow.feather as pafeather
    import pyarrow.csv as pacsv
except ImportError:  # pragma: no cover
    pa = pads = pq = pafeather = pacsv = None

from ..dataset import DatasetFile


class ArrowTableDataset(DatasetFile):
    """A pyarrow Table as a Dataset (chunks stream per column slice)."""

    def __init__(self, table, path="memory"):
        self.table = table
        super().__init__(path)
        self._columns = {}
        for name in table.column_names:
            col = table.column(name)
            self._columns[name] = col.combine_chunks() if col.num_chunks > 1 else (
                col.chunk(0) if col.num_chunks == 1 else col.combine_chunks())
        self._row_count = table.num_rows

    def _compute_fingerprint(self):
        from ..utils import fingerprint
        if self.path != "memory":
            import os
            if os.path.exists(self.path):
                stat = os.stat(self.path)
                return fingerprint("arrow-file", str(self.path), stat.st_size, stat.st_mtime)
        return fingerprint("arrow-table", self.table.schema.to_string(), self.table.num_rows,
                           id(self.table))


class ParquetDataset(DatasetFile):
    """Lazy parquet: row groups stream on demand (reference
    vaex/arrow/dataset.py:69-188 fragment-based _chunk_producer)."""

    def __init__(self, path, filesystem=None):
        super().__init__(path)
        if filesystem is not None:
            # remote: pyarrow issues ranged reads through the fsspec handle,
            # so row groups stream lazily (reference vaex/file + arrow fs)
            self._file = pq.ParquetFile(filesystem.open(str(path).split("://", 1)[1]
                                                        if "://" in str(path) else path, "rb"))
            self._remote = True
        else:
            self._file = pq.ParquetFile(path)
            self._remote = False
        self._row_count = self._file.metadata.num_rows
        schema = self._file.schema_arrow
        self._schema = schema
        # lazy columns: slices read via row-group pruning
        for name in schema.names:
            self._columns[name] = _ParquetColumn(self, name)

    def chunk_iterator(self, columns, chunk_size=None, reverse=False):
        chunk_size = chunk_size or 1024 * 1024
        if reverse:
            raise NotImplementedError
        pending = {name: [] for name in columns}
        pending_rows = 0
        offset = 0
        from .. import array_types

        def flush(n):
            nonlocal pending_rows, offset
            out = {}
            for name in columns:
                parts = pending[name]
                joined = array_types.concat(parts) if len(parts) > 1 else parts[0]
                out[name] = array_types.slice_array(joined, 0, n)
                rest = array_types.slice_array(joined, n, pending_rows)
                pending[name] = [rest] if pending_rows - n else []
            i1 = offset
            offset += n
            pending_rows -= n
            return i1, offset, out

        if self._row_count == 0 or not columns:
            n = self._row_count
            for i1 in range(0, max(n, 1), chunk_size):
                yield i1, min(i1 + chunk_size, n), {}
                if n == 0:
                    return
            return
        for batch in self._file.iter_batches(columns=list(columns)):
            for name in columns:
                pending[name].append(batch.column(name))
            pending_rows += batch.num_rows
            while pending_rows >= chunk_size:
                yield flush(chunk_size)
        if pending_rows:
            yield flush(pending_rows)


class _ParquetColumn:
    def __init__(self, dataset, name):
        self.dataset = dataset
        self.name = name

    def __len__(self):
        return self.dataset.row_count

    @property
    def dtype(self):
        return self.dataset._schema.field(self.name).type

    def __getitem__(self, item):
        if not isinstance(item, slice):
            raise TypeError
        start, stop, step = item.indices(len(self))
        assert step == 1
        f = self.dataset._file
        # row-group pruning
        out = []
        row = 0
        for rg in range(f.num_row_groups):
            n = f.metadata.row_group(rg).num_rows
            if row + n <= start:
                row += n
                continue
            if row >= stop:
                break
            t = f.read_row_group(rg, columns=[self.name])
            col = t.column(0)
            lo = max(start - row, 0)
            hi = min(stop - row, n)
            out.append(col.slice(lo, hi - lo))
            row += n
        if not out:
            return pa.chunked_array([], type=self.dtype)
        chunks = []
        for c in out:
            chunks.extend(c.chunks if isinstance(c, pa.ChunkedArray) else [c])
        return pa.chunked_array(chunks)


def open_arrow(path):
    from .. import from_dataset
    with pa.memory_map(path) as source:
        try:
            table = pa.ipc.open_file(source).read_all()
        except pa.ArrowInvalid:
            table = pa.ipc.open_stream(source).read_all()
    return from_dataset(ArrowTableDataset(table, path))


def open_feather(path):
    from .. import from_dataset
    table = pafeather.read_table(path)
    return from_dataset(ArrowTableDataset(table, path))


def open_parquet(path):
    from .. import from_dataset
    return from_dataset(ParquetDataset(path))


def open_csv(path, **kwargs):
    from .. import from_dataset
    table = pacsv.read_csv(path)
    return from_dataset(ArrowTableDataset(table, path))


def export_parquet(df, path, chunk_size=None):
    table = df.to_arrow_table()
    pq.write_table(table, path)
    return path


def export_arrow(df, path, chunk_size=None):
    table = df.to_arrow_table()
    with pa.OSFile(str(path), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
    return path


def export_feather(df, path, compression="lz4"):
    table = df.to_arrow_table()
    pafeather.write_feather(table, path, compression=compression)
    return path
