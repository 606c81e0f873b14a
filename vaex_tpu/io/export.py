"""Generic export dispatch + CSV (reference vaex/export.py + dataframe.py:6565)."""

from __future__ import annotations

import os


def export(df, path, progress=None, chunk_size=None):
    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".hdf5", ".h5"):
        from . import hdf5
        return hdf5.export_hdf5(df, path, chunk_size=chunk_size)
    if ext == ".parquet":
        from . import arrow
        return arrow.export_parquet(df, path, chunk_size=chunk_size)
    if ext == ".arrow":
        from . import arrow
        return arrow.export_arrow(df, path, chunk_size=chunk_size)
    if ext == ".feather":
        from . import arrow
        return arrow.export_feather(df, path)
    if ext == ".fits":
        from . import fits
        return fits.export_fits(df, path)
    if ext in (".vot", ".votable"):
        from . import votable
        return votable.export_votable(df, path)
    if ext == ".csv":
        return export_csv(df, path, chunk_size=chunk_size)
    if ext == ".json":
        return export_json(df, path)
    raise ValueError(f"unsupported export format: {ext}")


def export_csv(df, path, chunk_size=None, **kwargs):
    """Chunked CSV via pandas (reference dataframe.py:6565)."""
    from .. import settings
    chunk_size = chunk_size or df._tile_rows or settings.TILE_ROWS
    first = True
    names = df.get_column_names()
    n = len(df)
    mode = "w"
    for i1 in range(0, max(n, 1), chunk_size):
        i2 = min(i1 + chunk_size, n)
        pdf = df[i1:i2].to_pandas_df(names) if n else df.to_pandas_df(names)
        pdf.to_csv(path, index=False, header=first, mode=mode, **kwargs)
        first = False
        mode = "a"
        if n == 0:
            break
    return path


def export_json(df, path):
    import json
    records = df.to_records()
    with open(path, "w") as f:
        json.dump(records, f, default=str)
    return path
