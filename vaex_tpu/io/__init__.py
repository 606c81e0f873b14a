"""File ingestion/export: HDF5 (vaex layout), Arrow IPC, Parquet, Feather, CSV.

Replaces the reference's ``packages/vaex-hdf5`` + ``vaex/arrow/dataset.py`` +
per-format export methods.  All openers return a :class:`vaex_tpu.dataset.Dataset`;
HDF5 columns are memory-mapped numpy views (zero read cost at open), arrow/
parquet use pyarrow datasets with fragment streaming.
"""

from . import hdf5, arrow, export  # noqa: F401
