"""Host array conversions: numpy <-> numpy.ma <-> pyarrow.

Re-design of the reference's ``vaex/array_types.py`` (337 LoC) +
``vaex/arrow/convert.py``.  The canonical in-engine host representation is
"numpy data + optional boolean null mask" (mask True == missing, numpy.ma
convention), which maps 1:1 onto the device tile representation
(:class:`vaex_tpu.ops.nullable.NA`).  Arrow arrays are accepted everywhere and
converted lazily at chunk boundaries.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

from .datatype import DataType

supported_array_types = (np.ndarray,) + ((pa.Array, pa.ChunkedArray) if pa else ())

string_kinds = "US"


def is_string_array(x) -> bool:
    if pa is not None and isinstance(x, (pa.Array, pa.ChunkedArray)):
        t = x.type
        if pa.types.is_dictionary(t):
            t = t.value_type
        return pa.types.is_string(t) or pa.types.is_large_string(t)
    x = np.asarray(x) if not isinstance(x, np.ndarray) else x
    return x.dtype.kind in string_kinds or (
        x.dtype == object and len(x) > 0 and isinstance(x[np.argmax(x != None)] if (x != None).any() else None, str))


def to_numpy(x, strict=False):
    """Convert to a numpy array (masked if it carries nulls)."""
    if isinstance(x, np.ma.MaskedArray) or isinstance(x, np.ndarray):
        return x
    if pa is not None and isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if pa is not None and isinstance(x, pa.Array):
        if pa.types.is_dictionary(x.type):
            x = x.dictionary_decode()
        if x.null_count:
            if pa.types.is_string(x.type) or pa.types.is_large_string(x.type):
                data = np.asarray(x.to_pylist(), dtype=object)
                mask = np.asarray(x.is_null())
                return np.ma.MaskedArray(data, mask)
            dtype = DataType(x.type).numpy
            mask = np.asarray(x.is_null())
            data = np.asarray(x.fill_null(_null_fill_value(dtype))).astype(dtype, copy=False)
            return np.ma.MaskedArray(data, mask)
        if pa.types.is_string(x.type) or pa.types.is_large_string(x.type):
            return np.asarray(x.to_pylist(), dtype=object)
        return np.asarray(x)
    if hasattr(x, "to_numpy"):  # pandas
        return x.to_numpy()
    return np.asarray(x)


def _null_fill_value(dtype: np.dtype):
    if dtype.kind == "f":
        return float("nan")
    if dtype.kind in "iu":
        return 0
    if dtype.kind == "b":
        return False
    if dtype.kind in "Mm":
        return 0
    return 0


def to_arrow(x):
    if pa is None:
        raise ImportError("pyarrow required")
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x
    if isinstance(x, np.ma.MaskedArray):
        return pa.array(x.data, mask=np.asarray(x.mask) if x.mask is not np.ma.nomask else None)
    return pa.array(x)


def data_and_mask(x):
    """Split any host array into (plain ndarray data, bool null-mask or None)."""
    x = to_numpy(x)
    if isinstance(x, np.ma.MaskedArray):
        mask = np.ma.getmaskarray(x)
        return np.asarray(x.data), (mask if mask.any() else None)
    return x, None


def slice_array(x, i1, i2):
    if pa is not None and isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x.slice(i1, i2 - i1)
    return x[i1:i2]


def take(x, indices):
    if pa is not None and isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x.take(pa.array(np.asarray(indices)))
    return x[indices]


def concat(arrays):
    arrays = list(arrays)
    if len(arrays) == 1:
        return arrays[0]
    if pa is not None and any(isinstance(a, (pa.Array, pa.ChunkedArray)) for a in arrays):
        chunks = []
        for a in arrays:
            a = to_arrow(a)
            if isinstance(a, pa.ChunkedArray):
                chunks.extend(a.chunks)
            else:
                chunks.append(a)
        # unify types (e.g. string vs large_string)
        t = chunks[0].type
        for c in chunks[1:]:
            if c.type != t:
                t = _promote_arrow(t, c.type)
        chunks = [c.cast(t) if c.type != t else c for c in chunks]
        return pa.chunked_array(chunks, type=t)
    if any(isinstance(a, np.ma.MaskedArray) for a in arrays):
        return np.ma.concatenate(arrays)
    return np.concatenate(arrays)


def _promote_arrow(t1, t2):
    if {t1, t2} == {pa.string(), pa.large_string()}:
        return pa.large_string()
    n1, n2 = DataType(t1).numpy, DataType(t2).numpy
    return pa.from_numpy_dtype(np.promote_types(n1, n2))


def length(x) -> int:
    return len(x)


def full(n, value, dtype):
    return np.full(n, value, dtype=dtype)


def required_dtype_for_max(n: int, signed=True) -> np.dtype:
    """Smallest integer dtype able to hold values up to n.

    Reference: join.py:177 lookup-dtype minimization.
    """
    kinds = ["int8", "int16", "int32", "int64"] if signed else ["uint8", "uint16", "uint32", "uint64"]
    for name in kinds:
        if n <= np.iinfo(name).max:
            return np.dtype(name)
    raise ValueError(n)
