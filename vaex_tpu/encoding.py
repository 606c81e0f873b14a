"""State serialization: df.state_get / state_set.

Re-design of the reference's ``vaex/encoding.py`` (518 LoC) + the state logic
in dataframe.py:2250-2644.  The state captures the pure-metadata layer —
virtual columns, variables (including SortedSets), named selections, active
range, category metadata — so an ML pipeline (virtual-column transformations)
can be serialized and re-bound to another DataFrame with the same schema
(the reference's deployment mechanism, vaex-ml/state.py).
"""

from __future__ import annotations

import base64
import io

import numpy as np

from .ops.setops import SortedSet
from .selections import Selection


def _encode_array(ar):
    if isinstance(ar, np.ma.MaskedArray):
        return {"type": "masked-ndarray", "data": _encode_array(np.asarray(ar.data)),
                "mask": _encode_array(np.ma.getmaskarray(ar))}
    ar = np.asarray(ar)
    if ar.dtype == object:
        return {"type": "object-list", "values": [None if v is None else v for v in ar.tolist()]}
    buf = io.BytesIO()
    np.save(buf, ar, allow_pickle=False)
    return {"type": "ndarray", "b64": base64.b64encode(buf.getvalue()).decode()}


def _decode_array(spec):
    t = spec["type"]
    if t == "masked-ndarray":
        return np.ma.MaskedArray(_decode_array(spec["data"]), _decode_array(spec["mask"]))
    if t == "object-list":
        return np.asarray(spec["values"], dtype=object)
    return np.load(io.BytesIO(base64.b64decode(spec["b64"])), allow_pickle=False)


def _encode_variable(value):
    if isinstance(value, SortedSet):
        return {"type": "sorted-set",
                "dtype": "string" if value.is_string else str(value.dtype),
                "keys": _encode_array(value.keys),
                "counts": _encode_array(value.counts) if value.counts is not None else None,
                "nan_count": value.nan_count, "null_count": value.null_count}
    if isinstance(value, np.ndarray):
        return {"type": "array", "value": _encode_array(value)}
    if isinstance(value, (np.generic,)):
        return {"type": "scalar", "dtype": str(value.dtype), "value": value.item()}
    return {"type": "json", "value": value}


def _decode_variable(spec):
    t = spec["type"]
    if t == "sorted-set":
        s = SortedSet.__new__(SortedSet)
        dtype = spec["dtype"]
        s.is_string = dtype == "string"
        s.dtype = dtype if s.is_string else np.dtype(dtype)
        s.keys = _decode_array(spec["keys"])
        s.keep_counts = spec["counts"] is not None
        s.counts = _decode_array(spec["counts"]) if spec["counts"] is not None else None
        s.nan_count = spec["nan_count"]
        s.null_count = spec["null_count"]
        s.limit = None
        s._fingerprint = None
        return s
    if t == "array":
        return _decode_array(spec["value"])
    if t == "scalar":
        return np.dtype(spec["dtype"]).type(spec["value"])
    return spec["value"]


def _function_pickler():
    try:
        import cloudpickle
        return cloudpickle
    except ImportError:  # pragma: no cover
        import pickle
        return pickle


def state_get(df, skip=None):
    import base64
    pickler = _function_pickler()  # cloudpickle: lambdas/closures serialize too
    functions = {}
    for name, f in df.functions.items():
        try:
            functions[name] = base64.b64encode(pickler.dumps(f)).decode()
        except Exception:
            # the state would silently lose behavior — make it loud (the
            # reference gates function transport with trusted-mode errors)
            import logging
            logging.getLogger("vaex_tpu.encoding").warning(
                "function %r is not picklable and was DROPPED from the "
                "state; expressions using it will fail on state_set", name)
    return {
        "version": 1,
        "column_names": list(df.column_names),
        "virtual_columns": dict(df.virtual_columns),
        "variables": {k: _encode_variable(v) for k, v in df.variables.items()},
        "functions": functions,
        "selections": {name: sel.encode() for name, sel in df.selections.items()},
        "categories": {k: {"labels": list(np.asarray(v["labels"]).tolist()),
                           "N": v["N"], "min_value": v["min_value"]}
                       for k, v in df._categories.items()},
        "active_range": [df._index_start, df._index_end],
    }


def state_set(df, state, set_filter=True, trusted=True):
    df.virtual_columns = dict(state.get("virtual_columns", {}))
    df.variables = {k: _decode_variable(v) for k, v in state.get("variables", {}).items()}
    if trusted:
        # pickled functions execute arbitrary code: gated exactly like the
        # reference's token-trusted wire flag (websocket.py:18-120)
        import base64
        pickler = _function_pickler()
        for name, blob in state.get("functions", {}).items():
            try:
                f = pickler.loads(base64.b64decode(blob))
            except Exception:
                continue
            df.add_function(name, f, vectorize=True)
    for name in state.get("column_names", []):
        if name not in df.column_names:
            df.column_names.append(name)
    selections = {}
    for name, spec in state.get("selections", {}).items():
        if spec is not None:
            selections[name] = Selection.decode(spec)
    from .selections import FILTER_SELECTION_NAME
    if not set_filter:
        selections.pop(FILTER_SELECTION_NAME, None)
        if FILTER_SELECTION_NAME in df.selections:
            selections[FILTER_SELECTION_NAME] = df.selections[FILTER_SELECTION_NAME]
    df.selections = selections
    df._categories = {k: dict(v) for k, v in state.get("categories", {}).items()}
    df._selection_mask_cache = {}
    return df
