"""Server-side service: executes remote calls against registered DataFrames.

Re-design of the reference's ``vaex-server/service.py`` (Service /
AsyncThreadedService).  The reference decodes serialized *tasks* and schedules
them on a server-side executor; here the unit is a *method call* + the
client's DataFrame state — the same observable surface with a much smaller
wire protocol, since all heavy state (sets, masks) is derivable server-side
and cached by fingerprint.
"""

from __future__ import annotations

import numpy as np

from .. import encoding as enc


# methods a client may invoke on a served DataFrame
ALLOWED_METHODS = {
    "count", "sum", "mean", "std", "var", "min", "max", "minmax", "first",
    "nunique", "limits", "limits_percentage", "percentile_approx",
    "median_approx", "covar", "correlation", "mode", "unique", "evaluate",
    "__len__", "data_type", "groupby_agg",
}
# methods that need trusted mode (arbitrary expressions are fine; pickled
# functions are not — reference websocket.py token-trusted gate)
TRUSTED_METHODS = {"add_function"}


def encode_result(value):
    if isinstance(value, (np.ndarray, np.ma.MaskedArray)):
        return {"kind": "array", "data": enc._encode_array(value)}
    if isinstance(value, np.generic):
        return {"kind": "scalar", "dtype": str(value.dtype), "value": value.item()}
    if isinstance(value, (list, tuple)):
        return {"kind": "list", "items": [encode_result(v) for v in value]}
    if isinstance(value, dict):
        return {"kind": "dict", "items": {k: encode_result(v) for k, v in value.items()}}
    return {"kind": "json", "value": value}


def decode_result(spec):
    kind = spec["kind"]
    if kind == "array":
        return enc._decode_array(spec["data"])
    if kind == "scalar":
        return np.dtype(spec["dtype"]).type(spec["value"])
    if kind == "list":
        return [decode_result(v) for v in spec["items"]]
    if kind == "dict":
        return {k: decode_result(v) for k, v in spec["items"].items()}
    return spec["value"]


def _decode_agg_spec(spec):
    """Wire agg specs: strings pass through, {'name': ['sum', 'col']} pairs
    become descriptors."""
    from .. import agg as agg_module
    if isinstance(spec, str):
        return spec
    if isinstance(spec, dict):
        out = {}
        for name, s in spec.items():
            if isinstance(s, (list, tuple)) and len(s) == 2 and isinstance(s[0], str):
                out[name] = agg_module.aggregates[s[0]](s[1])
            else:
                out[name] = s
        return out
    return spec


class AuthError(PermissionError):
    pass


class Service:
    """``token`` gates all access; ``token_trusted`` additionally unlocks
    trusted mode (pickled functions in state) for requests presenting it —
    the reference's ``auth: {token, token-trusted}`` scheme
    (vaex-server/websocket.py:18-120)."""

    def __init__(self, dataframes: dict, trusted=False, token=None, token_trusted=None):
        self.dataframes = dict(dataframes)
        self.trusted = trusted
        self.token = token
        self.token_trusted = token_trusted

    def check_auth(self, auth=None):
        """-> trusted flag for this request; raises AuthError when locked."""
        auth = auth or {}
        presented = auth.get("token")
        presented_trusted = auth.get("token-trusted")
        if self.token_trusted is not None and presented_trusted == self.token_trusted:
            return True
        if self.token is not None:
            if presented != self.token:
                raise AuthError("invalid or missing token")
            return self.trusted
        if self.token_trusted is not None and presented_trusted is not None:
            raise AuthError("invalid trusted token")
        return self.trusted

    def list_dataframes(self):
        out = {}
        for name, df in self.dataframes.items():
            out[name] = {
                "row_count": df.length_original(),
                "column_names": df.get_column_names(),
                "dtypes": {c: str(df.data_type(c).name) for c in df.get_column_names()},
            }
        return out

    def call(self, df_name, method, args, kwargs, state=None, trusted=None,
             on_progress=None):
        if df_name not in self.dataframes:
            raise KeyError(f"no such dataframe: {df_name!r}")
        if method not in ALLOWED_METHODS:
            raise PermissionError(f"method {method!r} not allowed")
        df = self.dataframes[df_name].copy()
        if state:
            # pickled functions in client state only execute in trusted mode
            # (reference: token-trusted gate, websocket.py)
            df.state_set(state, trusted=self.trusted if trusted is None else trusted)
        if on_progress is not None:
            return self._call_with_progress(df, method, args, kwargs, on_progress)
        return self._invoke(df, method, args, kwargs)

    def _call_with_progress(self, df, method, args, kwargs, on_progress):
        """Stream executor progress to ``on_progress`` (throttled ~10/s, like
        the reference's {progress: f} websocket messages, websocket.py:60-78).
        A False return requests cancellation."""
        import time
        last = [0.0]

        def forward(fraction):
            now = time.monotonic()
            if fraction >= 1.0 or now - last[0] > 0.1:
                last[0] = now
                return on_progress(float(fraction)) is not False
            return True

        df.executor.signal_progress.connect(forward)
        try:
            return self._invoke(df, method, args, kwargs)
        finally:
            df.executor.signal_progress.disconnect(forward)

    def _invoke(self, df, method, args, kwargs):
        if method == "__len__":
            return len(df)
        if method == "groupby_agg":
            by, agg_spec = args[0], args[1]
            gb = df.groupby(by, agg=_decode_agg_spec(agg_spec), sort=kwargs.get("sort", True))
            return {name: gb.evaluate(name, array_type="numpy")
                    for name in gb.get_column_names()}
        result = getattr(df, method)(*args, **kwargs)
        from ..array_types import to_numpy
        if hasattr(result, "internal"):  # DataType
            result = str(result.name)
        try:
            import pyarrow as pa
            if isinstance(result, (pa.Array, pa.ChunkedArray)):
                result = to_numpy(result)
        except ImportError:
            pass
        return result


class DummyTransport:
    """In-process client<->service wiring for tests (reference: dummy.py +
    tests/common.py:139-145 dummy_client)."""

    def __init__(self, service: Service):
        self.service = service

    def request(self, msg, on_progress=None):
        import traceback
        try:
            trusted = self.service.check_auth(msg.get("auth"))
            command = msg["command"]
            if command == "list":
                return {"result": encode_result(self.service.list_dataframes())}
            if command == "call":
                value = self.service.call(msg["df"], msg["method"],
                                          decode_result(msg.get("args", {"kind": "list", "items": []})),
                                          decode_result(msg.get("kwargs", {"kind": "dict", "items": {}})),
                                          state=msg.get("state"), trusted=trusted,
                                          on_progress=on_progress)
                return {"result": encode_result(value)}
            raise ValueError(f"unknown command {command!r}")
        except Exception as e:  # noqa: BLE001 - errors cross the wire
            return {"error": str(e), "traceback": traceback.format_exc()}
