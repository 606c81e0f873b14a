"""Expression evaluation scopes.

Re-design of the reference's ``vaex/scopes.py`` (_BlockScope /
_BlockScopeSelection).  Two scopes exist because this engine splits every pass
into a *host stage* (per-chunk numpy/pyarrow compute: string kernels, calendar
ops) and a *device stage* (one traced JAX function per pass):

* :class:`HostScope` — evaluates an expression on one host chunk, resolving
  columns from the chunk dict, virtual columns recursively and functions from
  ``expression_namespace_host``.  Like the reference's per-chunk ``eval``.
* :class:`DeviceScope` — the same, but at *trace time*: names resolve to
  :class:`~vaex_tpu.ops.nullable.NA` tracers and functions come from the
  device namespace, so the whole expression set of a pass compiles into one
  XLA program.  ``eval`` runs once per compilation, never per chunk.

:func:`expression_is_device` classifies an (expanded) expression: it runs on
device iff every function it calls has a device impl and every leaf column is
primitive numeric.  Everything else is computed host-side and shipped to the
device as an extra tile input.
"""

from __future__ import annotations

import ast

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.compute as pc
except ImportError:  # pragma: no cover
    pa = pc = None

from . import array_types, expresso
from .datatype import DataType
from .ops.nullable import NA, wrap
from .registry import expression_namespace, expression_namespace_host, is_device_function, has_function


class HostStr:
    """Operator shim for arrow string arrays inside host ``eval``
    (the reference's NumpyDispatch role for strings)."""

    def __init__(self, ar):
        self.ar = ar

    def __eq__(self, other):
        other = other.ar if isinstance(other, HostStr) else other
        return np.asarray(pc.equal(self.ar, other))

    def __ne__(self, other):
        other = other.ar if isinstance(other, HostStr) else other
        return np.asarray(pc.not_equal(self.ar, other))

    def __add__(self, other):
        other = other.ar if isinstance(other, HostStr) else other
        return HostStr(pc.binary_join_element_wise(self.ar, other, ""))

    def __len__(self):
        return len(self.ar)

    def __hash__(self):
        return id(self)


def _host_unwrap(v):
    return v.ar if isinstance(v, HostStr) else v


def _host_wrap(v):
    if pa is not None and isinstance(v, (pa.Array, pa.ChunkedArray)):
        t = v.type
        if pa.types.is_dictionary(t):
            t = t.value_type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return HostStr(v)
        if (pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_struct(t)):
            return v  # nested arrow types stay arrow (str_split results etc.)
        return array_types.to_numpy(v)
    if isinstance(v, np.ndarray) and v.dtype == object:
        return HostStr(pa.array(v)) if pa is not None else v
    return v


def _unwrapping(f):
    def wrapped(*args, **kwargs):
        args = [_host_unwrap(a) for a in args]
        kwargs = {k: _host_unwrap(v) for k, v in kwargs.items()}
        return _host_wrap(f(*args, **kwargs))
    wrapped.__name__ = getattr(f, "__name__", "fn")
    return wrapped


_host_eval_namespace = None


def host_eval_namespace():
    global _host_eval_namespace
    ns = {name: _unwrapping(f) for name, f in expression_namespace_host.items()}
    # device-only functions that are pure jnp also work on host via numpy in
    # practice; expose nothing extra for now.
    ns["__builtins__"] = {}
    return ns


class HostScope:
    """Mapping used as eval() locals for one host chunk."""

    def __init__(self, df, i1, i2, chunks):
        self.df = df
        self.i1 = i1
        self.i2 = i2
        self.values = {}
        for name, chunk in chunks.items():
            self.values[name] = _host_wrap(array_types.to_numpy(chunk) if not (
                pa is not None and isinstance(chunk, (pa.Array, pa.ChunkedArray))) else chunk)

    def evaluate(self, expression):
        if expression in self.values:
            return self.values[expression]
        code = compile(expression, "<expr>", "eval")
        namespace = host_eval_namespace()
        for name, impl in getattr(self.df, "_function_impls", {}).items():
            namespace[name] = _unwrapping(impl)  # df-local UDFs
        result = eval(code, namespace, self)
        self.values[expression] = result
        return result

    def evaluate_raw(self, expression):
        """evaluate and unwrap to a plain host array."""
        v = _host_unwrap(self.evaluate(expression))
        if np.isscalar(v) or isinstance(v, (int, float, bool, np.generic)):
            n = self.i2 - self.i1
            v = np.full(n, v)
        return v

    def __getitem__(self, name):
        if name in self.values:
            return self.values[name]
        df = self.df
        if name in df.virtual_columns:
            value = self.evaluate(df.virtual_columns[name])
        elif name in df.variables:
            value = df.variables[name]
        else:
            raise KeyError(name)
        self.values[name] = value
        return value

    # a real Mapping protocol: eval() locals get introspected by tooling
    # (traceback suggestions iterate frame locals), which falls back to
    # integer __getitem__ without __iter__
    def __iter__(self):
        return iter(self.values)

    def __len__(self):
        return len(self.values)

    def keys(self):
        return self.values.keys()

    def __contains__(self, name):
        return (name in self.values or name in self.df.virtual_columns
                or name in self.df.variables)


def classify_leaves(df, expression):
    """Walk an expression (expanding virtual columns) and collect
    (function names, physical column names, variable names)."""
    funcs, columns, variables = set(), set(), set()
    seen = set()

    def walk(expr):
        if expr in seen:
            return
        seen.add(expr)
        tree = ast.parse(str(expr), mode="eval")
        for node in ast.walk(tree):
            if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
                funcs.add(node.func.id)
            elif isinstance(node, ast.Name):
                name = node.id
                if name in funcs:
                    continue
                if name in df.virtual_columns:
                    walk(df.virtual_columns[name])
                elif name in df.variables:
                    variables.add(name)
                elif name in df.get_column_names(hidden=True):
                    columns.add(name)
                elif has_function(name) or name in df.functions:
                    funcs.add(name)
                else:
                    columns.add(name)  # let evaluation raise a good error
    walk(str(expression))
    funcs2 = {f for f in funcs if has_function(f) or f in df.functions}
    columns -= funcs2
    return funcs2, columns, variables


def expression_is_device(df, expression) -> bool:
    """True if the expression can run entirely inside the traced pass."""
    funcs, columns, variables = classify_leaves(df, expression)
    for f in funcs:
        if not is_device_function(f):
            return False
    for c in columns:
        try:
            dt = df.data_type(c, expand=False)
        except Exception:
            return False
        if DataType(dt).numpy.kind not in "biuf":
            return False
    return True


class DeviceScope:
    """Mapping used as eval() locals at trace time.

    ``tile`` maps input names (physical columns and host-stage results) to NA
    values; ``aux_sets`` maps variable names to DeviceSetHandle.
    """

    def __init__(self, df, tile, aux_sets=None):
        self.df = df
        self.values = dict(tile)
        self.aux_sets = aux_sets or {}

    def evaluate(self, expression):
        if expression in self.values:
            return self.values[expression]
        code = compile(expression, "<expr>", "eval")
        namespace = dict(expression_namespace)
        namespace["__builtins__"] = {}
        result = eval(code, namespace, self)
        if not isinstance(result, NA):
            result = wrap(np.asarray(result))
        self.values[expression] = result
        return result

    def __getitem__(self, name):
        if name in self.values:
            return self.values[name]
        df = self.df
        if name in self.aux_sets:
            return self.aux_sets[name]
        if name in df.virtual_columns:
            value = self.evaluate(df.virtual_columns[name])
        elif name in df.variables:
            value = df.variables[name]
        else:
            raise KeyError(f"column or variable {name!r} not available on device")
        self.values[name] = value
        return value
