"""Expression: operator-overloaded, string-backed lazy column expressions.

Re-design of the reference's ``vaex/expression.py`` (1647 LoC).  An
Expression is (DataFrame, expression-string); every operator builds a new
string; evaluation happens only inside an executor pass where the string is
compiled into the pass's traced XLA program (numeric) or evaluated per chunk
on the host (strings/datetimes).
"""

from __future__ import annotations

import functools

import numpy as np

from . import expresso
from .registry import install_all_on_expression


def _to_expression_string(df, value):
    if isinstance(value, Expression):
        return f"({value.expression})"
    if isinstance(value, str):
        return repr(value)
    if isinstance(value, (bool, int, float)):
        return repr(value)
    if isinstance(value, np.generic):
        if value.dtype.kind in "Mm":
            name = df.add_variable("literal", value, unique=True)
            return name
        return repr(value.item())
    if value is None:
        return "None"
    # arrays, datetimes, anything non-literal: become a variable
    name = df.add_variable("literal", value, unique=True)
    return name


_binary_ops = {
    "add": "+", "sub": "-", "mul": "*", "truediv": "/", "floordiv": "//",
    "mod": "%", "pow": "**", "and": "&", "or": "|", "xor": "^",
    "lshift": "<<", "rshift": ">>",
}
_comparison_ops = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "==", "ne": "!="}
_unary_ops = {"neg": "-", "pos": "+", "invert": "~"}


class Meta(type):
    def __new__(mcs, name, bases, attrs):
        for opname, symbol in {**_binary_ops, **_comparison_ops}.items():
            def closure(symbol=symbol):
                def operator_fn(self, other):
                    rhs = _to_expression_string(self.df, other)
                    return Expression(self.df, f"({self.expression} {symbol} {rhs})")
                return operator_fn

            def rclosure(symbol=symbol):
                def operator_fn(self, other):
                    lhs = _to_expression_string(self.df, other)
                    return Expression(self.df, f"({lhs} {symbol} {self.expression})")
                return operator_fn
            attrs[f"__{opname}__"] = closure()
            if opname not in _comparison_ops:
                attrs[f"__r{opname}__"] = rclosure()
        for opname, symbol in _unary_ops.items():
            def uclosure(symbol=symbol):
                def operator_fn(self):
                    return Expression(self.df, f"({symbol}({self.expression}))")
                return operator_fn
            attrs[f"__{opname}__"] = uclosure()
        return type.__new__(mcs, name, bases, attrs)


class StringOperations:
    """``expr.str`` accessor (reference expression.py:170-200)."""

    def __init__(self, expression):
        self.expression = expression


class StringOperationsPandas:
    def __init__(self, expression):
        self.expression = expression


class DateTime:
    """``expr.dt`` accessor (reference expression.py:201+)."""

    def __init__(self, expression):
        self.expression = expression


class TimeDelta:
    def __init__(self, expression):
        self.expression = expression


_scope_accessors = {"str": StringOperations, "str_pandas": StringOperationsPandas,
                    "dt": DateTime, "td": TimeDelta}


def get_scope_accessor(scope):
    return _scope_accessors[scope]


class Expression(metaclass=Meta):
    def __init__(self, df, expression, validate=True):
        self.df = df
        if isinstance(expression, Expression):
            expression = expression.expression
        self.expression = str(expression)

    @property
    def ast(self):
        return expresso.parse_expression(self.expression)

    def __str__(self):
        return self.expression

    def __repr__(self):
        return self._repr_plain_()

    def _repr_plain_(self):
        from .formatting import format_expression_preview
        return format_expression_preview(self)

    def __hash__(self):
        return hash((id(self.df), self.expression))

    def __abs__(self):
        return Expression(self.df, f"abs({self.expression})")

    def __getitem__(self, item):
        if isinstance(item, slice):
            return Expression(self.df, f"({self.expression})") if item == slice(None) else \
                self.df[item][self.expression]
        raise TypeError(f"unsupported index {item!r}")

    # -- accessors -----------------------------------------------------------
    @property
    def str(self):
        return StringOperations(self)

    @property
    def str_pandas(self):
        return StringOperationsPandas(self)

    @property
    def dt(self):
        return DateTime(self)

    @property
    def td(self):
        return TimeDelta(self)

    def _call_function(self, full_name, *args, **kwargs):
        parts = [self.expression]
        for a in args:
            parts.append(_to_expression_string(self.df, a))
        for k, v in kwargs.items():
            parts.append(f"{k}={_to_expression_string(self.df, v)}")
        return Expression(self.df, f"{full_name}({', '.join(parts)})")

    # -- structure -----------------------------------------------------------
    @property
    def dtype(self):
        return self.df.data_type(self.expression)

    def data_type(self):
        return self.df.data_type(self.expression)

    def expand(self, stop=()):
        """Resolve virtual columns (reference expression.py:653)."""
        df = self.df

        def translator(name):
            if name in stop:
                return None
            if name in df.virtual_columns:
                return f"({Expression(df, df.virtual_columns[name]).expand(stop=stop).expression})"
            return None
        expr = self.expression
        prev = None
        while prev != expr:
            prev = expr
            expr = expresso.substitute(expr, {
                name: f"({df.virtual_columns[name]})" for name in expresso.collect_names(expr)
                if name in df.virtual_columns and name not in stop})
        return Expression(df, expr)

    def variables(self, ourself=False, expand_virtual=True):
        """Names of columns/variables this expression depends on."""
        from .scopes import classify_leaves
        funcs, columns, variables = classify_leaves(self.df, self.expression)
        return columns | variables

    def fingerprint(self):
        from .utils import fingerprint
        return fingerprint("expression", self.expression, self.df.fingerprint())

    def derivative(self, var, simplify=True):
        if isinstance(var, Expression):
            var = var.expression
        return Expression(self.df, expresso.derivative(self.expression, var, simplify=simplify))

    # -- evaluation ----------------------------------------------------------
    def evaluate(self, i1=None, i2=None, parallel=True, array_type=None):
        return self.df.evaluate(self, i1=i1, i2=i2, parallel=parallel, array_type=array_type)

    @property
    def values(self):
        return self.evaluate()

    def to_numpy(self):
        from . import array_types
        return array_types.to_numpy(self.evaluate())

    def tolist(self, i1=None, i2=None):
        values = self.evaluate(i1=i1, i2=i2)
        from . import array_types
        values = array_types.to_numpy(values)
        if isinstance(values, np.ma.MaskedArray):
            return values.tolist(None)
        return values.tolist()

    def __iter__(self):
        return iter(self.tolist())

    def __len__(self):
        return len(self.df)

    # -- stats shortcuts (reference expression.py:821-931) --------------------
    def count(self, **kwargs):
        return self.df.count(self.expression, **kwargs)

    def sum(self, axis=None, **kwargs):
        return self.df.sum(self.expression, **kwargs)

    def mean(self, **kwargs):
        return self.df.mean(self.expression, **kwargs)

    def std(self, **kwargs):
        return self.df.std(self.expression, **kwargs)

    def var(self, **kwargs):
        return self.df.var(self.expression, **kwargs)

    def min(self, **kwargs):
        return self.df.min(self.expression, **kwargs)

    def max(self, **kwargs):
        return self.df.max(self.expression, **kwargs)

    def minmax(self, **kwargs):
        return self.df.minmax(self.expression, **kwargs)

    def nop(self):
        """Evaluate and discard (for benchmarking)."""
        self.evaluate()

    # -- set-based ops (reference expression.py:946-1211) ---------------------
    def unique(self, dropna=False, dropnan=False, dropmissing=False, array_type="python",
               limit=None, limit_raise=True):
        return self.df.unique(self.expression, dropna=dropna, dropnan=dropnan,
                              dropmissing=dropmissing, array_type=array_type,
                              limit=limit, limit_raise=limit_raise)

    def nunique(self, dropna=False, dropnan=False, dropmissing=False, **kwargs):
        """Number of unique values (reference expression.py:1075)."""
        oset = self.df._set(self.expression)
        n = oset.count
        if (dropna or dropnan) and oset.has_nan:
            n -= 1
        if (dropna or dropmissing) and oset.has_null:
            n -= 1
        return n

    def value_counts(self, dropna=False, dropnan=False, dropmissing=False,
                     ascending=False, progress=False, axis=None):
        """pandas Series of value -> count, sorted by count (reference
        expression.py:946-1061: per-thread C++ counters merged; here one
        SortedSet with counts)."""
        import pandas as pd
        oset = self.df._set(self.expression, keep_counts=True)
        keys = list(oset.keys)
        counts = list(oset.counts)
        if oset.has_nan and not (dropna or dropnan):
            keys.append(np.nan)
            counts.append(oset.nan_count)
        if oset.has_null and not (dropna or dropmissing):
            keys.append("missing")
            counts.append(oset.null_count)
        counts = np.asarray(counts, np.int64)
        order = np.argsort(counts, kind="stable")
        if not ascending:
            order = order[::-1]
        keys = [keys[i] for i in order]
        counts = counts[order]
        return pd.Series(counts, index=keys)

    def isin(self, values, use_hashmap=True):
        """Rewrites to ``isin_set(expr, var)`` (reference expression.py:1196)."""
        from .ops.setops import SortedSet
        values = np.asarray(values)
        dtype = "string" if values.dtype.kind in "OUS" else values.dtype
        oset = SortedSet(dtype)
        oset.update(values)
        var = self.df.add_variable("isin_set", oset, unique=True)
        return Expression(self.df, f"isin_set({self.expression}, {var})")

    def map(self, mapper, nan_value=None, missing_value=None, default_value=None,
            allow_missing=False, axis=None):
        """Map values through a dict (reference expression.py:1278: via
        ordinal codes + _choose)."""
        from .ops.setops import SortedSet
        keys = np.asarray(list(mapper.keys()))
        values = np.asarray(list(mapper.values()))
        dtype = "string" if keys.dtype.kind in "OUS" else keys.dtype
        oset = SortedSet(dtype)
        oset.update(keys)
        # choices indexed by ordinal: reorder values to the set's sorted order
        codes = oset.map_ordinal(keys)
        choices = np.empty(oset.count, dtype=values.dtype)
        if default_value is not None:
            choices = np.full(oset.count, default_value, dtype=values.dtype)
        choices[np.asarray(codes, np.int64)] = values
        set_var = self.df.add_variable("map_set", oset, unique=True)
        choices_var = self.df.add_variable("map_choices", choices, unique=True)
        return Expression(self.df, f"_choose(_ordinal_values({self.expression}, {set_var}), {choices_var})")

    # -- convenience ---------------------------------------------------------
    def abs(self):
        return Expression(self.df, f"abs({self.expression})")

    def astype(self, dtype):
        if dtype in (str, "str", "string"):
            return Expression(self.df, f"astype({self.expression}, 'str')")
        return Expression(self.df, f"astype({self.expression}, {str(np.dtype(dtype))!r})")

    def clip(self, lower=None, upper=None):
        return Expression(self.df, f"clip({self.expression}, {lower!r}, {upper!r})")

    def fillna(self, value):
        return Expression(self.df, f"fillna({self.expression}, {_to_expression_string(self.df, value)})")

    def fillmissing(self, value):
        return Expression(self.df, f"fillmissing({self.expression}, {_to_expression_string(self.df, value)})")

    def where(self, condition, other):
        cond = _to_expression_string(self.df, condition)
        other_s = _to_expression_string(self.df, other)
        return Expression(self.df, f"where({cond}, {self.expression}, {other_s})")

    def isna(self):
        return Expression(self.df, f"isna({self.expression})")

    def notna(self):
        return Expression(self.df, f"notna({self.expression})")

    def isnan(self):
        return Expression(self.df, f"isnan({self.expression})")

    def ismissing(self):
        return Expression(self.df, f"ismissing({self.expression})")

    def jit(self, verbose=False):
        """API-parity alias for the reference's jit_numba/jit_cuda/jit_pythran
        (expression.py:1121-1131): every expression here is already compiled
        into the pass's XLA program, so jit() is the identity."""
        return Expression(self.df, self.expression)

    jit_numba = jit
    jit_jax = jit

    def apply(self, f, vectorize=False, multiprocessing=False):
        """Python UDF (reference expression.py:1218): registered as a
        DataFrame function, evaluated host-side per chunk."""
        name = self.df.add_function(f.__name__ if hasattr(f, "__name__") else "lambda", f,
                                    vectorize=vectorize, unique=True)
        return Expression(self.df, f"{name}({self.expression})")


install_all_on_expression()
