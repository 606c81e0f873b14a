"""shift / diff / rolling.

Re-design of the reference's ``vaex/shift.py`` (DatasetShifted chunk-stream
transformers) + ``rolling.py``.  Here a shifted column is a lazy
:class:`ColumnShifted` view — slicing [i1:i2) reads the source at
[i1-periods:i2-periods) with boundary rows filled/masked — so shifts stay
zero-copy and stream through the executor like any other column.  Rolling
reductions lower to sums of shifted columns (k is small), which then fuse
into the single pass XLA program.
"""

from __future__ import annotations

import numpy as np

from . import array_types
from .column import Column
from .datatype import dtype_of


class ColumnShifted(Column):
    def __init__(self, source, periods, fill_value=None):
        self.source = source
        self.periods = periods
        self.fill_value = fill_value

    def __len__(self):
        return len(self.source)

    @property
    def dtype(self):
        return dtype_of(self.source).internal

    def __getitem__(self, item):
        if not isinstance(item, slice):
            raise TypeError
        i1, i2, step = item.indices(len(self))
        assert step == 1
        n = i2 - i1
        p = self.periods
        N = len(self.source)
        src_lo = max(i1 - p, 0)
        src_hi = min(i2 - p, N)
        out_lo = src_lo + p - i1   # first output row fed from the source
        valid_n = max(src_hi - src_lo, 0)
        src = self.source[src_lo:src_hi] if valid_n > 0 else self.source[0:0]
        data, mask = array_types.data_and_mask(src)
        out_dtype = data.dtype if data.dtype.kind != "O" else object
        out = np.zeros(n, dtype=out_dtype)
        out_mask = np.ones(n, dtype=bool)
        if valid_n > 0:
            out[out_lo:out_lo + valid_n] = data
            out_mask[out_lo:out_lo + valid_n] = mask if mask is not None else False
        if self.fill_value is not None:
            out[out_mask] = self.fill_value
            if valid_n > 0 and mask is not None:
                inner = np.zeros(n, bool)
                inner[out_lo:out_lo + valid_n] = mask
                return np.ma.MaskedArray(out, inner) if inner.any() else out
            return out
        return np.ma.MaskedArray(out, out_mask) if out_mask.any() else out


def shift(df, periods, column=None, fill_value=None, trim=False, inplace=False):
    """df.shift (reference dataframe.py:4488): positive periods shift forward."""
    df = df.extract() if df.filtered else df.trim(inplace=inplace)
    names = ([column] if isinstance(column, str) else list(column)) if column is not None \
        else df.get_column_names()
    out = df.copy()
    from .dataset import DatasetArrays
    replacement = {}
    for name in names:
        if name in out.virtual_columns:
            values = out.evaluate(name, filtered=False)
            src = values
            del out.virtual_columns[name]
        else:
            src = out.dataset[name]
        replacement[name] = ColumnShifted(src, periods, fill_value)
    new_columns = {}
    for cname in out.dataset:
        new_columns[cname] = replacement.get(cname, out.dataset[cname])
    for cname, col in replacement.items():
        new_columns[cname] = col
    out = out._rebind_dataset(DatasetArrays(new_columns))
    out.column_names = list(df.column_names)
    if trim:
        n = len(out)
        if periods > 0:
            out = out[periods:n]
        elif periods < 0:
            out = out[0:n + periods]
    return out


def diff(df, periods=1, column=None, fill_value=None, trim=False, inplace=False,
         reverse=False):
    """df.diff (reference dataframe.py:4463)."""
    base = df.extract() if df.filtered else df.trim()
    names = ([column] if isinstance(column, str) else list(column)) if column is not None \
        else base.get_column_names()
    originals = {}
    work = base.copy()
    for name in names:
        new_name = f"__{name}_original"
        work[new_name] = work[name]
        # materialize the original since shift replaces the underlying column
        values = work.evaluate(name, filtered=False)
        del work.virtual_columns[new_name]
        work.add_column(new_name, values if isinstance(values, np.ndarray) else
                        array_types.to_numpy(values))
        originals[name] = new_name
    work = shift(work, periods, names, fill_value=fill_value, trim=trim)
    for name in names:
        if reverse:
            work[name] = work[name] - work[originals[name]]
        else:
            work[name] = work[originals[name]] - work[name]
    work.column_names = [n for n in work.column_names if n not in set(originals.values())]
    return work


class Rolling:
    """Rolling window reductions (reference rolling.py).

    Lowered to expressions over shifted columns so the whole window reduction
    fuses into one device pass.
    """

    def __init__(self, df, window, trim=False, fill_value=None, edge="right", columns=None):
        self.df = df
        self.window = window
        self.trim = trim
        self.fill_value = fill_value
        self.edge = edge
        self.columns = columns or df.get_column_names()

    def _offsets(self):
        if self.edge == "right":
            return range(-(self.window - 1), 1)
        if self.edge == "left":
            return range(0, self.window)
        raise ValueError(f'edge must be "right" or "left", not {self.edge!r}')

    def _reduce(self, combine_expr):
        df = self.df.extract() if self.df.filtered else self.df.trim()
        out = df.copy()
        for name in self.columns:
            shifted_names = []
            for k, off in enumerate(self._offsets()):
                sdf = shift(out, -off, [name], fill_value=self.fill_value) if off else out
                col_name = f"__{name}_shift_{k}"
                values = sdf.evaluate(name, filtered=False)
                out.add_column(col_name, values if isinstance(values, np.ndarray)
                               else array_types.to_numpy(values))
                shifted_names.append(col_name)
            out[f"__rolling_{name}"] = combine_expr(out, shifted_names)
        result = out.copy()
        for name in self.columns:
            result[name] = result[f"__rolling_{name}"]
        result.column_names = [n for n in result.column_names if not n.startswith("__")]
        if self.trim:
            n = len(result)
            w = self.window - 1
            result = result[w:n] if self.edge == "right" else result[0:n - w]
        return result

    def sum(self):
        def combine(df, names):
            expr = f"fillmissing({names[0]}, 0)"
            for nm in names[1:]:
                expr = f"({expr}) + fillmissing({nm}, 0)"
            return df[expr]
        return self._reduce(combine)

    def mean(self):
        df = self.sum()
        for name in self.columns:
            df[name] = df[name] / self.window
        return df

    def min(self):
        def combine(df, names):
            expr = names[0]
            for nm in names[1:]:
                expr = f"minimum({expr}, {nm})"
            return df[expr]
        return self._reduce(combine)

    def max(self):
        def combine(df, names):
            expr = names[0]
            for nm in names[1:]:
                expr = f"maximum({expr}, {nm})"
            return df[expr]
        return self._reduce(combine)
