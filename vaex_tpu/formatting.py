"""repr/HTML formatting of DataFrames and Expressions
(reference: vaex/formatting.py + dataframe repr helpers)."""

from __future__ import annotations

import numpy as np

MAX_PREVIEW_ROWS = 10


def _format_value(value):
    if value is None:
        return "--"
    if isinstance(value, np.ma.core.MaskedConstant):
        return "--"
    if isinstance(value, float) and np.isnan(value):
        return "nan"
    if isinstance(value, (bytes,)):
        return value.decode("utf8", "replace")
    return str(value)


def format_expression_preview(expr, n=5):
    df = expr.df
    count = len(df)
    k = min(n, count)
    try:
        values = expr.evaluate(0, k) if k else []
        from . import array_types
        values = array_types.to_numpy(values)
        if isinstance(values, np.ma.MaskedArray):
            items = [(_format_value(None) if values.mask[i] else _format_value(values.data[i])) for i in range(k)]
        else:
            items = [_format_value(v) for v in values[:k]]
    except Exception as e:  # preview must never raise
        items = [f"<error: {e}>"]
    body = ", ".join(items)
    suffix = ", ..." if count > k else ""
    return f"Expression = {expr.expression}\nLength: {count:,} dtype: {expr.dtype}\n[{body}{suffix}]"


def format_dataframe(df, n=MAX_PREVIEW_ROWS):
    count = len(df)
    k = min(n, count)
    names = df.get_column_names()
    columns = {}
    for name in names:
        try:
            from . import array_types
            values = array_types.to_numpy(df.evaluate(name, 0, k)) if k else np.empty(0)
            if isinstance(values, np.ma.MaskedArray):
                columns[name] = [(_format_value(None) if np.ma.getmaskarray(values)[i] else _format_value(values.data[i]))
                                 for i in range(k)]
            else:
                columns[name] = [_format_value(v) for v in values[:k]]
        except Exception as e:
            columns[name] = [f"<error: {e}>"] * k
    widths = {name: max([len(name)] + [len(v) for v in columns[name]]) for name in names}
    header = "  ".join(name.ljust(widths[name]) for name in names)
    sep = "  ".join("-" * widths[name] for name in names)
    lines = ["#  " + header, "   " + sep]
    for i in range(k):
        lines.append(f"{i}  " + "  ".join(columns[name][i].ljust(widths[name]) for name in names))
    if count > k:
        lines.append(f"... {count:,} rows total")
    return "\n".join(lines)
