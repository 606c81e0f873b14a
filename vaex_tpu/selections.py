"""Selections: named boolean row subsets + the filter.

Re-design of the reference's ``vaex/selections.py`` (238 LoC).  A selection is
a tree of boolean expressions combined with and/or/xor/subtract/replace; the
*filter* is simply the reserved selection named ``__filter__``
(reference dataframe.py:405-406).  Because every selection lowers to one
boolean expression string, it evaluates inside the traced pass for free — no
separate mask kernels; the tri-state C++ Mask cache becomes a materialized
numpy bool mask cached per fingerprint (see DataFrame._fill_filter_mask).
"""

from __future__ import annotations

import numpy as np

FILTER_SELECTION_NAME = "__filter__"

_combine_ops = {
    "and": lambda a, b: f"({a}) & ({b})",
    "or": lambda a, b: f"({a}) | ({b})",
    "xor": lambda a, b: f"({a}) ^ ({b})",
    "subtract": lambda a, b: f"({a}) & ~({b})",
    "replace": lambda a, b: b,
}


class Selection:
    def to_expression(self, df) -> str:
        raise NotImplementedError

    def dependencies(self, df):
        from .scopes import classify_leaves
        _, columns, _ = classify_leaves(df, self.to_expression(df))
        return columns

    def fingerprint(self, df):
        from .utils import fingerprint
        return fingerprint("selection", self.to_expression(df))

    def encode(self):
        raise NotImplementedError

    @staticmethod
    def decode(spec):
        t = spec["type"]
        if t == "expression":
            prev = Selection.decode(spec["previous"]) if spec.get("previous") else None
            return SelectionExpression(spec["expression"], prev, spec.get("mode", "replace"))
        if t == "invert":
            return SelectionInvert(Selection.decode(spec["selection"]))
        if t == "dropna":
            return SelectionDropNa(spec.get("column_names"))
        if t == "lasso":
            return SelectionLasso(spec["x"], spec["y"], spec["xs"], spec["ys"],
                                  Selection.decode(spec["previous"]) if spec.get("previous") else None,
                                  spec.get("mode", "replace"))
        raise ValueError(f"unknown selection type {t}")


class SelectionExpression(Selection):
    """(reference selections.py:107)"""

    def __init__(self, expression, previous_selection=None, mode="replace"):
        self.expression = str(expression)
        self.previous_selection = previous_selection
        self.mode = mode

    def to_expression(self, df):
        expr = self.expression
        if self.previous_selection is not None and self.mode != "replace":
            prev = self.previous_selection.to_expression(df)
            expr = _combine_ops[self.mode](prev, expr)
        return expr

    def encode(self):
        return {"type": "expression", "expression": self.expression, "mode": self.mode,
                "previous": self.previous_selection.encode() if self.previous_selection else None}


class SelectionInvert(Selection):
    def __init__(self, selection):
        self.selection = selection

    def to_expression(self, df):
        return f"~({self.selection.to_expression(df)})"

    def encode(self):
        return {"type": "invert", "selection": self.selection.encode()}


class SelectionDropNa(Selection):
    """(reference selections.py:59) — rows where no selected column is NA."""

    def __init__(self, column_names=None, drop_nan=True, drop_masked=True):
        self.column_names = column_names
        self.drop_nan = drop_nan
        self.drop_masked = drop_masked

    def to_expression(self, df):
        names = self.column_names or df.get_column_names()
        parts = []
        for name in names:
            if self.drop_nan and self.drop_masked:
                parts.append(f"notna({name})")
            elif self.drop_nan:
                parts.append(f"~isnan({name})")
            else:
                parts.append(f"~ismissing({name})")
        return " & ".join(f"({p})" for p in parts) if parts else "True"

    def encode(self):
        return {"type": "dropna", "column_names": self.column_names}


class SelectionLasso(Selection):
    """Point-in-polygon (reference selections.py:163, vaexfast.pnpoly).

    Lowered to a ``pnpoly`` expression; the polygon rides as variables so the
    crossing-number test runs vectorized inside the pass.
    """

    def __init__(self, x, y, xseq, yseq, previous_selection=None, mode="replace"):
        self.x = str(x)
        self.y = str(y)
        self.xseq = np.asarray(xseq, np.float64)
        self.yseq = np.asarray(yseq, np.float64)
        self.previous_selection = previous_selection
        self.mode = mode

    def to_expression(self, df):
        xs = df.add_variable("lasso_x", self.xseq, unique=True)
        ys = df.add_variable("lasso_y", self.yseq, unique=True)
        expr = f"pnpoly({self.x}, {self.y}, {xs}, {ys})"
        if self.previous_selection is not None and self.mode != "replace":
            prev = self.previous_selection.to_expression(df)
            expr = _combine_ops[self.mode](prev, expr)
        return expr

    def encode(self):
        return {"type": "lasso", "x": self.x, "y": self.y,
                "xs": self.xseq.tolist(), "ys": self.yseq.tolist(),
                "previous": self.previous_selection.encode() if self.previous_selection else None,
                "mode": self.mode}
