"""Statistic expression algebra (reference: vaex/stat.py, 124 LoC).

``vaex_tpu.stat.mean('x') / vaex_tpu.stat.std('x')`` builds a lazy tree of
statistic nodes; ``.calculate(df, binby=...)`` evaluates all leaf statistics
in ONE pass (they all merge into the same TaskAggregations) and combines the
grids with numpy operators.
"""

from __future__ import annotations

import numpy as np


class Expression:
    def calculate(self, df, binby=[], limits=None, shape=128, selection=None):
        raise NotImplementedError

    def __add__(self, other):
        return _BinaryOp(self, _lift(other), np.add)

    def __radd__(self, other):
        return _BinaryOp(_lift(other), self, np.add)

    def __sub__(self, other):
        return _BinaryOp(self, _lift(other), np.subtract)

    def __rsub__(self, other):
        return _BinaryOp(_lift(other), self, np.subtract)

    def __mul__(self, other):
        return _BinaryOp(self, _lift(other), np.multiply)

    def __rmul__(self, other):
        return _BinaryOp(_lift(other), self, np.multiply)

    def __truediv__(self, other):
        return _BinaryOp(self, _lift(other), np.divide)

    def __rtruediv__(self, other):
        return _BinaryOp(_lift(other), self, np.divide)

    def __pow__(self, other):
        return _BinaryOp(self, _lift(other), np.power)

    def __neg__(self):
        return _UnaryOp(self, np.negative)


def _lift(value):
    if isinstance(value, Expression):
        return value
    return _Constant(value)


class _Constant(Expression):
    def __init__(self, value):
        self.value = value

    def calculate(self, df, **kwargs):
        return self.value


class _UnaryOp(Expression):
    def __init__(self, operand, op):
        self.operand = operand
        self.op = op

    def calculate(self, df, **kwargs):
        return self.op(self.operand.calculate(df, **kwargs))


class _BinaryOp(Expression):
    def __init__(self, left, right, op):
        self.left = left
        self.right = right
        self.op = op

    def calculate(self, df, **kwargs):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.op(np.asarray(self.left.calculate(df, **kwargs)),
                           np.asarray(self.right.calculate(df, **kwargs)))


class _StatisticsCalculation(Expression):
    def __init__(self, name, expression):
        self.name = name
        self.expression = str(expression) if expression is not None else None

    def calculate(self, df, binby=[], limits=None, shape=128, selection=None):
        method = getattr(df, self.name)
        if self.name == "count":
            return np.asarray(method(self.expression or "*", binby=binby, limits=limits,
                                     shape=shape, selection=selection or False))
        return np.asarray(method(self.expression, binby=binby, limits=limits,
                                 shape=shape, selection=selection or False))


def count(expression="*"):
    return _StatisticsCalculation("count", expression)


def sum(expression):  # noqa: A001
    return _StatisticsCalculation("sum", expression)


def mean(expression):
    return _StatisticsCalculation("mean", expression)


def std(expression):
    return _StatisticsCalculation("std", expression)


def var(expression):
    return _StatisticsCalculation("var", expression)


def min(expression):  # noqa: A001
    return _StatisticsCalculation("min", expression)


def max(expression):  # noqa: A001
    return _StatisticsCalculation("max", expression)


def covar(x, y):
    class _Covar(Expression):
        def calculate(self, df, binby=[], limits=None, shape=128, selection=None):
            return np.asarray(df.covar(x, y, binby=binby, limits=limits, shape=shape,
                                       selection=selection or False))
    return _Covar()


def correlation(x, y):
    class _Corr(Expression):
        def calculate(self, df, binby=[], limits=None, shape=128, selection=None):
            return np.asarray(df.correlation(x, y, binby=binby, limits=limits, shape=shape,
                                             selection=selection or False))
    return _Corr()
