"""shift/diff/rolling (reference: shift_test.py, diff via dataframe.py:4463)."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt

X = np.arange(10, dtype="f8")


def test_shift_forward(df_local):
    df = df_local.shift(1, "x")
    vals = df["x"].tolist()
    assert vals[0] is None
    assert vals[1:] == list(X[:-1])


def test_shift_backward(df_local):
    df = df_local.shift(-2, "x")
    vals = df["x"].tolist()
    assert vals[:8] == list(X[2:])
    assert vals[8] is None and vals[9] is None


def test_shift_fill_value(df_local):
    df = df_local.shift(1, "x", fill_value=-1.0)
    assert df["x"].tolist() == [-1.0] + list(X[:-1])


def test_shift_trim(df_local):
    df = df_local.shift(1, "x", trim=True)
    assert len(df) == 9
    assert df["x"].tolist() == list(X[:-1])


def test_shift_aggregate(df_local):
    df = df_local.shift(1, "x", fill_value=0.0)
    assert df.sum("x") == X[:-1].sum()


def test_shift_virtual_column(df_local):
    df = df_local
    df["v"] = df.x * 2
    shifted = df.shift(1, "v", fill_value=0.0)
    assert shifted["v"].tolist() == [0.0] + list(X[:-1] * 2)


def test_diff(df_local):
    df = df_local.diff(1, "x")
    vals = df["x"].tolist()
    assert vals[0] is None
    assert vals[1:] == [1.0] * 9


def test_diff_y(df_local):
    df = df_local.diff(1, "y")
    vals = df["y"].tolist()
    expected = np.diff(X ** 2)
    assert vals[1:] == list(expected)


def test_rolling_sum(df_local):
    df = df_local.rolling(3, column="x").sum()
    vals = df["x"].tolist()
    # right edge: window covers [i-2, i]
    expected = [X[max(0, i - 2):i + 1].sum() for i in range(10)]
    npt.assert_allclose(vals, expected)


def test_rolling_mean_trim(df_local):
    df = df_local.rolling(2, column="x", trim=True).mean()
    assert len(df) == 9
    npt.assert_allclose(df["x"].tolist(), (X[1:] + X[:-1]) / 2)


def test_rolling_max(df_local):
    df = df_local.rolling(2, column="x").max()
    vals = df["x"].tolist()
    assert vals[1:] == list(X[1:])
