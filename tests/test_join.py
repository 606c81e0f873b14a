"""Join semantics (reference tests/join_test.py, SURVEY §2.4):
left row order preserved; unmatched left rows masked; duplicates need
allow_duplication and append at the end; how in left/right/inner."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


@pytest.fixture
def left():
    return vt.from_arrays(
        key=np.array([0, 1, 2, 3, 4], dtype="i8"),
        x=np.arange(5, dtype="f8"),
    )


@pytest.fixture
def right():
    return vt.from_arrays(
        key=np.array([2, 3, 4, 5], dtype="i8"),
        y=np.array([20.0, 30.0, 40.0, 50.0]),
    )


def test_join_left(left, right):
    j = left.join(right, on="key")
    assert len(j) == 5
    assert j["x"].tolist() == [0, 1, 2, 3, 4]
    y = j["y"].tolist()
    assert y[2:] == [20.0, 30.0, 40.0]
    assert y[0] is None and y[1] is None  # unmatched -> masked


def test_join_inner(left, right):
    j = left.join(right, on="key", how="inner")
    assert j["key"].tolist() == [2, 3, 4]
    assert j["y"].tolist() == [20.0, 30.0, 40.0]


def test_join_right(left, right):
    j = left.join(right, on="key", how="right")
    assert len(j) == 4
    assert j["key"].tolist() == [2, 3, 4, 5]
    x = j["x"].tolist()
    assert x[:3] == [2.0, 3.0, 4.0]
    assert x[3] is None


def test_join_different_keys(left, right):
    right2 = vt.from_arrays(k2=np.array([2, 3, 4, 5], dtype="i8"),
                            y=np.array([20.0, 30.0, 40.0, 50.0]))
    j = left.join(right2, left_on="key", right_on="k2")
    assert j["y"].tolist()[2:] == [20.0, 30.0, 40.0]


def test_join_duplicates(left):
    right = vt.from_arrays(key=np.array([2, 2, 3], dtype="i8"),
                           y=np.array([20.0, 21.0, 30.0]))
    with pytest.raises(ValueError):
        left.join(right, on="key")
    j = left.join(right, on="key", allow_duplication=True)
    # 5 left rows + 1 duplicated (key=2 matches twice)
    assert len(j) == 6
    ys = [v for v in j["y"].tolist() if v is not None]
    assert sorted(ys) == [20.0, 21.0, 30.0]


def test_join_suffix(left, right):
    right2 = vt.from_arrays(key=np.array([2, 3, 4, 5], dtype="i8"),
                            x=np.array([20.0, 30.0, 40.0, 50.0]))
    j = left.join(right2, on="key", rsuffix="_r")
    assert "x" in j.get_column_names()
    assert "x_r" in j.get_column_names()


def test_join_string_key():
    left = vt.from_arrays(k=np.asarray(["a", "b", "c"], dtype=object), x=np.arange(3.0))
    right = vt.from_arrays(k=np.asarray(["b", "c", "d"], dtype=object), y=np.arange(3.0) * 10)
    j = left.join(right, on="k")
    y = j["y"].tolist()
    assert y[0] is None
    assert y[1:] == [0.0, 10.0]


def test_join_virtual_columns_carried(left, right):
    right = right.copy()
    right["y2"] = right["y"] * 2
    j = left.join(right, on="key")
    y2 = j["y2"].tolist()
    assert y2[2:] == [40.0, 60.0, 80.0]


def test_join_filtered(left, right):
    lf = left.filter("key > 0")
    j = lf.join(right, on="key")
    assert len(j) == 4
    assert j["x"].tolist() == [1, 2, 3, 4]
