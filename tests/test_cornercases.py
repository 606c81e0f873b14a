"""Edge cases ported from the reference's semantics
(tests/cornercases_test.py, concat_test.py, selection_test.py, ...)."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt

X = np.arange(10, dtype="f8")


def test_concat_dtype_promotion():
    df1 = vt.from_arrays(x=np.arange(3, dtype="f4"))
    df2 = vt.from_arrays(x=np.arange(3, dtype="f8"))
    df = df1.concat(df2)
    assert len(df) == 6
    assert df.sum("x") == 2 * 3.0


def test_concat_masked_and_plain():
    df1 = vt.from_arrays(x=np.ma.MaskedArray([1.0, 2.0], [True, False]))
    df2 = vt.from_arrays(x=np.array([3.0, 4.0]))
    df = df1.concat(df2)
    assert df.count("x") == 3
    assert df.sum("x") == 9.0


def test_empty_dataframe():
    df = vt.from_arrays(x=np.empty(0, dtype="f8"))
    assert len(df) == 0
    assert df.count() == 0
    assert df.count("x") == 0
    assert df["x"].tolist() == []


def test_filter_to_empty():
    df = vt.from_arrays(x=X.copy())
    dff = df.filter("x > 100")
    assert len(dff) == 0
    assert dff.count() == 0
    assert dff["x"].tolist() == []


def test_groupby_on_filtered(df_local):
    dff = df_local.filter("x >= 4")
    dfg = dff.groupby("g", agg={"c": "count"}, sort=True)
    assert dfg["g"].tolist() == [1, 2]
    assert dfg["c"].tolist() == [4, 2]


def test_unique_on_filtered(df_local):
    dff = df_local.filter("x >= 8")
    assert set(dff.unique("g")) == {2}


def test_selection_modes(df_local):
    df = df_local
    df.select("x > 2")
    df.select("x < 7", mode="and")
    assert df.count(selection=True) == 4
    df.select("x > 8", mode="or")
    assert df.count(selection=True) == 5
    df.select("x > 5", mode="subtract")
    assert df.count(selection=True) == 3
    df.select_nothing()
    assert not df.has_selection()


def test_selection_inverse(df_local):
    df = df_local
    df.select("x > 6")
    df.select_inverse()
    assert df.count(selection=True) == 7


def test_select_non_missing(df_local):
    df = df_local
    df.select_non_missing(column_names=["m", "f"])
    assert df.count(selection=True) == 7  # 2 masked in m, 1 nan in f


def test_astype_masked(df_local):
    values = df_local["astype(m, 'int64')"].tolist()
    assert values[0] is None
    assert values[2:] == list(range(2, 10))


def test_virtual_column_chain_depth():
    df = vt.from_arrays(x=X.copy())
    name = "x"
    for i in range(20):
        new = f"v{i}"
        df[new] = df[name] + 1
        name = new
    npt.assert_allclose(df[name].tolist(), X + 20)
    assert df.sum(name) == (X + 20).sum()


def test_take_with_repeats(df_local):
    dft = df_local.take([0, 0, 9, 9])
    assert dft["x"].tolist() == [0, 0, 9, 9]
    assert dft.sum("x") == 18


def test_slice_of_slice(df_local):
    df = df_local[2:8][1:3]
    assert df["x"].tolist() == [3, 4]


def test_trim_after_active_range(df_local):
    df = df_local
    df.set_active_range(3, 7)
    assert df.count() == 4
    assert df.sum("x") == 3 + 4 + 5 + 6


def test_evaluate_unfiltered(df_local):
    dff = df_local.filter("x > 4")
    all_values = dff.evaluate("x", filtered=False)
    assert len(np.asarray(all_values)) == 10


def test_sum_bool_expression(df_local):
    assert df_local.sum("astype(x > 4, 'int64')") == 5


def test_count_selection_and_filter(df_local):
    dff = df_local.filter("x > 2")
    assert dff.count(selection="x < 8") == 5  # 3,4,5,6,7


def test_binby_selection_list_2d(df_local):
    grids = df_local.count(binby=["x"], limits=[[0, 10]], shape=2,
                           selection=["x < 5", "x >= 5", None])
    assert np.asarray(grids).shape == (3, 2)
    npt.assert_array_equal(grids[0], [5, 0])
    npt.assert_array_equal(grids[1], [0, 5])
    npt.assert_array_equal(grids[2], [5, 5])


def test_column_name_mangling():
    df = vt.from_arrays(**{"weird name": np.arange(3.0)})
    # invalid identifiers get mangled into valid expression names
    names = df.get_column_names()
    assert len(names) == 1
    assert df.sum(names[0]) == 3.0


def test_float32_sum_upcast():
    df = vt.from_arrays(x=np.arange(10, dtype="f4"))
    total = df.sum("x")
    assert np.asarray(total).dtype == np.float64


def test_uint_sum_upcast():
    df = vt.from_arrays(x=np.arange(10, dtype="u4"))
    assert np.asarray(df.sum("x")).dtype == np.uint64
    assert df.sum("x") == 45


def test_bool_column_agg():
    df = vt.from_arrays(b=np.array([True, False, True, True]))
    assert df.sum("b") == 3
    assert df.count("b") == 4


def test_rename_physical_and_aggregate(df_local):
    df = df_local
    df.rename("x", "xx")
    assert df.sum("xx") == X.sum()
    with pytest.raises(Exception):
        df.sum("x")
