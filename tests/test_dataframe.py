"""DataFrame structure ops: filter, sort, take, slicing, concat, drop*,
to_* conversions (reference: sort_test.py, selection_test.py, dropna_test.py,
evaluate_test.py, ...)."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt

X = np.arange(10, dtype="f8")


def test_filter_len(df):
    dff = df.filter("x > 4")
    assert len(dff) == 5
    assert dff.sum("x") == X[X > 4].sum()


def test_filter_chain(df_local):
    df = df_local
    dff = df.filter("x > 2").filter("x < 7")
    assert len(dff) == 4
    assert dff["x"].tolist() == [3, 4, 5, 6]


def test_filter_getitem_expression(df_local):
    df = df_local
    dff = df[df.x > 4]
    assert len(dff) == 5


def test_filter_evaluate(df):
    dff = df.filter("x > 4")
    assert dff["x"].tolist() == [5, 6, 7, 8, 9]
    assert dff["y"].tolist() == [25, 36, 49, 64, 81]


def test_filter_extract(df_local):
    df = df_local.filter("x > 4")
    dfe = df.extract()
    assert not dfe.filtered
    assert len(dfe) == 5
    assert dfe["x"].tolist() == [5, 6, 7, 8, 9]


def test_slicing(df_local):
    df = df_local
    assert df[2:5]["x"].tolist() == [2, 3, 4]
    assert len(df.head(3)) == 3
    assert df.tail(2)["x"].tolist() == [8, 9]


def test_slicing_filtered(df_local):
    dff = df_local.filter("x > 2")
    assert dff[1:3]["x"].tolist() == [4, 5]


def test_take(df_local):
    df = df_local
    dft = df.take([3, 1, 2])
    assert dft["x"].tolist() == [3, 1, 2]
    assert dft["y"].tolist() == [9, 1, 4]


def test_sort(df_local):
    df = df_local
    dfs = df.sort("-x")
    assert dfs["x"].tolist() == list(range(9, -1, -1))
    dfs = df.sort("x", ascending=False)
    assert dfs["x"].tolist() == list(range(9, -1, -1))
    dfs = df.sort("g")
    assert dfs["g"].tolist() == sorted([0, 0, 0, 0, 1, 1, 1, 1, 2, 2])


def test_sort_multi(df_local):
    df = vt.from_arrays(a=np.array([1, 0, 1, 0]), b=np.array([3.0, 2.0, 1.0, 0.0]))
    dfs = df.sort(["a", "b"])
    assert dfs["a"].tolist() == [0, 0, 1, 1]
    assert dfs["b"].tolist() == [0.0, 2.0, 1.0, 3.0]


def test_sort_strings(df_local):
    df = df_local
    dfs = df.sort("name")
    names = dfs["name"].tolist()
    assert names == sorted(names)


def test_dropna(df_local):
    df = df_local
    assert len(df.dropna(["m"])) == 8
    assert len(df.dropnan(["f"])) == 9
    assert len(df.dropmissing(["m"])) == 8
    assert len(df.dropna(["m", "f"])) == 7


def test_concat(df_local):
    df1 = vt.from_arrays(x=X[:4])
    df2 = vt.from_arrays(x=X[4:])
    df = df1.concat(df2)
    assert len(df) == 10
    assert df.sum("x") == X.sum()
    assert df["x"].tolist() == list(X)


def test_shuffle_sample_split(df_local):
    df = df_local
    assert sorted(df.shuffle(random_state=1)["x"].tolist()) == list(X)
    assert len(df.sample(5, random_state=1)) == 5
    parts = df.split(into=3)
    assert [len(p) for p in parts] == [4, 3, 3]
    parts = df.split(into=[0.5, 0.5])
    assert [len(p) for p in parts] == [5, 5]


def test_to_pandas(df_local):
    pdf = df_local.to_pandas_df(["x", "g", "name"])
    assert list(pdf.columns) == ["x", "g", "name"]
    assert len(pdf) == 10
    npt.assert_allclose(pdf["x"].to_numpy(), X)


def test_to_arrow(df_local):
    t = df_local.to_arrow_table(["x", "m", "name"])
    assert t.num_rows == 10
    assert t.column("m").null_count == 2


def test_to_dict_records(df_local):
    d = df_local.to_dict(["x"], array_type="python")
    assert d["x"] == list(X)
    records = df_local.to_records()
    assert records[0]["x"] == 0.0


def test_materialize(df_local):
    df = df_local
    df["r"] = df.x * 2
    dfm = df.materialize()
    assert "r" not in dfm.virtual_columns
    npt.assert_allclose(dfm["r"].tolist(), X * 2)
    assert dfm.sum("r") == (X * 2).sum()


def test_add_column(df_local):
    df = df_local
    df.add_column("w", np.ones(10))
    assert df.sum("w") == 10


def test_rename(df_local):
    df = df_local
    df["r"] = df.x * 2
    df.rename("x", "xx")
    assert "xx" in df.get_column_names()
    npt.assert_allclose(df["r"].tolist(), X * 2)  # virtual column rewritten


def test_drop(df_local):
    df = df_local.drop("x")
    assert "x" not in df.get_column_names()


def test_vrange():
    df = vt.vrange(0, 1000)
    assert len(df) == 1000
    assert df.sum("x") == 999 * 1000 // 2
    assert df.count() == 1000


def test_vrange_huge_count():
    # "1e9-row tests are free" (reference tests/common.py:111-115)
    df = vt.vrange(0, 100_000_000)
    df._tile_rows = 2**22
    assert df.count() == 100_000_000


def test_selection_undo_redo(df_local):
    df = df_local
    df.select("x > 4")
    assert df.count(selection=True) == 5
    df.select("x > 6", mode="and")
    assert df.count(selection=True) == 3
    df.selection_undo()
    assert df.count(selection=True) == 5
    df.selection_redo()
    assert df.count(selection=True) == 3


def test_select_box_circle(df_local):
    df = df_local
    df.select_box(["x", "y"], [[0, 5], [0, 20]])
    assert df.count(selection=True) == 5  # x in [0,5), y=x^2 in [0,20) -> x in 0..4
    df.select_circle("x", "y", 0, 0, 2.5)
    assert df.count(selection=True) == 2


def test_select_lasso(df_local):
    df = df_local
    df.select_lasso("x", "y", [-1, 5, 5, -1], [-1, -1, 30, 30])
    n = df.count(selection=True)
    assert n == 5  # x in (0..4), y=x^2 < 30 for x<=4 (and within x<5)


def test_evaluate_slices(df_local):
    df = df_local
    npt.assert_allclose(np.asarray(df.evaluate("x", 2, 5)), X[2:5])
    it = list(df.evaluate_iterator("x", chunk_size=3))
    assert [i2 - i1 for i1, i2, _ in it] == [3, 3, 3, 1]
    npt.assert_allclose(np.concatenate([np.asarray(c) for _, _, c in it]), X)


def test_repr(df):
    s = repr(df)
    assert "x" in s


def test_categorize(df_local):
    df = df_local.categorize("g", labels=[0, 1, 2])
    assert df.is_category("g")
    assert df.category_count("g") == 3


def test_ordinal_encode(df_local):
    df = df_local.ordinal_encode("name")
    assert df.is_category("name_ordinal")
    labels = df.category_labels("name_ordinal")
    assert set(labels) == {"n0", "n1", "n2"}


def test_to_copy_delete_virtual_is_masked_column_count():
    """API parity: to_copy / delete_virtual_column / is_masked /
    column_count (reference dataframe.py:3049/3631/2099/4012)."""
    df = vt.from_arrays(
        x=np.arange(5.0),
        m=np.ma.MaskedArray(np.arange(5.0), [True, False, False, False, False]))
    df["v"] = "x * 2"
    assert df.column_count() == 3
    assert df.is_masked("m") and not df.is_masked("x") and not df.is_masked("v")

    d2 = df.to_copy(virtual=False)
    assert "v" not in d2.get_column_names()
    assert "v" in df.get_column_names()

    df.delete_virtual_column("v")
    assert "v" not in df.get_column_names()
    import pytest as _pytest
    with _pytest.raises(KeyError):
        df.delete_virtual_column("nope")
