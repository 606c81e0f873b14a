"""CLI, viz (non-interactive), hostkern, vconstant, example."""

import json
import subprocess
import sys

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


def test_cli_meta_and_convert(tmp_path):
    df = vt.from_arrays(a=np.arange(5, dtype="f8"))
    src = str(tmp_path / "in.hdf5")
    dst = str(tmp_path / "out.parquet")
    df.export_hdf5(src)
    from vaex_tpu.__main__ import main
    main(["convert", src, dst])
    df2 = vt.open(dst)
    assert df2["a"].tolist() == [0, 1, 2, 3, 4]
    main(["meta", src])  # smoke
    main(["open", src])


def test_viz_histogram(df_local):
    import matplotlib
    matplotlib.use("Agg")
    grid = df_local.viz.histogram("x", shape=5, limits=[0, 10])
    npt.assert_array_equal(grid, [2, 2, 2, 2, 2])


def test_viz_heatmap(df_local):
    import matplotlib
    matplotlib.use("Agg")
    grid = df_local.viz.heatmap("x", "y", shape=4, limits=[[0, 10], [0, 100]])
    assert np.asarray(grid).sum() == 10


def test_viz_what_mean(df_local):
    import matplotlib
    matplotlib.use("Agg")
    grid = df_local.viz.histogram("x", what="mean(y)", shape=2, limits=[0, 10])
    npt.assert_allclose(grid, [np.mean(np.arange(5.0) ** 2), np.mean(np.arange(5, 10.0) ** 2)])


def test_hostkern_roundtrip():
    from vaex_tpu import hostkern
    mask = np.random.default_rng(0).random(1000) > 0.5
    npt.assert_array_equal(hostkern.mask_indices(mask), np.flatnonzero(mask))
    assert hostkern.mask_count(mask) == mask.sum()
    keys = np.random.default_rng(0).integers(0, 1 << 40, 10000)
    parts = hostkern.hash_partition(keys, 8)
    assert parts.min() >= 0 and parts.max() < 8
    counts, offsets, order = hostkern.partition_layout(parts, 8)
    assert counts.sum() == 10000
    # partition-contiguous order
    reordered = parts[order]
    assert (np.diff(reordered) >= 0).all()
    x = np.array([1.0, np.nan, 5.0, -2.0])
    assert hostkern.minmax(x) == (-2.0, 5.0)


def test_vconstant():
    col = vt.vconstant(1.5, 10)
    df = vt.from_dataset(vt.DatasetArrays({"c": col}))
    assert df.sum("c") == 15.0


def test_example():
    df = vt.example()
    assert len(df) == 10000
    assert "x" in df.get_column_names()


def test_graphql_query(df_local):
    out = df_local.graphql.query({
        "where": {"x": {"_gt": 4}},
        "count": True,
        "mean": ["x"],
        "groupby": {"by": ["g"], "agg": {"x": "sum"}},
    })
    assert out["count"] == 5
    assert out["mean"]["x"] == np.mean(np.arange(5, 10.0))
    assert out["groupby"]["g"] == [1, 2]
    assert out["groupby"]["x"] == [5.0 + 6 + 7, 8.0 + 9]


def test_graphql_where_ops(df_local):
    out = df_local.graphql.query({"where": {"name": {"_eq": "n0"}}, "count": True})
    assert out["count"] == 4
    out = df_local.graphql.query({
        "where": {"_or": [{"x": {"_lt": 1}}, {"x": {"_gte": 9}}]}, "count": True})
    assert out["count"] == 2
    out = df_local.graphql.query({"where": {"g": {"_in": [0, 2]}}, "count": True})
    assert out["count"] == 6


def test_graphql_rows(df_local):
    out = df_local.graphql.query({"row": {"offset": 2, "limit": 2, "columns": ["x", "g"]}})
    assert out["rows"] == [{"x": 2.0, "g": 0}, {"x": 3.0, "g": 0}]
