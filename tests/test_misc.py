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


# --- GraphQL string queries (reference tests/graphql_test.py) ---------------


def test_graphql_execute_aggregates(df_local):
    df = df_local
    result = df.graphql.execute("""
    {
        df {
            count
            min { x y }
            mean { x y }
            max { x y }
        }
    }
    """)
    assert not result.errors
    assert result.data["df"]["count"] == len(df)
    assert result.data["df"]["min"]["x"] == df.min("x")
    assert result.data["df"]["min"]["y"] == df.min("y")
    assert result.data["df"]["max"]["x"] == df.max("x")
    assert result.data["df"]["mean"]["x"] == df.mean("x")


def test_graphql_execute_groupby(df_local):
    df = df_local
    result = df.graphql.execute("""
    {
        df {
            groupby {
                g {
                    count
                    keys
                    min { x }
                }
            }
        }
    }
    """)
    assert not result.errors
    dfg = df.groupby("g", agg={"xmin": vt.agg.min("x")}, sort=True)
    assert result.data["df"]["groupby"]["g"]["min"]["x"] == dfg["xmin"].tolist()
    assert result.data["df"]["groupby"]["g"]["keys"] == dfg["g"].tolist()
    dfc = df.groupby("g", agg="count", sort=True)
    assert result.data["df"]["groupby"]["g"]["count"] == dfc["count"].tolist()


def test_graphql_execute_nested_groupby(df_local):
    result = df_local.graphql.execute("""
    {
        df { groupby { g { name { count } } } }
    }
    """)
    assert not result.errors
    dfg = df_local.groupby(["g", "name"], agg="count", sort=True)
    assert result.data["df"]["groupby"]["g"]["name"]["count"] == dfg["count"].tolist()


def test_graphql_execute_row_pagination(df_local):
    df = df_local

    def values(rows, name):
        return [r[name] for r in rows]

    result = df.graphql.execute("{ df { row { x } } }")
    assert not result.errors
    assert values(result.data["df"]["row"], "x") == df.x.tolist()

    result = df.graphql.execute("{ df { row(offset: 2) { x } } }")
    assert values(result.data["df"]["row"], "x") == df[2:].x.tolist()

    result = df.graphql.execute("{ df { row(limit: 2) { x } } }")
    assert values(result.data["df"]["row"], "x") == df[:2].x.tolist()

    result = df.graphql.execute("{ df { row(offset: 3, limit: 2) { x } } }")
    assert values(result.data["df"]["row"], "x") == df[3:5].x.tolist()


def test_graphql_execute_where(df_local):
    df = df_local
    result = df.graphql.execute("""
    {
        df(where: {x: {_eq: 4}}) { row { x } }
    }
    """)
    assert not result.errors
    assert [r["x"] for r in result.data["df"]["row"]] == [4.0]

    result = df.graphql.execute("""
    {
        df(where: {_or: [{x: {_eq: 4}}, {x: {_eq: 5}}]}) { count }
    }
    """)
    assert result.data["df"]["count"] == 2

    result = df.graphql.execute("""
    {
        df(where: {_not: {x: {_lt: 8}}}) { count }
    }
    """)
    assert result.data["df"]["count"] == 2

    result = df.graphql.execute("""
    {
        df(where: {name: {_eq: "n0"}}) { count }
    }
    """)
    assert result.data["df"]["count"] == 4


def test_graphql_execute_alias_and_query_keyword(df_local):
    result = df_local.graphql.execute("query Foo { frame: df { n: count } }")
    assert not result.errors
    assert result.data["frame"]["n"] == 10


def test_graphql_execute_errors(df_local):
    result = df_local.graphql.execute("{ df { count }")  # unbalanced braces
    assert result.errors
    result = df_local.graphql.execute("{ df { nosuchfield } }")
    assert result.errors
    result = df_local.graphql.execute("{ nosuchframe { count } }")
    assert result.errors


def test_cache_disk_backend(tmp_path):
    import vaex_tpu as vt
    from vaex_tpu import cache
    rng = np.random.default_rng(0)
    df = vt.from_arrays(x=rng.random(1000), g=rng.integers(0, 5, 1000).astype("i8"))
    with cache.disk(path=str(tmp_path / "c"), clear_on_exit=False):
        r1 = df.groupby("g", agg={"x": "sum"}, sort=True)
        before = cache.hits
        r2 = df.groupby("g", agg={"x": "sum"}, sort=True)
        assert cache.hits > before
        np.testing.assert_allclose(np.asarray(r1["x"].values), np.asarray(r2["x"].values))
    # a FRESH process-equivalent: new backend over the same dir still hits
    with cache.disk(path=str(tmp_path / "c")):
        before = cache.hits
        df.groupby("g", agg={"x": "sum"}, sort=True)
        assert cache.hits > before


def test_cache_memory_lru_eviction():
    from vaex_tpu.cache import MemoryCacheLRU
    c = MemoryCacheLRU(size_limit=100)
    a = np.zeros(10)  # 80 bytes
    c.set("a", a)
    c.set("b", np.zeros(10))
    assert c.get("a") is None or c.get("b") is not None  # something evicted
    assert len(c._data) >= 1


def test_cache_multilevel(tmp_path):
    from vaex_tpu.cache import DiskCache, MemoryCache, MultilevelCache
    mem, dsk = MemoryCache(), DiskCache(path=str(tmp_path / "c2"))
    ml = MultilevelCache(mem, dsk)
    ml.set("k", np.arange(3))
    mem.clear()
    got = ml.get("k")  # falls through to disk, backfills memory
    np.testing.assert_array_equal(got, np.arange(3))
    assert mem.get("k") is not None


def test_dataset_hashed_sidecar(tmp_path):
    import vaex_tpu as vt
    df = vt.from_arrays(x=np.arange(100.0), y=np.arange(100.0) ** 2)
    path = str(tmp_path / "t.hdf5")
    df.export_hdf5(path)
    ds = vt.open(path).dataset_for_execution()
    # unwrap decorators to the file node
    base = ds
    while hasattr(base, "original"):
        base = base.original
    h1 = base.hashed()
    sidecar = f"{path}.d/hashes.yaml"
    import os
    assert os.path.exists(sidecar)
    h2 = base.hashed()  # second call: read from sidecar
    assert h1.fingerprint() == h2.fingerprint()
    assert h1.fingerprint() != base.fingerprint()
    # content change invalidates
    df2 = vt.from_arrays(x=np.arange(100.0) + 1, y=np.arange(100.0) ** 2)
    df2.export_hdf5(path)
    ds2 = vt.open(path).dataset_for_execution()
    base2 = ds2
    while hasattr(base2, "original"):
        base2 = base2.original
    assert base2.hashed().fingerprint() != h1.fingerprint()


def test_graphql_schema_sdl():
    import vaex_tpu as vt
    df = vt.from_arrays(x=np.arange(5.0), n=np.arange(5, dtype="i4"),
                        s=np.asarray(["a", "b", "c", "d", "e"], dtype=object))
    sdl = df.graphql.schema_sdl()
    assert "type Query" in sdl and "input DataFrameWhere" in sdl
    assert "x: CompareFloat" in sdl and "n: CompareInt" in sdl
    assert "s: CompareString" in sdl
    assert "type GroupByLevel" in sdl


def test_graphene_schema_when_available():
    """graphql.py schema(): real graphene interop (skips without graphene;
    the SDL + dict/string executors cover the semantics regardless)."""
    pytest.importorskip("graphene")
    df = vt.from_arrays(x=np.arange(10.0), n=np.arange(10))
    schema = df.graphql.schema()
    result = schema.execute("{ df(where: {x: {_gt: 4}}) { count min { x } } }")
    assert not result.errors
    assert result.data["df"]["count"] == 5
    assert result.data["df"]["min"]["x"] == 5.0


def test_graphene_schema_import_error_message():
    try:
        import graphene  # noqa: F401
        pytest.skip("graphene installed")
    except ImportError:
        pass
    df = vt.from_arrays(x=np.arange(3.0))
    with pytest.raises(ImportError, match="schema_sdl"):
        df.graphql.schema()
