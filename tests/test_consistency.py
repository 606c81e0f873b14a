"""Cross-path consistency: device-resident vs host-resident frames must agree
on every operator; chained end-to-end pipelines behave like pandas."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


@pytest.fixture
def pair():
    rng = np.random.default_rng(7)
    n = 5000
    host = vt.from_arrays(
        k=rng.integers(0, 37, n).astype("i8"),
        x=rng.random(n),
        y=rng.normal(0, 1, n),
        s=np.asarray([f"s{int(v) % 5}" for v in rng.integers(0, 100, n)], dtype=object),
    )
    host._tile_rows = 777  # uneven tiles
    dev = host.to_device()
    dev._tile_rows = 777
    return host, dev


def test_stats_agree(pair):
    host, dev = pair
    for method in ("count", "sum", "mean", "std", "min", "max"):
        a = np.asarray(getattr(host, method)("x"))
        b = np.asarray(getattr(dev, method)("x"))
        npt.assert_allclose(a, b, rtol=1e-12)


def test_groupby_agree(pair):
    host, dev = pair
    ah = host.groupby("k", agg={"s": vt.agg.sum("x"), "c": "count"}, sort=True)
    ad = dev.groupby("k", agg={"s": vt.agg.sum("x"), "c": "count"}, sort=True)
    assert ah["k"].tolist() == ad["k"].tolist()
    assert ah["c"].tolist() == ad["c"].tolist()
    npt.assert_allclose(ah["s"].tolist(), ad["s"].tolist(), rtol=1e-9)


def test_string_groupby_agree(pair):
    host, dev = pair
    ah = host.groupby("s", agg="count", sort=True)
    ad = dev.groupby("s", agg="count", sort=True)
    assert ah["s"].tolist() == ad["s"].tolist()
    assert ah["count"].tolist() == ad["count"].tolist()


def test_filter_selection_agree(pair):
    host, dev = pair
    for frame in (host, dev):
        frame.select("x > 0.5")
    assert host.count(selection=True) == dev.count(selection=True)
    hf = host.filter("y > 0")
    df_ = dev.filter("y > 0")
    assert len(hf) == len(df_)
    npt.assert_allclose(hf.sum("x"), df_.sum("x"), rtol=1e-12)


def test_isin_agree(pair):
    host, dev = pair
    values = [1, 5, 9, 22]
    a = host.count(selection=str(host["k"].isin(values)))
    b = dev.count(selection=str(dev["k"].isin(values)))
    assert int(a) == int(b)


def test_pipeline_end_to_end(pair):
    host, _ = pair
    import pandas as pd
    pdf = host.to_pandas_df(["k", "x", "y"])
    df = host.copy()
    df["z"] = df.x * 2 + df.y
    df2 = df[df.z > 0]
    got = df2.groupby("k", agg={"m": vt.agg.mean("z")}, sort=True)
    pdf["z"] = pdf.x * 2 + pdf.y
    expected = pdf[pdf.z > 0].groupby("k")["z"].mean()
    npt.assert_allclose(got["m"].tolist(), expected.to_numpy(), rtol=1e-6)
    assert got["k"].tolist() == list(expected.index)


def test_binby_agree(pair):
    host, dev = pair
    a = host.mean("y", binby=["x"], limits=[[0, 1]], shape=16)
    b = dev.mean("y", binby=["x"], limits=[[0, 1]], shape=16)
    npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, equal_nan=True)


def test_rolling_left_edge(df_local):
    X = np.arange(10.0)
    df = df_local.rolling(3, column="x", edge="left").sum()
    vals = df["x"].tolist()
    expected = [X[i:i + 3].sum() for i in range(8)] + [X[8:].sum(), X[9:].sum()]
    npt.assert_allclose(vals, expected)


def test_state_with_categories_roundtrip():
    df = vt.from_arrays(g=np.arange(12, dtype="i8") % 3, x=np.arange(12.0))
    df = df.categorize("g", labels=[0, 1, 2])
    state = df.state_get()
    df2 = vt.from_arrays(g=np.arange(12, dtype="i8") % 3, x=np.arange(12.0))
    df2.state_set(state)
    assert df2.is_category("g")
    out = df2.groupby("g", agg="count", sort=True)
    assert out["count"].tolist() == [4, 4, 4]
