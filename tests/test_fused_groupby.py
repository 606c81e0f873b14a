"""Fused one-sort groupby (vaex_tpu/fused_groupby.py): the q10-class plan
that replaces set-build + probe + aggregation sort with ONE carried sort."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt
import vaex_tpu.fused_groupby as fg


@pytest.fixture
def data():
    rng = np.random.default_rng(10)
    n = 50_000
    return dict(
        id1=rng.integers(0, 100, n).astype("i8"),
        id3=rng.integers(0, 20_000, n).astype("i8"),
        # sparse single key: span > DENSE_RANGE_MAX so the classic path
        # would need a set build — the fused path's win condition
        sparse=rng.integers(0, 1 << 40, n).astype("i8"),
        v1=rng.integers(1, 6, n).astype("i8"),
        v3=np.where(rng.random(n) < 0.1, np.nan, rng.normal(0, 50, n)),
    )


def _spy(monkeypatch):
    calls = []
    orig = fg._run
    monkeypatch.setattr(fg, "_run", lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    return calls


def test_fused_multikey_matches_pandas(data, monkeypatch):
    import pandas as pd
    calls = _spy(monkeypatch)
    df = vt.from_arrays(**data)
    out = df.groupby(["id1", "id3"], agg={"v3": "sum", "v1": "count"}, sort=True)
    assert calls, "fused path did not engage"
    oracle = pd.DataFrame(data).groupby(["id1", "id3"], as_index=False).agg(
        v3=("v3", "sum"), v1=("v1", "count"))
    npt.assert_array_equal(np.asarray(out["id1"].tolist()), oracle["id1"].to_numpy())
    npt.assert_array_equal(np.asarray(out["id3"].tolist()), oracle["id3"].to_numpy())
    npt.assert_allclose(np.asarray(out["v3"].tolist()), oracle["v3"].to_numpy(),
                        rtol=1e-6, atol=1e-9)
    npt.assert_array_equal(np.asarray(out["v1"].tolist()), oracle["v1"].to_numpy())


def test_fused_full_surface_matches_classic(data, monkeypatch):
    """Fused vs the classic (set-build + grid) path on the same query."""
    agg = {"mn": vt.agg.min("v3"), "mx": vt.agg.max("v3"),
           "m": vt.agg.mean("v3"), "sd": vt.agg.std("v3"),
           "c": "count", "cv": vt.agg.count("v3"), "s": vt.agg.sum("v1")}
    df = vt.from_arrays(**data)
    calls = _spy(monkeypatch)
    fused = df.groupby("sparse", agg=agg, sort=True)
    assert calls
    monkeypatch.setenv("VAEX_TPU_FUSED_GROUPBY", "0")
    classic = df.groupby("sparse", agg=agg, sort=True)
    npt.assert_array_equal(np.asarray(fused["sparse"].tolist()),
                           np.asarray(classic["sparse"].tolist()))
    for c in ("mn", "mx", "c", "cv", "s"):
        npt.assert_array_equal(np.asarray(fused[c].tolist()),
                               np.asarray(classic[c].tolist()), err_msg=c)
    for c in ("m", "sd"):
        npt.assert_allclose(np.asarray(fused[c].tolist()),
                            np.asarray(classic[c].tolist()),
                            rtol=1e-6, atol=1e-9, equal_nan=True, err_msg=c)


def test_fused_int64_sums_exact(monkeypatch):
    import pandas as pd
    calls = _spy(monkeypatch)
    rng = np.random.default_rng(3)
    n = 30_000
    k = rng.integers(0, 1 << 50, n).astype("i8")  # sparse: fused qualifies
    k = k - (k % 601)  # ~collisions so groups have >1 row
    big = rng.integers(-(2 ** 62), 2 ** 62, n).astype("i8")
    df = vt.from_arrays(k=k, big=big)
    out = df.groupby("k", agg={"s": vt.agg.sum("big")}, sort=True)
    assert calls
    oracle = pd.DataFrame({"k": k, "big": big}).groupby("k").agg(s=("big", "sum"))
    npt.assert_array_equal(np.asarray(out["s"].tolist()), oracle["s"].to_numpy())


def test_fused_bails_on_filter_and_selection(data, monkeypatch):
    calls = _spy(monkeypatch)
    df = vt.from_arrays(**data)
    fdf = df[df["v1"] > 2]
    out = fdf.groupby("id1", agg={"c": "count"}, sort=True)
    assert not calls  # filtered frames ride the classic path
    import pandas as pd
    pdf = pd.DataFrame(data)
    oracle = pdf[pdf["v1"] > 2].groupby("id1").size()
    npt.assert_array_equal(np.asarray(out["c"].tolist()), oracle.to_numpy())
    out2 = df.groupby("id1", agg={"c": vt.agg.count("v3", selection="v1 > 2")},
                      sort=True)
    assert not calls  # selections too
    oracle2 = pdf[(pdf["v1"] > 2) & pdf["v3"].notna()].groupby("id1").size()
    npt.assert_array_equal(np.asarray(out2["c"].tolist()), oracle2.to_numpy())


def test_fused_descending(data, monkeypatch):
    import pandas as pd
    calls = _spy(monkeypatch)
    df = vt.from_arrays(**data)
    out = df.groupby("sparse", agg={"c": "count"}, sort=True, ascending=False)
    assert calls
    oracle = pd.DataFrame(data).groupby("sparse").size().sort_index(ascending=False)
    npt.assert_array_equal(np.asarray(out["sparse"].tolist()), oracle.index.to_numpy())
    npt.assert_array_equal(np.asarray(out["c"].tolist()), oracle.to_numpy())


def test_fused_leaves_dense_shapes_to_classic(data, monkeypatch):
    """Single dense-range keys and small cartesian products must NOT route
    through the fused sort (the partition kernels are faster there)."""
    calls = _spy(monkeypatch)
    df = vt.from_arrays(**data)
    df.groupby("id1", agg={"c": "count"})
    df.groupby("id3", agg={"c": "count"})
    assert not calls


def test_fused_honors_ddof(data, monkeypatch):
    """std/var with ddof=1 (pandas convention) must not silently fall back
    to ddof=0 on the fused path (advisor r3 medium); ddof is also part of
    the result cache key so ddof=0 and ddof=1 don't alias."""
    import pandas as pd
    calls = _spy(monkeypatch)
    df = vt.from_arrays(**data)
    out0 = df.groupby("sparse", agg={"s": vt.agg.std("v3", ddof=0)}, sort=True)
    out1 = df.groupby("sparse", agg={"s": vt.agg.std("v3", ddof=1)}, sort=True)
    assert calls, "fused path did not engage"
    pdf = pd.DataFrame(data)
    g = pdf.groupby("sparse")["v3"]
    oracle0 = g.std(ddof=0).to_numpy()
    oracle1 = g.std(ddof=1).to_numpy()
    npt.assert_allclose(np.asarray(out0["s"].tolist()), oracle0,
                        rtol=1e-9, atol=1e-12)
    npt.assert_allclose(np.asarray(out1["s"].tolist()), oracle1,
                        rtol=1e-9, atol=1e-12)


def test_unpacked_multikey_span_overflow():
    """Span products past int64 (q10 at 1e8) ride the UNPACKED multi-key
    sort (raw key columns as lax.sort keys) — a shape the reference cannot
    run at all (GrouperCombined int64 packing overflows)."""
    import pandas as pd
    rng = np.random.default_rng(17)
    n = 30_000
    a = rng.integers(0, 2**33, n).astype("i8")   # span ~2^33
    b = rng.integers(0, 2**33, n).astype("i8")   # product ~2^66 > 2^62
    x = rng.normal(0, 5, n)
    v = rng.integers(-100, 100, n).astype("i8")
    df = vt.from_arrays(a=a, b=b, x=x, v=v)
    out = df.groupby(["a", "b"], agg={"s": vt.agg.sum("x"), "c": "count",
                                      "iv": vt.agg.sum("v"),
                                      "mx": vt.agg.max("x")}, sort=True)
    oracle = (pd.DataFrame({"a": a, "b": b, "x": x, "v": v})
              .groupby(["a", "b"], as_index=False)
              .agg(s=("x", "sum"), c=("x", "size"), iv=("v", "sum"),
                   mx=("x", "max")))
    npt.assert_array_equal(np.asarray(out["a"].tolist()), oracle["a"].to_numpy())
    npt.assert_array_equal(np.asarray(out["b"].tolist()), oracle["b"].to_numpy())
    npt.assert_array_equal(np.asarray(out["c"].tolist()), oracle["c"].to_numpy())
    npt.assert_array_equal(np.asarray(out["iv"].tolist()), oracle["iv"].to_numpy())
    npt.assert_allclose(np.asarray(out["s"].tolist()), oracle["s"].to_numpy(),
                        rtol=1e-9, atol=1e-9)
    npt.assert_allclose(np.asarray(out["mx"].tolist()), oracle["mx"].to_numpy())


def test_fused_dense_key_extremes_routing(monkeypatch):
    """Dense single keys with extremes at scale ride the fused one-sort
    plan (q7-class); results match pandas exactly."""
    import pandas as pd
    import vaex_tpu.fused_groupby as fg
    # lower the scale gate so the routing engages at test size
    rng = np.random.default_rng(23)
    n = 50_000
    k = rng.integers(0, 500, n).astype("i8")       # dense span
    v1 = rng.integers(1, 6, n).astype("i8")
    v2 = rng.normal(0, 3, n)
    df = vt.from_arrays(k=k, v1=v1, v2=v2)
    src = fg.try_fused_sort_groupby

    def patched(df_, by, actions, **kw):
        return src(df_, by, actions, **kw)
    monkeypatch.setattr(fg, "try_fused_sort_groupby", patched)
    # directly exercise the fused plan below the gate by calling _run
    from vaex_tpu.groupby import GroupByBase, _dense_candidates
    info = _dense_candidates(["k"], df, None)
    lo, hi, n_valid = info["k"]
    spans = [(lo, hi - lo + 1)]
    parsed = GroupByBase._parse_actions(
        fg._ParseShim(df, ["k"]),
        {"mx": vt.agg.max("v1"), "mn": vt.agg.min("v2"), "c": "count"})
    plan = fg._agg_plan(df, parsed)
    assert plan is not None
    out = fg._run(df, ["k"], spans, plan, True)
    oracle = (pd.DataFrame({"k": k, "v1": v1, "v2": v2}).groupby("k")
              .agg(mx=("v1", "max"), mn=("v2", "min"), c=("v1", "size")))
    npt.assert_array_equal(np.asarray(out["k"].tolist()), oracle.index.to_numpy())
    npt.assert_array_equal(np.asarray(out["mx"].tolist()), oracle["mx"].to_numpy())
    npt.assert_allclose(np.asarray(out["mn"].tolist()), oracle["mn"].to_numpy())
    npt.assert_array_equal(np.asarray(out["c"].tolist()), oracle["c"].to_numpy())
