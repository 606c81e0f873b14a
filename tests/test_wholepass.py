"""The whole-pass fast path: device-resident data -> one compiled fori_loop.

Checks the fused path engages (executor.whole_passes), produces the same
results as the chunked per-tile path, and falls back cleanly when the pass
needs host staging.
"""

import numpy as np
import pytest

import vaex_tpu as vt


@pytest.fixture
def dev_df():
    rng = np.random.default_rng(7)
    n = 1000
    keys = rng.integers(0, 13, n).astype(np.int64)
    x = rng.random(n)
    y = rng.integers(-50, 50, n).astype(np.int32)
    df = vt.from_arrays(k=keys, x=x, y=y).to_device()
    df._tile_rows = 128  # force many tiles inside the fori_loop
    return df, keys, x, y


def test_wholepass_groupby(dev_df):
    df, keys, x, y = dev_df
    res = df.groupby("k", agg={"s": vt.agg.sum("x"), "c": "count"}, sort=True)
    assert df.executor.whole_passes >= 1
    expect_c = np.bincount(keys, minlength=13)
    expect_s = np.bincount(keys, weights=x, minlength=13)
    assert list(res["c"].tolist()) == expect_c.tolist()
    np.testing.assert_allclose(np.asarray(res["s"].tolist()), expect_s, rtol=1e-12)


def test_wholepass_stats(dev_df):
    df, keys, x, y = dev_df
    before = getattr(df.executor, "whole_passes", 0)
    np.testing.assert_allclose(float(np.asarray(df.sum("x"))), x.sum(), rtol=1e-12)
    assert int(np.asarray(df.sum("y"))) == int(y.sum())
    np.testing.assert_allclose(float(np.asarray(df.mean("x"))), x.mean(), rtol=1e-12)
    assert df.executor.whole_passes > before


def test_wholepass_with_filter(dev_df):
    df, keys, x, y = dev_df
    dff = df[df.y > 0]
    got = float(np.asarray(dff.sum("x")))
    np.testing.assert_allclose(got, x[y > 0].sum(), rtol=1e-12)


def test_wholepass_matches_chunked(dev_df):
    df, keys, x, y = dev_df
    fast = df.minmax("x")
    host_df = vt.from_arrays(k=keys, x=x, y=y)
    host_df._tile_rows = 128
    slow = host_df.minmax("x")
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_host_data_does_not_engage_fastpath():
    rng = np.random.default_rng(3)
    df = vt.from_arrays(x=rng.random(100))
    before = getattr(df.executor, "whole_passes", 0)
    df.sum("x")
    assert getattr(df.executor, "whole_passes", 0) == before


def test_wholepass_trimmed_range(dev_df):
    df, keys, x, y = dev_df
    sub = df[100:900]
    got = float(np.asarray(sub.sum("x")))
    np.testing.assert_allclose(got, x[100:900].sum(), rtol=1e-12)


def test_wholepass_progress_and_cancel():
    """Whole-pass programs chunk into multiple dispatches when someone
    listens to progress, and honor cancellation mid-pass."""
    import pytest
    import vaex_tpu as vt
    from vaex_tpu.execution import UserAbort
    from vaex_tpu.execution import ExecutorLocal
    n = 64 * 1024
    df = vt.from_arrays(x=np.arange(n, dtype="f8"),
                        g=(np.arange(n) % 16).astype("i8")).to_device()
    df.executor = ExecutorLocal()  # private executor: callbacks stay local
    df._tile_rows = 1024  # 64 tiles -> 8 chunks of 8
    seen = []
    df.executor.signal_progress.connect(lambda p: seen.append(p) or True)
    assert float(np.asarray(df.sum("x"))) == float(np.arange(n).sum())
    assert len(seen) >= 8  # several intermediate progress points
    assert seen[-1] == 1.0

    # cancellation: return False after the first chunk
    df2 = vt.from_arrays(x=np.arange(n, dtype="f8")).to_device()
    df2.executor = ExecutorLocal()
    df2._tile_rows = 1024
    calls = []
    df2.executor.signal_progress.connect(lambda p: calls.append(p) or len(calls) < 2)
    s = df2.sum("x", delay=True)
    df2.execute()  # cancellation rejects the promise, execute returns
    assert len(calls) < 64  # stopped well before all 64 tiles
    with pytest.raises(UserAbort):
        s.get()
