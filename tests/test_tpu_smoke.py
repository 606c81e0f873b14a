"""TPU-only smoke tests for the Pallas kernel paths.

The main suite runs on the CPU backend where the Pallas kernels are disabled
(XLA fallbacks cover correctness); this file exercises the real kernels and
only runs when a TPU is the default backend:

    VAEX_TPU_TEST_REEXEC=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


def _tpu():
    import jax
    return jax.default_backend() == "tpu"


pytestmark = pytest.mark.skipif(not _tpu(), reason="needs a TPU backend")


def test_flat_kernel_groupby():
    rng = np.random.default_rng(0)
    n, k = 1_000_000, 100
    keys = rng.integers(0, k, n).astype(np.int64)
    x = rng.random(n)
    df = vt.from_arrays(i1=keys, x=x).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"s": vt.agg.sum("x"), "c": "count"}, sort=True)
    npt.assert_array_equal(out["c"].tolist(), np.bincount(keys, minlength=k))
    npt.assert_allclose(out["s"].tolist(), np.bincount(keys, weights=x, minlength=k),
                        rtol=1e-7)


def test_channel_kernel_exact_int64():
    """The channel-limb kernel: integer sums exact mod 2^64 (the reference's
    C++ int64 accumulation semantics, superagg.cpp:350)."""
    rng = np.random.default_rng(1)
    n, k = 500_000, 1500
    keys = rng.integers(0, k, n).astype(np.int64)
    iv = rng.integers(-(2 ** 62), 2 ** 62, n, dtype=np.int64)
    df = vt.from_arrays(i1=keys, iv=iv).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"s": vt.agg.sum("iv")}, sort=True)
    want = np.zeros(k, np.int64)
    np.add.at(want, keys, iv)
    npt.assert_array_equal(np.asarray(out["s"].tolist()), want)


def test_channel_kernel_float_precision():
    """Cancellation-heavy float sums: the channel kernel holds ~1e-8 absolute
    (the old HIGHEST one-hot kernel drifted to ~3e-4 from in-block f32
    rounding)."""
    rng = np.random.default_rng(2)
    n, k = 500_000, 1500
    keys = rng.integers(0, k, n).astype(np.int64)
    v = rng.normal(0, 100, n)
    df = vt.from_arrays(i1=keys, v=v).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"s": vt.agg.sum("v")}, sort=True)
    want = np.bincount(keys, weights=v, minlength=k)
    npt.assert_allclose(np.asarray(out["s"].tolist()), want, rtol=1e-6, atol=1e-6)


def test_channel_kernel_raw():
    from vaex_tpu.ops.pallas_gridagg import fused_additive_channels
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    n, G = 300_000, 700
    idx = rng.integers(0, G, n).astype(np.int32)
    v = rng.normal(0, 1, n)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    ones = np.ones(n, np.float32)
    f = jax.jit(lambda i, c, h, l: fused_additive_channels(i, [c], [(h, l)], G))
    ss, fs = f(jnp.asarray(idx), jnp.asarray(ones), jnp.asarray(hi), jnp.asarray(lo))
    npt.assert_array_equal(np.asarray(ss)[0].astype(np.int64), np.bincount(idx, minlength=G))
    npt.assert_allclose(np.asarray(fs)[0], np.bincount(idx, weights=v, minlength=G),
                        atol=1e-9, rtol=1e-9)


def test_two_level_kernel_groupby():
    rng = np.random.default_rng(0)
    n, k = 1_000_000, 10_000
    keys = rng.integers(0, k, n).astype(np.int64)
    x = rng.random(n)
    df = vt.from_arrays(i1=keys, x=x).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"s": vt.agg.sum("x"), "c": "count"}, sort=True)
    npt.assert_array_equal(out["c"].tolist(), np.bincount(keys, minlength=k))
    npt.assert_allclose(out["s"].tolist(), np.bincount(keys, weights=x, minlength=k),
                        rtol=1e-6)


def test_probe_kernel_isin():
    rng = np.random.default_rng(0)
    n = 1_000_000
    keys = rng.integers(0, 100_000, n).astype(np.int64)
    df = vt.from_arrays(k=keys).to_device()
    values = rng.choice(100_000, 500, replace=False).astype(np.int64)
    got = int(df.count(selection=str(df["k"].isin(values))))
    assert got == int(np.isin(keys, values).sum())


def test_sort_strategy_large_grid():
    rng = np.random.default_rng(0)
    n, k = 1_000_000, 300_000
    keys = rng.integers(0, k, n).astype(np.int64)
    x = rng.random(n)
    df = vt.from_arrays(i1=keys, x=x).categorize("i1", labels=list(range(k))).to_device()
    sums = df.sum("x", binby=["i1"])
    npt.assert_allclose(np.asarray(sums).sum(), x.sum(), rtol=1e-9)


def test_partition_kernel_groupby():
    """32K < G <= ~1M rides the partitioned two-phase kernel; exact counts
    and int sums, 1e-9-class float sums."""
    rng = np.random.default_rng(3)
    n, k = 1_000_000, 100_000
    keys = rng.integers(0, k, n).astype(np.int64)
    x = rng.random(n) * 100
    v = rng.integers(1, 6, n).astype(np.int64)
    df = vt.from_arrays(i1=keys, x=x, v=v).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"c": "count", "s": vt.agg.sum("x"),
                                "vs": vt.agg.sum("v")}, sort=True)
    cols = {name: np.asarray(out[name].tolist()) for name in ("i1", "c", "s", "vs")}
    # categorical groupby keeps every category (empty ones included)
    npt.assert_array_equal(cols["c"], np.bincount(keys, minlength=k))
    npt.assert_array_equal(cols["vs"],
                           np.bincount(keys, weights=v.astype(float), minlength=k))
    npt.assert_allclose(cols["s"], np.bincount(keys, weights=x, minlength=k),
                        rtol=1e-9, atol=1e-7)


def test_partition_overflow_retry_sorted_keys():
    """Pre-sorted keys cluster every block into one bucket -> guaranteed
    capacity overflow -> the executor must rerun on the sort strategy and
    still return the right answer."""
    n, k = 1_000_000, 100_000
    keys = np.sort(np.random.default_rng(4).integers(0, k, n)).astype(np.int64)
    x = np.ones(n)
    df = vt.from_arrays(i1=keys, x=x).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"s": vt.agg.sum("x")}, sort=True)
    want = np.bincount(keys, minlength=k)
    npt.assert_allclose(np.asarray(out["s"].tolist()), want, rtol=1e-12)


def test_partition_kernel_minmax():
    """min/max at mid-G ride the partition kernel's extreme path: exact for
    f32 values and range-bounded ints."""
    rng = np.random.default_rng(9)
    n, k = 1_000_000, 100_000
    keys = rng.integers(0, k, n).astype(np.int64)
    xf = (rng.random(n) * 100).astype(np.float32)
    vi = rng.integers(1, 16, n).astype(np.int64)
    df = vt.from_arrays(i1=keys, xf=xf, vi=vi).categorize(
        "i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"mx": vt.agg.max("xf"), "mn": vt.agg.min("xf"),
                                "vmx": vt.agg.max("vi"), "c": "count"}, sort=True)
    c = np.asarray(out["c"].tolist())
    present = c > 0
    mx = np.asarray(out["mx"].tolist())
    mn = np.asarray(out["mn"].tolist())
    vmx = np.asarray(out["vmx"].tolist())
    import pandas as pd
    pdf = pd.DataFrame({"k": keys, "xf": xf, "vi": vi})
    g = pdf.groupby("k")
    want_mx = np.full(k, -np.inf); want_mn = np.full(k, np.inf)
    want_vmx = np.zeros(k)
    want_mx[g.size().index] = g["xf"].max(); want_mn[g.size().index] = g["xf"].min()
    want_vmx[g.size().index] = g["vi"].max()
    npt.assert_array_equal(mx[present], want_mx[present].astype(np.float32))
    npt.assert_array_equal(mn[present], want_mn[present].astype(np.float32))
    npt.assert_array_equal(vmx[present], want_vmx[present])


def test_channel_kernel_implicit_ones():
    """Implicit (None) count channels derive the {0,1} row from the
    validity-folded index in VMEM — exact counts, no HBM ones stream."""
    from vaex_tpu.ops.pallas_gridagg import (fused_additive_channels,
                                             fused_additive_two_level_channels)
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    n, G = 300_000, 700
    idx = rng.integers(0, G + 40, n).astype(np.int32)  # some rows drop
    v = rng.normal(0, 1, n)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    mask = idx < G
    f = jax.jit(lambda i, h, l: fused_additive_channels(i, [None], [(h, l)], G))
    ss, fs = f(jnp.asarray(idx), jnp.asarray(hi), jnp.asarray(lo))
    npt.assert_array_equal(np.asarray(ss)[0].astype(np.int64),
                           np.bincount(idx[mask], minlength=G))
    npt.assert_allclose(np.asarray(fs)[0],
                        np.bincount(idx[mask], weights=v[mask], minlength=G),
                        atol=1e-9, rtol=1e-9)
    # two-level variant (mid cardinality)
    G2 = 5000
    idx2 = rng.integers(0, G2 + 100, n).astype(np.int32)
    mask2 = idx2 < G2
    f2 = jax.jit(lambda i, h, l: fused_additive_two_level_channels(
        i, [None], [(h, l)], G2))
    ss2, fs2 = f2(jnp.asarray(idx2), jnp.asarray(hi), jnp.asarray(lo))
    npt.assert_array_equal(np.asarray(ss2)[0].astype(np.int64),
                           np.bincount(idx2[mask2], minlength=G2))
    npt.assert_allclose(np.asarray(fs2)[0],
                        np.bincount(idx2[mask2], weights=v[mask2], minlength=G2),
                        atol=1e-9, rtol=1e-9)


def test_groupby_count_uses_implicit_channel():
    """End-to-end: groupby count+sum on device still exact with the
    implicit count channel engaged (count('*') -> None spec)."""
    rng = np.random.default_rng(5)
    n, k = 400_000, 300
    keys = rng.integers(0, k, n).astype(np.int64)
    v = rng.normal(0, 10, n)
    df = vt.from_arrays(i1=keys, v=v).categorize("i1", labels=list(range(k))).to_device()
    out = df.groupby("i1", agg={"c": "count", "s": vt.agg.sum("v")}, sort=True)
    npt.assert_array_equal(np.asarray(out["c"].tolist()),
                           np.bincount(keys, minlength=k))
    npt.assert_allclose(np.asarray(out["s"].tolist()),
                        np.bincount(keys, weights=v, minlength=k),
                        rtol=1e-6, atol=1e-6)
