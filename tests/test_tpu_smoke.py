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
