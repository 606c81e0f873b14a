"""Remote file access: block-level lazy cache (reference vaex/file/cache.py)."""

import numpy as np
import pytest

import vaex_tpu as vt


@pytest.fixture
def memfs_hdf5(tmp_path, monkeypatch):
    fsspec = pytest.importorskip("fsspec")
    monkeypatch.setenv("VAEX_TPU_FILE_CACHE", str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    n = 400_000  # ~3 MB/column: several 1 MiB blocks each
    df = vt.from_arrays(x=rng.random(n), y=rng.random(n),
                        z=rng.integers(0, 9, n).astype("i8"))
    local = str(tmp_path / "t.hdf5")
    df.export_hdf5(local)
    fs = fsspec.filesystem("memory")
    with open(local, "rb") as f:
        with fs.open("/t.hdf5", "wb") as out:
            out.write(f.read())
    return "memory://t.hdf5", df


def test_remote_hdf5_block_cache_lazy(memfs_hdf5):
    url, df_local = memfs_hdf5
    from vaex_tpu.io.remote import open_remote
    df = open_remote(url)
    assert len(df) == len(df_local)
    # touching ONE column must not fetch the whole object
    ds = df.dataset_for_execution()
    base = ds
    while hasattr(base, "original"):
        base = base.original
    col = base["x"]
    from vaex_tpu.io.remote import ColumnBlockedRemote
    assert isinstance(col, ColumnBlockedRemote)
    cached = col.cached
    total_blocks = len(np.asarray(cached.present))
    before = cached.blocks_fetched
    np.testing.assert_allclose(np.asarray(col[0:1000]),
                               df_local.evaluate("x", 0, 1000))
    after = cached.blocks_fetched
    assert after > 0
    assert after < total_blocks  # lazy: only touched blocks came over

    # full-column aggregate matches
    assert float(np.asarray(df.sum("x"))) == pytest.approx(
        float(np.asarray(df_local.sum("x"))))


def test_remote_hdf5_cache_survives_reopen(memfs_hdf5):
    url, df_local = memfs_hdf5
    from vaex_tpu.io.remote import open_remote
    df1 = open_remote(url)
    s1 = float(np.asarray(df1.sum("y")))
    df2 = open_remote(url)  # second open: hits the existing block cache
    s2 = float(np.asarray(df2.sum("y")))
    assert s1 == pytest.approx(s2)


def test_remote_whole_fetch_fallback(tmp_path, monkeypatch):
    fsspec = pytest.importorskip("fsspec")
    monkeypatch.setenv("VAEX_TPU_FILE_CACHE", str(tmp_path / "cache2"))
    df = vt.from_arrays(a=np.arange(50.0))
    local = str(tmp_path / "t.parquet")
    df.export_parquet(local)
    fs = fsspec.filesystem("memory")
    with open(local, "rb") as f:
        with fs.open("/t.parquet", "wb") as out:
            out.write(f.read())
    from vaex_tpu.io.remote import open_remote
    df2 = open_remote("memory://t.parquet")
    assert len(df2) == 50
    np.testing.assert_allclose(np.asarray(df2.sum("a")), np.arange(50.0).sum())
