"""IO round-trips: hdf5, parquet, arrow, feather, csv, json
(reference: export_test.py, hdf5_test.py, from_csv_test.py)."""

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


@pytest.fixture
def df_src():
    x = np.arange(10, dtype="f8")
    return vt.from_arrays(
        x=x,
        i=np.arange(10, dtype="i8"),
        m=np.ma.MaskedArray(x.copy(), x < 2),
        name=np.asarray([f"s{int(v)}" for v in x], dtype=object),
        t=np.arange("2015-01-01", "2015-01-11", dtype="M8[D]"),
    )


@pytest.mark.parametrize("ext", ["hdf5", "parquet", "arrow", "feather", "csv"])
def test_roundtrip(df_src, tmp_path, ext):
    path = str(tmp_path / f"out.{ext}")
    df_src.export(path)
    df = vt.open(path)
    assert len(df) == 10
    npt.assert_allclose(np.asarray(df["x"].tolist(), dtype="f8"), np.arange(10.0))
    assert df["i"].tolist() == list(range(10))
    if ext != "csv":  # csv loses null/string typing nuances
        m = df["m"].tolist()
        assert m[0] is None or np.isnan(m[0])
        assert df["name"].tolist()[3] == "s3"


def test_hdf5_mmap_lazy(df_src, tmp_path):
    path = str(tmp_path / "lazy.hdf5")
    df_src.export_hdf5(path)
    df = vt.open(path)
    assert df.sum("x") == np.arange(10.0).sum()
    # datetime preserved
    assert str(np.asarray(df["t"].tolist()[0]))[:10] == "2015-01-01"


def test_open_many_concat(df_src, tmp_path):
    p1 = str(tmp_path / "a.hdf5")
    p2 = str(tmp_path / "b.hdf5")
    df_src.export_hdf5(p1)
    df_src.export_hdf5(p2)
    df = vt.open_many([p1, p2])
    assert len(df) == 20
    assert df.sum("x") == 2 * np.arange(10.0).sum()


def test_from_pandas():
    import pandas as pd
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df = vt.from_pandas(pdf)
    assert df["a"].tolist() == [1, 2, 3]
    assert df["b"].tolist() == ["x", "y", "z"]


def test_from_csv(tmp_path):
    path = str(tmp_path / "in.csv")
    with open(path, "w") as f:
        f.write("a,b\n1,2.5\n3,4.5\n")
    df = vt.from_csv(path)
    assert df["a"].tolist() == [1, 3]
    npt.assert_allclose(df["b"].tolist(), [2.5, 4.5])


def test_csv_convert(tmp_path):
    path = str(tmp_path / "in.csv")
    with open(path, "w") as f:
        f.write("a\n1\n2\n")
    df = vt.from_csv(path, convert=True)
    import os
    assert os.path.exists(path + ".hdf5")
    assert df["a"].tolist() == [1, 2]


def test_parquet_lazy_chunks(df_src, tmp_path):
    path = str(tmp_path / "chunked.parquet")
    df_src.export_parquet(path)
    df = vt.open(path)
    df._tile_rows = 3  # force multi-tile streaming through row groups
    assert df.count() == 10
    assert df.sum("x") == np.arange(10.0).sum()


def test_export_json(df_src, tmp_path):
    path = str(tmp_path / "out.json")
    df_src[["x", "i"]].export(path)
    import json
    with open(path) as f:
        records = json.load(f)
    assert len(records) == 10
    assert records[0]["i"] == 0


def test_fits_roundtrip(tmp_path):
    df = vt.from_arrays(x=np.arange(5, dtype="f8"), i=np.arange(5, dtype="i4"),
                        s=np.asarray(["aa", "b", "ccc", "d", "e"], dtype=object))
    path = str(tmp_path / "t.fits")
    df.export(path)
    df2 = vt.open(path)
    assert len(df2) == 5
    npt.assert_allclose(np.asarray(df2["x"].tolist()), np.arange(5.0))
    assert df2["i"].tolist() == list(range(5))
    assert df2["s"].tolist() == ["aa", "b", "ccc", "d", "e"]
    assert df2.sum("x") == 10.0


def test_export_many(df_src, tmp_path):
    paths = df_src[["x", "i"]].export_many(str(tmp_path / "part-{i:02d}.parquet"),
                                           max_rows_per_file=4)
    assert len(paths) == 3
    df = vt.open_many(paths)
    assert len(df) == 10
    assert df.sum("i") == 45


def test_export_partitioned(df_src, tmp_path):
    df = vt.from_arrays(g=np.array([0, 0, 1], dtype="i8"), x=np.arange(3.0))
    paths = df.export_partitioned(str(tmp_path / "data.parquet"), by="g")
    assert len(paths) == 2
    df0 = vt.open(paths[0])
    assert len(df0) == 2


def test_open_remote_memory_fs(df_src, tmp_path):
    fsspec = pytest.importorskip("fsspec")
    local = str(tmp_path / "remote.parquet")
    df_src[["x", "i"]].export(local)
    fs = fsspec.filesystem("memory")
    with open(local, "rb") as f:
        data = f.read()
    with fs.open("/bucket/remote.parquet", "wb") as f:
        f.write(data)
    df = vt.open("memory://bucket/remote.parquet")
    assert len(df) == 10
    assert df.sum("i") == 45
    # second open hits the local content cache
    df2 = vt.open("memory://bucket/remote.parquet")
    assert df2.sum("i") == 45


def test_votable_roundtrip(tmp_path):
    import vaex_tpu as vt
    df = vt.from_arrays(
        x=np.arange(20, dtype="f8"),
        i=np.arange(20, dtype="i4"),
        m=np.ma.MaskedArray(np.arange(20, dtype="f8"), np.arange(20) < 3),
        s=np.asarray([f"a{i} <&>" for i in range(20)], dtype=object),
    )
    path = str(tmp_path / "t.vot")
    df.export_votable(path)
    back = vt.open(path)
    np.testing.assert_allclose(back.evaluate("x", array_type="numpy"), np.arange(20.0))
    np.testing.assert_array_equal(back.evaluate("i", array_type="numpy"), np.arange(20, dtype="i4"))
    m = back.evaluate("m", array_type="numpy")
    assert np.ma.getmaskarray(m)[:3].all() and not np.ma.getmaskarray(m)[3:].any()
    s = list(back.evaluate("s", array_type="numpy"))
    assert s[5] == "a5 <&>"


def test_votable_parse_tap_style_response():
    from vaex_tpu.io.votable import parse_votable
    body = b"""<?xml version="1.0"?>
    <VOTABLE xmlns="http://www.ivoa.net/xml/VOTable/v1.3" version="1.4">
      <RESOURCE type="results"><TABLE>
        <FIELD name="ra" datatype="double"/>
        <FIELD name="n" datatype="int"><VALUES null="-999"/></FIELD>
        <DATA><TABLEDATA>
          <TR><TD>10.5</TD><TD>3</TD></TR>
          <TR><TD>11.5</TD><TD>-999</TD></TR>
        </TABLEDATA></DATA>
      </TABLE></RESOURCE>
    </VOTABLE>"""
    cols = parse_votable(body)
    np.testing.assert_allclose(np.asarray(cols["ra"]), [10.5, 11.5])
    n = cols["n"]
    assert n[0] == 3 and np.ma.getmaskarray(n)[1]
