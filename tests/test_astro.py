"""Astro accessor + gadget/TAP readers (reference: packages/vaex-astro)."""

import struct

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt


@pytest.fixture
def df_sky():
    rng = np.random.default_rng(11)
    n = 500
    return vt.from_arrays(
        ra=rng.uniform(0, 360, n), dec=rng.uniform(-89, 89, n),
        pm_ra=rng.normal(0, 5, n), pm_dec=rng.normal(0, 5, n),
        parallax=rng.uniform(0.5, 20.0, n),
    ), rng


def test_eq2gal_roundtrip(df_sky):
    """eq2gal then gal2eq returns the original angles (numpy oracle:
    the two published J2000 matrices are mutual inverses)."""
    df, _ = df_sky
    df2 = df.astro.eq2gal("ra", "dec", "l", "b")
    df3 = df2.astro.gal2eq("l", "b", "ra2", "dec2")
    ra = df.evaluate("ra")
    dec = df.evaluate("dec")
    ra2 = np.mod(np.asarray(df3.evaluate("ra2")), 360.0)
    dec2 = np.asarray(df3.evaluate("dec2"))
    # the published J2000 matrices invert each other only to ~1e-7 (the
    # reference's own constants, transformations.py:7-16)
    npt.assert_allclose(np.mod(ra, 360.0), ra2, atol=2e-4)
    npt.assert_allclose(dec, dec2, atol=2e-4)


def test_eq2gal_matches_matrix_oracle(df_sky):
    df, _ = df_sky
    from vaex_tpu.astro import FRAME_MATRICES
    df2 = df.astro.eq2gal("ra", "dec", "l", "b")
    ra = np.radians(df.evaluate("ra"))
    dec = np.radians(df.evaluate("dec"))
    xyz = np.stack([np.cos(ra) * np.cos(dec), np.sin(ra) * np.cos(dec),
                    np.sin(dec)])
    m = np.asarray(FRAME_MATRICES["eq2gal"])
    out = m @ xyz
    l_oracle = np.degrees(np.arctan2(out[1], out[0]))
    b_oracle = np.degrees(np.pi / 2 - np.arccos(out[2] / np.linalg.norm(out, axis=0)))
    npt.assert_allclose(np.asarray(df2.evaluate("l")), l_oracle, atol=1e-9)
    npt.assert_allclose(np.asarray(df2.evaluate("b")), b_oracle, atol=1e-9)


def test_pm_eq2gal_preserves_magnitude_and_inverts(df_sky):
    """The proper-motion rotation is orthogonal: |pm| preserved, and
    pm_gal2eq undoes pm_eq2gal."""
    df, _ = df_sky
    df2 = df.astro.pm_eq2gal("ra", "dec", "pm_ra", "pm_dec", "pm_l", "pm_b")
    mag_in = np.hypot(df.evaluate("pm_ra"), df.evaluate("pm_dec"))
    mag_out = np.hypot(np.asarray(df2.evaluate("pm_l")),
                       np.asarray(df2.evaluate("pm_b")))
    npt.assert_allclose(mag_in, mag_out, rtol=1e-9)
    df3 = df2.astro.pm_gal2eq("ra", "dec", "pm_l", "pm_b", "pm_ra2", "pm_dec2",
                              name_prefix="__pm_back")
    npt.assert_allclose(np.asarray(df3.evaluate("pm_ra2")),
                        df.evaluate("pm_ra"), rtol=1e-8, atol=1e-10)
    npt.assert_allclose(np.asarray(df3.evaluate("pm_dec2")),
                        df.evaluate("pm_dec"), rtol=1e-8, atol=1e-10)


def test_parallax2distance_and_vperp(df_sky):
    df, _ = df_sky
    df2 = df.astro.parallax2distance()
    npt.assert_allclose(np.asarray(df2.evaluate("distance")),
                        1.0 / df.evaluate("parallax"), rtol=1e-12)
    df3 = df2.astro.proper_motion2vperpendicular(
        distance="distance", pm_long="pm_ra", pm_lat="pm_dec")
    from vaex_tpu.astro import K_PM
    npt.assert_allclose(np.asarray(df3.evaluate("vl")),
                        K_PM * df.evaluate("pm_ra") / df.evaluate("parallax"),
                        rtol=1e-9)


def test_cartesian_angular_momenta():
    rng = np.random.default_rng(3)
    n = 100
    cols = {k: rng.normal(size=n) for k in ("x", "y", "z", "vx", "vy", "vz")}
    df = vt.from_dict(cols).astro.cartesian_angular_momenta()
    r = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    v = np.stack([cols["vx"], cols["vy"], cols["vz"]], axis=1)
    L = np.cross(r, v)
    for i, name in enumerate(("Lx", "Ly", "Lz")):
        npt.assert_allclose(np.asarray(df.evaluate(name)), L[:, i], rtol=1e-9,
                            atol=1e-12)


def _write_gadget(path, pos, vel, fmt2=False):
    """Write a minimal format-1/2 snapshot (record-framed, per the format
    spec the reference reads, gadget.py:12-50)."""
    n = len(pos)
    npart = (n, 0, 0, 0, 0, 0)
    header = struct.pack("=6I6dddii6iiiddddii6ii60x",
                         *npart, *(0.0,) * 6, 1.0, 0.0, 0, 0, *npart, 0, 1,
                         100.0, 0.3, 0.7, 0.7, 0, 0, *(0,) * 6, 0)
    assert len(header) == 256

    def record(payload):
        marker = struct.pack("I", len(payload))
        return marker + payload + marker

    def descriptor(tag, payload_len):
        return record(struct.pack("4sI", tag, payload_len + 8))

    blocks = []
    if fmt2:
        blocks.append(descriptor(b"HEAD", 256))
    blocks.append(record(header))
    if fmt2:
        blocks.append(descriptor(b"POS ", 3 * 4 * n))
    blocks.append(record(np.asarray(pos, np.float32).tobytes()))
    if fmt2:
        blocks.append(descriptor(b"VEL ", 3 * 4 * n))
    blocks.append(record(np.asarray(vel, np.float32).tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(blocks))


@pytest.mark.parametrize("fmt2", [False, True])
def test_gadget_reader(tmp_path, fmt2):
    rng = np.random.default_rng(5)
    n = 1000
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    path = str(tmp_path / "snap")
    _write_gadget(path, pos, vel, fmt2=fmt2)

    from vaex_tpu.io.gadget import is_gadget
    assert is_gadget(path)
    df = vt.open(path)
    assert len(df) == n
    npt.assert_array_equal(df.evaluate("x"), pos[:, 0])
    npt.assert_array_equal(df.evaluate("z"), pos[:, 2])
    npt.assert_array_equal(df.evaluate("vy"), vel[:, 1])
    # engine pass over the mmap'd columns
    npt.assert_allclose(float(np.asarray(df.sum("x"))),
                        pos[:, 0].astype(np.float64).sum(), rtol=1e-6)


def test_tap_query_mocked(monkeypatch):
    """TAP smoke test with a mocked transport (reference astro/tap.py):
    the query POSTs ADQL to <url>/sync and parses the VOTable reply."""
    votable = """<?xml version="1.0"?>
<VOTABLE version="1.3" xmlns="http://www.ivoa.net/xml/VOTable/v1.3">
 <RESOURCE><TABLE>
  <FIELD name="ra" datatype="double"/>
  <FIELD name="dec" datatype="double"/>
  <DATA><TABLEDATA>
   <TR><TD>10.5</TD><TD>-3.25</TD></TR>
   <TR><TD>11.0</TD><TD>4.75</TD></TR>
  </TABLEDATA></DATA>
 </TABLE></RESOURCE>
</VOTABLE>"""
    captured = {}

    class FakeResponse:
        def read(self):
            return votable.encode()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["data"] = req.data.decode()
        return FakeResponse()

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    from vaex_tpu.io.votable import tap_query
    df = tap_query("https://tap.example.org/tap",
                   "SELECT ra, dec FROM stars")
    assert captured["url"].endswith("/sync")
    assert "SELECT+ra%2C+dec+FROM+stars" in captured["data"]
    assert len(df) == 2
    npt.assert_allclose(df.evaluate("ra"), [10.5, 11.0])
    npt.assert_allclose(df.evaluate("dec"), [-3.25, 4.75])
