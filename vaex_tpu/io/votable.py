"""VOTable read/write + a thin TAP client (reference: packages/vaex-astro
votable.py/tap.py, which lean on astropy; this image has no astropy, so the
TABLEDATA serialization is parsed/written directly with the stdlib XML
tooling — covering the interchange cases the reference handles).
"""

from __future__ import annotations

import numpy as np

# VOTable datatype -> numpy (VOTable 1.4 spec table 6)
_VOT_TO_NP = {
    "boolean": np.dtype("bool"),
    "unsignedByte": np.dtype("u1"),
    "short": np.dtype("i2"),
    "int": np.dtype("i4"),
    "long": np.dtype("i8"),
    "float": np.dtype("f4"),
    "double": np.dtype("f8"),
    "char": np.dtype(object),
    "unicodeChar": np.dtype(object),
}

_NP_TO_VOT = {
    "b": "boolean", "u1": "unsignedByte", "i2": "short", "i4": "int",
    "i8": "long", "f4": "float", "f8": "double",
}


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def _iter_local(el, name):
    for child in el.iter():
        if _strip(child.tag) == name:
            yield child


def parse_votable(source):
    """Parse a VOTable (path/file-like/bytes) -> {name: numpy array}.

    Supports the TABLEDATA serialization; null values (VOTable empty cells /
    declared null attribute) become masked entries."""
    import io
    import xml.etree.ElementTree as ET
    if isinstance(source, (bytes, bytearray)):
        source = io.BytesIO(source)
    tree = ET.parse(source)
    root = tree.getroot()
    table = next(_iter_local(root, "TABLE"), None)
    if table is None:
        raise ValueError("no TABLE element in VOTable")
    fields = []
    for f in _iter_local(table, "FIELD"):
        dt = _VOT_TO_NP.get(f.get("datatype"), np.dtype("f8"))
        null = None
        values = next(_iter_local(f, "VALUES"), None)
        if values is not None:
            null = values.get("null")
        fields.append((f.get("name") or f.get("ID"), dt, null))
    rows = []
    td = next(_iter_local(table, "TABLEDATA"), None)
    if td is None:
        raise ValueError("only the TABLEDATA serialization is supported "
                         "(BINARY/FITS VOTables: convert upstream)")
    for tr in _iter_local(td, "TR"):
        rows.append([c.text for c in _iter_local(tr, "TD")])
    columns = {}
    n = len(rows)
    for j, (name, dt, null) in enumerate(fields):
        raw = [rows[i][j] if j < len(rows[i]) else None for i in range(n)]
        if dt == object:
            data = np.asarray([("" if v is None else v) for v in raw], dtype=object)
            mask = np.asarray([v is None for v in raw])
        else:
            mask = np.asarray([v is None or v == "" or (null is not None and v == null)
                               for v in raw])
            fill = "0" if dt.kind != "b" else "false"
            vals = [(fill if m else v) for v, m in zip(raw, mask)]
            if dt.kind == "b":
                data = np.asarray([v.strip().lower() in ("true", "t", "1") for v in vals])
            else:
                data = np.asarray(vals, dtype="f8").astype(dt) if dt.kind in "iu" \
                    else np.asarray(vals, dtype=dt)
        columns[name] = np.ma.MaskedArray(data, mask) if mask.any() else data
    return columns


def open_votable(path):
    from .. import from_arrays
    return from_arrays(**parse_votable(path))


def export_votable(df, path):
    """Write a TABLEDATA VOTable (reference: vaex-astro export path)."""
    import xml.sax.saxutils as sx
    from .. import array_types
    from ..datatype import DataType
    names = df.get_column_names()
    lines = ['<?xml version="1.0" encoding="utf-8"?>',
             '<VOTABLE version="1.4" xmlns="http://www.ivoa.net/xml/VOTable/v1.3">',
             "<RESOURCE><TABLE>"]
    dtypes = {}
    for name in names:
        dt = DataType(df.data_type(name))
        if dt.is_string:
            vot = "char"
            extra = ' arraysize="*"'
        else:
            vot = _NP_TO_VOT.get(dt.numpy.str.lstrip("<>=|"), "double")
            extra = ""
        dtypes[name] = vot
        lines.append(f'<FIELD name={sx.quoteattr(name)} datatype="{vot}"{extra}/>')
    lines.append("<DATA><TABLEDATA>")
    for i1, i2, _ in df.evaluate_iterator(names[0], chunk_size=65536) if names else []:
        chunks = {name: df.evaluate(name, i1, i2, array_type="numpy") for name in names}
        datas = {}
        masks = {}
        for name in names:
            data, mask = array_types.data_and_mask(chunks[name])
            datas[name], masks[name] = data, mask
        for i in range(i2 - i1):
            cells = []
            for name in names:
                m = masks[name]
                if m is not None and m[i]:
                    cells.append("<TD/>")
                else:
                    v = datas[name][i]
                    if isinstance(v, (bytes, np.bytes_)):
                        v = v.decode()
                    cells.append(f"<TD>{sx.escape(str(v))}</TD>")
            lines.append("<TR>" + "".join(cells) + "</TR>")
    lines += ["</TABLEDATA></DATA>", "</TABLE></RESOURCE>", "</VOTABLE>"]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def tap_query(url, adql, timeout=60):
    """Synchronous TAP query: POST ADQL to <url>/sync, parse the VOTable
    response (reference: vaex-astro tap.py via astropy/pyvo)."""
    import urllib.parse
    import urllib.request
    from .. import from_arrays
    data = urllib.parse.urlencode({
        "REQUEST": "doQuery", "LANG": "ADQL", "FORMAT": "votable",
        "QUERY": adql,
    }).encode()
    req = urllib.request.Request(url.rstrip("/") + "/sync", data=data)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
    return from_arrays(**parse_votable(body))
