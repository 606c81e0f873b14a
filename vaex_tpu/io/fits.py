"""FITS binary-table reader/writer (reference: packages/vaex-astro FITS
datasets).  Implemented in pure numpy (astropy is not available in this
image): FITS is 2880-byte blocks, 80-char ASCII header cards, big-endian
BINTABLE payloads — columns memory-map as byteswapped views, so opening
stays zero-cost like the reference's FitsBinTable (vaex-astro/.../fits.py).
"""

from __future__ import annotations

import numpy as np

from ..dataset import DatasetFile

BLOCK = 2880
CARD = 80

_TFORM_TO_DTYPE = {
    "L": ">i1", "B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
    "E": ">f4", "D": ">f8",
}


def _read_header(f):
    """Read one header unit; returns (cards dict, header bytes consumed)."""
    cards = {}
    nbytes = 0
    while True:
        block = f.read(BLOCK)
        if len(block) != BLOCK:
            raise EOFError("truncated FITS header")
        nbytes += BLOCK
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i:i + CARD].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if "=" in card[8:10]:
                value = card[10:].split("/")[0].strip()
                if value.startswith("'"):
                    value = value.strip()[1:-1].strip()
                cards[key] = value
        if done:
            return cards, nbytes


def _pad(n):
    return -(-n // BLOCK) * BLOCK


class FitsDataset(DatasetFile):
    """Memory-mapped FITS BINTABLE columns."""

    def __init__(self, path):
        super().__init__(path)
        self._load()

    def _load(self):
        offset = 0
        with open(self.path, "rb") as f:
            # primary HDU
            cards, hbytes = _read_header(f)
            offset += hbytes
            offset += _pad(_data_size(cards))
            # extensions: find the first BINTABLE
            while True:
                f.seek(offset)
                try:
                    cards, hbytes = _read_header(f)
                except EOFError:
                    raise IOError(f"{self.path}: no BINTABLE extension found")
                data_offset = offset + hbytes
                if cards.get("XTENSION", "").startswith("BINTABLE"):
                    break
                offset = data_offset + _pad(_data_size(cards))
        nrows = int(cards["NAXIS2"])
        rowbytes = int(cards["NAXIS1"])
        nfields = int(cards["TFIELDS"])
        mm = np.memmap(self.path, dtype=np.uint8, mode="r",
                       offset=data_offset, shape=(nrows, rowbytes)) if nrows else \
            np.zeros((0, rowbytes), np.uint8)
        col_offset = 0
        for i in range(1, nfields + 1):
            name = cards.get(f"TTYPE{i}", f"col{i}").strip()
            tform = cards.get(f"TFORM{i}", "").strip()
            repeat = int("".join(c for c in tform if c.isdigit()) or 1)
            code = tform[-1] if tform and tform[-1].isalpha() else tform
            if code == "A":  # fixed-width ASCII strings
                width = repeat
                raw = mm[:, col_offset:col_offset + width]
                import pyarrow as pa
                values = [bytes(raw[r]).decode("ascii", "replace").rstrip() for r in range(nrows)]
                self.add_column(name, pa.array(values))
                col_offset += width
                continue
            dtype = _TFORM_TO_DTYPE.get(code)
            if dtype is None:
                col_offset += repeat * 1
                continue
            itemsize = np.dtype(dtype).itemsize
            width = repeat * itemsize
            if repeat == 1:
                # lazy column: chunks decode (copy + byteswap) on demand, so
                # opening stays metadata-only and data streams out-of-core
                self.add_column(name, _FitsColumn(mm, col_offset, np.dtype(dtype), nrows))
            col_offset += width
        self._row_count = nrows


class _FitsColumn:
    """Row-strided big-endian column inside the record array."""

    def __init__(self, mm, offset, dtype_be, nrows):
        self.mm = mm
        self.offset = offset
        self.dtype_be = dtype_be
        self.native = dtype_be.newbyteorder("=")
        self.nrows = nrows

    def __len__(self):
        return self.nrows

    @property
    def dtype(self):
        return self.native

    def __getitem__(self, item):
        if isinstance(item, slice):
            i1, i2, step = item.indices(self.nrows)
            assert step == 1
        else:
            raise TypeError("FITS columns support slice access only")
        width = self.dtype_be.itemsize
        raw = self.mm[i1:i2, self.offset:self.offset + width]
        return np.ascontiguousarray(raw).view(self.dtype_be).reshape(-1).astype(self.native)


def _data_size(cards):
    naxis = int(cards.get("NAXIS", 0))
    if naxis == 0:
        return 0
    bitpix = abs(int(cards.get("BITPIX", 8)))
    size = bitpix // 8
    for i in range(1, naxis + 1):
        size *= int(cards.get(f"NAXIS{i}", 0))
    size *= int(cards.get("GCOUNT", 1))
    size += int(cards.get("PCOUNT", 0))
    return size


def open_fits(path):
    from .. import from_dataset
    return from_dataset(FitsDataset(path))


def export_fits(df, path):
    """Write a minimal FITS BINTABLE (primary HDU + one extension)."""
    names = [n for n in df.get_column_names()]
    from ..datatype import DataType
    cols = []
    for name in names:
        dt = DataType(df.data_type(name))
        values = df.evaluate(name, array_type="numpy")
        from .. import array_types
        data, mask = array_types.data_and_mask(values)
        if dt.is_string:
            svals = ["" if v is None else str(v) for v in data]
            width = max([len(s) for s in svals] + [1])
            arr = np.full((len(svals), width), 0x20, np.uint8)  # FITS space padding
            for r, s in enumerate(svals):
                b = s.encode("ascii", "replace")[:width]
                arr[r, :len(b)] = np.frombuffer(b, np.uint8)
            cols.append((name, f"{width}A", arr, width))
        else:
            npdt = dt.numpy
            code = {v: k for k, v in _TFORM_TO_DTYPE.items()}.get(">" + npdt.str[1:])
            if code is None:
                npdt = np.dtype("f8")
                code = "D"
                data = data.astype(npdt)
            be = data.astype(npdt.newbyteorder(">"))
            cols.append((name, f"1{code}", be.reshape(len(be), -1).view(np.uint8),
                         npdt.itemsize))
    nrows = len(df)
    rowbytes = sum(w for _, _, _, w in cols)

    def card(key, value, comment=""):
        if isinstance(value, str):
            v = f"'{value:<8}'"
        elif isinstance(value, bool):
            v = "T" if value else "F"
        else:
            v = str(value)
        return f"{key:<8}= {v:>20}{' / ' + comment if comment else '':<50}"[:80].ljust(80)

    def block(cards):
        text = "".join(cards) + "END".ljust(80)
        return text.ljust(_pad(len(text))).encode("ascii")

    with open(path, "wb") as f:
        f.write(block([card("SIMPLE", True), card("BITPIX", 8), card("NAXIS", 0),
                       card("EXTEND", True)]))
        header = [card("XTENSION", "BINTABLE"), card("BITPIX", 8), card("NAXIS", 2),
                  card("NAXIS1", rowbytes), card("NAXIS2", nrows), card("PCOUNT", 0),
                  card("GCOUNT", 1), card("TFIELDS", len(cols))]
        for i, (name, tform, _, _) in enumerate(cols, 1):
            header.append(card(f"TTYPE{i}", name))
            header.append(card(f"TFORM{i}", tform))
        f.write(block(header))
        table = np.zeros((nrows, rowbytes), np.uint8)
        off = 0
        for _, _, arr, w in cols:
            table[:, off:off + w] = arr.reshape(nrows, w)
            off += w
        payload = table.tobytes()
        f.write(payload)
        f.write(b"\0" * (_pad(len(payload)) - len(payload)))
    return path
