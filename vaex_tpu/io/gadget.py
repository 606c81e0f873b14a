"""Gadget N-body snapshot reader (reference:
packages/vaex-astro/vaex/astro/gadget.py:1-90 MemoryMappedGadget).

Gadget snapshots are Fortran-style record files: each block is framed by
4-byte record-length markers; SnapFormat 2 additionally prefixes every block
with a 16-byte descriptor record (4-byte marker, 4-char tag + length, 4-byte
marker).  The 256-byte header holds particle counts; positions and
velocities follow as float32 triplets.  Columns are strided ``np.memmap``
views — opening touches no particle data (the same zero-cost-open contract
as hdf5)."""

from __future__ import annotations

import struct

import numpy as np

from ..dataset import DatasetFile

_HEADER = "=6I6dddii6iiiddddii6ii60x"  # 256 bytes
_HEADER_SIZE = 256


def read_header(path):
    """(n_particles, pos_offset, vel_offset, header dict) for format 1/2."""
    with open(path, "rb") as f:
        first = struct.unpack("I", f.read(4))[0]
        fmt2 = first == 8
        # header record: [4][256][4], after a 16-byte descriptor in format 2
        base = 16 if fmt2 else 0
        f.seek(base + 4)
        raw = struct.unpack(_HEADER, f.read(_HEADER_SIZE))
    header = {
        "Npart": raw[0:6], "Massarr": raw[6:12], "Time": raw[12],
        "Redshift": raw[13], "FlagSfr": raw[14], "FlagFeedback": raw[15],
        "Nall": raw[16:22], "FlagCooling": raw[22], "NumFiles": raw[23],
        "BoxSize": raw[24], "Omega0": raw[25], "OmegaLambda": raw[26],
        "HubbleParam": raw[27],
    }
    n = int(sum(header["Npart"]))
    desc = 16 if fmt2 else 0
    header_block = desc + 4 + _HEADER_SIZE + 4
    pos_offset = header_block + desc + 4
    vel_offset = pos_offset + 3 * 4 * n + 4 + desc + 4
    return n, pos_offset, vel_offset, header


def is_gadget(path):
    """Sniff the record structure (reference gadget.py can_open)."""
    try:
        with open(path, "rb") as f:
            words = struct.unpack("4I", f.read(16))
    except (struct.error, OSError):
        return False
    if words[0] == 8 and (words[3] == 8 or
                          (words[2] == 8 and words[3] == _HEADER_SIZE)):
        return True  # SnapFormat 2 descriptor record ([8][tag][len][8])
    if words[0] == _HEADER_SIZE:
        try:
            with open(path, "rb") as f:
                f.seek(4 + _HEADER_SIZE)
                return struct.unpack("I", f.read(4))[0] == _HEADER_SIZE
        except (struct.error, OSError):
            return False
    return False


class GadgetDataset(DatasetFile):
    """x/y/z + vx/vy/vz as strided float32 memmap views."""

    def __init__(self, path):
        super().__init__(path)
        n, pos_offset, vel_offset, header = read_header(path)
        self.gadget_header = header
        columns = {}
        for base, names in ((pos_offset, ("x", "y", "z")),
                            (vel_offset, ("vx", "vy", "vz"))):
            for i, name in enumerate(names):
                mm = np.memmap(path, dtype=np.float32, mode="r",
                               offset=base, shape=(3 * n,))
                columns[name] = mm[i::3]
        for name, col in columns.items():
            self.add_column(name, col)


def open_gadget(path):
    from .. import from_dataset
    return from_dataset(GadgetDataset(path))
