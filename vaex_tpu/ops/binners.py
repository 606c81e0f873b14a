"""Bin-index computation with the reference's +3-edge layout.

Replaces ``vaex-core/src/superagg_binners.cpp`` (BinnerScalar / BinnerOrdinal).
Layout contract (superagg_binners.cpp:26-33, 114-121; pinned by
tests/internal/superagg_tests.py:23-33): every grid dimension has shape
``bins + 3`` — index 0 = NaN/missing, index 1 = underflow, indices
``[2, bins+2)`` = data, index ``bins+2`` = overflow.  Scalar binning is
``index = floor((v - vmin) / (vmax - vmin) * bins) + 2`` with ``v == vmax``
overflowing.

These are *traced* functions: they run inside the single compiled XLA program
of a pass, fused with expression evaluation and the aggregation scatter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .nullable import NA


class BinnerScalar:
    """Descriptor + traced to_bins for float/int range binning."""

    def __init__(self, expression, vmin, vmax, bins):
        self.expression = str(expression)
        self.vmin = vmin
        self.vmax = vmax
        self.bins = int(bins)

    @property
    def shape(self):
        return self.bins + 3

    def to_bins(self, x: NA):
        data = x.data
        fdata = data.astype(jnp.float64) if data.dtype != jnp.float32 else data
        vmin = jnp.asarray(self.vmin, fdata.dtype)
        vmax = jnp.asarray(self.vmax, fdata.dtype)
        span = vmax - vmin
        # guard span==0: everything lands on underflow/overflow edges like the C++
        scaled = jnp.where(span != 0, (fdata - vmin) / span, jnp.zeros_like(fdata))
        idx = jnp.floor(scaled * self.bins).astype(jnp.int32) + 2
        idx = jnp.where(data.astype(fdata.dtype) < vmin, 1, idx)
        idx = jnp.where(data.astype(fdata.dtype) >= vmax, self.bins + 2, idx)
        if jnp.issubdtype(data.dtype, jnp.floating):
            idx = jnp.where(jnp.isnan(data), 0, idx)
        if x.mask is not None:
            idx = jnp.where(x.mask, 0, idx)
        return idx

    def __repr__(self):
        return f"BinnerScalar({self.expression!r}, {self.vmin}, {self.vmax}, {self.bins})"

    def fingerprint(self):
        from ..utils import fingerprint
        return fingerprint("binner-scalar", self.expression, float(self.vmin), float(self.vmax), self.bins)

    def __eq__(self, other):
        return (isinstance(other, BinnerScalar) and self.expression == other.expression
                and self.vmin == other.vmin and self.vmax == other.vmax and self.bins == other.bins)

    def __hash__(self):
        return hash(self.fingerprint())


class BinnerOrdinal:
    """Integer/categorical binner: ``index = value - min_value + 2``
    (superagg_binners.cpp:95-184)."""

    def __init__(self, expression, min_value, count, raw_expression=None,
                 dense_rank=False):
        self.expression = str(expression)
        self.min_value = int(min_value)
        self.count = int(count)
        # dense_rank: the data bins are exactly the ranks of the observed
        # values of ``raw_expression`` (set-based groupers) — enables the
        # dense-rank sort strategy (no ordinal probe, no boundary search)
        self.raw_expression = str(raw_expression) if raw_expression else None
        self.dense_rank = bool(dense_rank)

    @property
    def bins(self):
        return self.count

    @property
    def shape(self):
        return self.count + 3

    def to_bins(self, x: NA):
        data = x.data
        rel = data.astype(jnp.int32) - self.min_value
        idx = rel + 2
        idx = jnp.where(rel < 0, 1, idx)
        idx = jnp.where(rel >= self.count, self.count + 2, idx)
        if jnp.issubdtype(data.dtype, jnp.floating):
            idx = jnp.where(jnp.isnan(data), 0, idx)
        if x.mask is not None:
            idx = jnp.where(x.mask, 0, idx)
        return idx

    def __repr__(self):
        return f"BinnerOrdinal({self.expression!r}, {self.min_value}, {self.count})"

    def fingerprint(self):
        from ..utils import fingerprint
        return fingerprint("binner-ordinal", self.expression, self.min_value, self.count)

    def __eq__(self, other):
        return (isinstance(other, BinnerOrdinal) and self.expression == other.expression
                and self.min_value == other.min_value and self.count == other.count)

    def __hash__(self):
        return hash(self.fingerprint())


def fuse_bins(binners, bin_indices):
    """Fuse per-dimension bin indices into flat row-major grid indices
    (replaces agg.hpp:106-136 Grid::bin block loop — here it is one fused
    vector expression XLA folds into the scatter)."""
    if not binners:
        return jnp.zeros((), jnp.int32)
    flat = bin_indices[0].astype(jnp.int32)
    for binner, idx in zip(binners[1:], bin_indices[1:]):
        flat = flat * binner.shape + idx.astype(jnp.int32)
    return flat


def grid_shape(binners):
    return tuple(b.shape for b in binners) if binners else (1,)


def grid_size(binners):
    return int(np.prod(grid_shape(binners)))
