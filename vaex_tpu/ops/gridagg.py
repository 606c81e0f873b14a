"""Grid aggregation primitives: scatter values into a flat grid per tile.

Replaces ``vaex-core/src/superagg.cpp`` (AggCount/AggSum/AggMin/AggMax/
AggFirst/AggSumMoment) and the legacy ``vaexfast.cpp statisticNd``.  Where the
C++ walks rows in 1024-element blocks per thread, here each aggregator is a
single vectorized scatter over the whole device tile, compiled into the pass's
XLA program:

* rows that must not contribute (padding, filter, selection, null/NaN value)
  get their index set to ``G`` (one past the grid) and are dropped by the
  scatter's ``mode='drop'`` — no sentinel pollution of min/max;
* small grids can instead use the one-hot MXU strategy
  (:mod:`vaex_tpu.ops.pallas_gridagg`) where the scatter becomes a matmul.

NaN semantics match the reference (superagg.cpp:168-191, 367-388): NaN and
null values are skipped by every aggregator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _drop_invalid(idx, valid, G):
    return jnp.where(valid, idx, jnp.int32(G))


def value_valid(x, valid):
    """AND the row-valid mask with the value's own null/NaN validity."""
    if x.mask is not None:
        valid = valid & ~x.mask
    if jnp.issubdtype(x.data.dtype, jnp.floating):
        valid = valid & ~jnp.isnan(x.data)
    return valid


def grid_count(grid, idx, valid):
    """grid[G] int64 += 1 per valid row (AggCount, superagg.cpp:156)."""
    G = grid.shape[0]
    i = _drop_invalid(idx, valid, G)
    return grid.at[i].add(jnp.ones(idx.shape, grid.dtype), mode="drop")


def grid_sum(grid, idx, x, valid):
    """grid[G] (upcast dtype) += value (AggSum, superagg.cpp:350)."""
    G = grid.shape[0]
    valid = value_valid(x, valid)
    i = _drop_invalid(idx, valid, G)
    vals = jnp.where(valid, x.data, jnp.zeros((), x.data.dtype)).astype(grid.dtype)
    return grid.at[i].add(vals, mode="drop")


def grid_sum_moment(grid, idx, x, valid, moment):
    """grid[G] += value**moment (AggSumMoment, superagg.cpp:392) — for var/std."""
    G = grid.shape[0]
    valid = value_valid(x, valid)
    i = _drop_invalid(idx, valid, G)
    v = x.data.astype(grid.dtype)
    vals = jnp.where(valid, v ** moment, jnp.zeros((), grid.dtype))
    return grid.at[i].add(vals, mode="drop")


def grid_min(grid, idx, x, valid):
    """(AggMin, superagg.cpp:242) — empty cells keep the dtype-max fill."""
    G = grid.shape[0]
    valid = value_valid(x, valid)
    i = _drop_invalid(idx, valid, G)
    return grid.at[i].min(x.data.astype(grid.dtype), mode="drop")


def grid_max(grid, idx, x, valid):
    G = grid.shape[0]
    valid = value_valid(x, valid)
    i = _drop_invalid(idx, valid, G)
    return grid.at[i].max(x.data.astype(grid.dtype), mode="drop")


def grid_first(value_grid, order_grid, idx, x, order, valid, row_offset, row_ids):
    """Value at the minimal order expression (AggFirst, superagg.cpp:437-511).

    Two scatters: (1) scatter-min a lexicographic (order, global-row) key so
    ties resolve to the earliest row, (2) keep the value whose key won.
    ``order_grid`` is float64 and encodes the order; ``row_ids`` breaks ties.
    """
    G = value_grid.shape[0]
    valid = value_valid(x, valid)
    ovalid = valid
    if order.mask is not None:
        ovalid = ovalid & ~order.mask
    if jnp.issubdtype(order.data.dtype, jnp.floating):
        ovalid = ovalid & ~jnp.isnan(order.data)
    i = _drop_invalid(idx, ovalid, G)
    okeys = order.data.astype(order_grid.dtype)
    new_order_grid = order_grid.at[i].min(okeys, mode="drop")
    # rows whose order equals the winning order write their value; among ties
    # the scatter picks one row deterministically via min on row id.
    winner = okeys == new_order_grid[jnp.clip(i, 0, G - 1)]
    i2 = _drop_invalid(idx, ovalid & winner, G)
    new_value_grid = value_grid.at[i2].set(x.data.astype(value_grid.dtype), mode="drop")
    return new_value_grid, new_order_grid


def min_identity(dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        return np.inf
    return np.iinfo(dtype).max


def max_identity(dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        return -np.inf
    return np.iinfo(dtype).min
