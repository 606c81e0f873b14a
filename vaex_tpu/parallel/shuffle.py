"""Distributed shuffle aggregation: all-to-all over the mesh.

The north-star distributed design (SURVEY §2.3, BASELINE): tables are row-
sharded over the device mesh; for HIGH-cardinality groupby the replicated
grid + psum merge becomes wasteful (every device holds all G cells), so rows
are exchanged with an ``all_to_all`` over ICI such that each device owns a
contiguous range of key ordinals, aggregates only its G/D sub-grid locally
(sort + segment reduce), and the result comes back sharded — no device ever
materializes the full grid.

Capacity contract: ``all_to_all`` needs equal splits, so each device packs
its rows into D buckets of ``cap`` rows; with hash-balanced ordinals
cap = slack * N_local / D suffices, and overflow is detected and reported
(rows dropped count returned) so callers can retry with more slack — the
skew-aware repartition of the reference plan (SURVEY §7.7).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _shard_map():
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map
    return shard_map


def shuffle_additive_grids(mesh, codes, cols, G, slack=4):
    """codes [N] int32 (rows with code >= G are dropped), cols [N, A] f64,
    rows sharded over the mesh's first axis -> ([G, A] f64, dropped_rows).

    Each device ends up owning ordinal range [d*gper, (d+1)*gper).
    """
    axis = mesh.axis_names[0]
    D = mesh.shape[axis]
    N = codes.shape[0]
    n_local = -(-N // D)
    gper = -(-G // D)
    cap = max(64, (slack * n_local) // D)

    def local(codes_l, cols_l):
        A = cols_l.shape[1]
        nl = codes_l.shape[0]
        owner = jnp.clip(codes_l // gper, 0, D - 1)
        valid = codes_l < G
        owner = jnp.where(valid, owner, D)  # D = trash bucket (not sent)

        # pack rows into [D, cap] send buffers: position within bucket via
        # a stable sort by owner + rank-within-owner (codes/cols carried
        # through the sort network — no row-sized gathers)
        sort_ops = (owner, codes_l.astype(jnp.int32)) + tuple(cols_l[:, a] for a in range(A))
        sorted_out = jax.lax.sort(sort_ops, num_keys=1, is_stable=True)
        sorted_owner = sorted_out[0]
        sorted_codes = sorted_out[1]
        sorted_cols = jnp.stack(sorted_out[2:], axis=1)
        # rank within each owner bucket
        idx = jax.lax.broadcasted_iota(jnp.int32, (nl, 1), 0).squeeze(-1)
        start_of_owner = jnp.searchsorted(sorted_owner, jnp.arange(D + 1, dtype=sorted_owner.dtype))
        rank = idx - start_of_owner[jnp.clip(sorted_owner, 0, D)]
        overflow = jnp.sum((rank >= cap) & (sorted_owner < D))

        send_codes = jnp.full((D, cap), G, jnp.int32)
        send_cols = jnp.zeros((D, cap, A), cols_l.dtype)
        dest = jnp.where((sorted_owner < D) & (rank < cap),
                         jnp.clip(sorted_owner, 0, D - 1) * cap + rank,
                         D * cap)
        send_codes = send_codes.reshape(-1).at[dest].set(sorted_codes.astype(jnp.int32),
                                                         mode="drop").reshape(D, cap)
        send_cols = send_cols.reshape(D * cap, A).at[dest].set(sorted_cols,
                                                               mode="drop").reshape(D, cap, A)

        # the exchange: ICI all-to-all over the mesh axis
        recv_codes = jax.lax.all_to_all(send_codes, axis, 0, 0, tiled=False)
        recv_cols = jax.lax.all_to_all(send_cols, axis, 0, 0, tiled=False)
        my = jax.lax.axis_index(axis)
        local_codes = recv_codes.reshape(-1) - my * gper  # [D*cap]
        local_cols = recv_cols.reshape(-1, A)
        # rows outside my range (padding G-markers) fall out
        local_codes = jnp.where((local_codes >= 0) & (local_codes < gper),
                                local_codes, gper).astype(jnp.int32)
        from ..ops import gridagg
        sidx, scols = gridagg.sort_carry(local_codes, local_cols)
        grid = gridagg.sorted_additive(sidx, scols, gper)  # [gper, A]
        return grid, jax.lax.psum(overflow, axis)

    shard = _shard_map()
    fn = shard(local, mesh=mesh, in_specs=(P(axis), P(axis)),
               out_specs=(P(axis), P()), check_vma=False)
    grids, dropped = jax.jit(fn)(codes, cols)
    return grids[:G], dropped


def shuffle_groupby(df, key_ordinal_expression, value_columns, G, mesh, slack=4,
                    max_retries=3):
    """High-level: evaluate ordinals + value columns, shuffle-aggregate.

    Returns {column: [G] numpy} of sums (count rides as a ones column).
    Skewed key distributions that overflow the per-bucket capacity retry
    with doubled slack (same policy as shuffle_join, parallel/join.py)."""
    codes = jnp.asarray(np.asarray(df.evaluate(key_ordinal_expression, array_type="numpy"),
                                   dtype=np.int32))
    N = codes.shape[0]
    cols = [jnp.ones(N, jnp.float64)]
    names = ["count"]
    for name in value_columns:
        values = np.asarray(df.evaluate(str(name), array_type="numpy"), dtype=np.float64)
        cols.append(jnp.asarray(values))
        names.append(str(name))
    D = mesh.shape[mesh.axis_names[0]]
    pad = (-N) % D
    if pad:
        codes = jnp.concatenate([codes, jnp.full(pad, G, jnp.int32)])
        cols = [jnp.concatenate([c, jnp.zeros(pad, c.dtype)]) for c in cols]
    stacked = jnp.stack(cols, axis=1)
    for attempt in range(max_retries + 1):
        grids, dropped = shuffle_additive_grids(mesh, codes, stacked, G, slack=slack)
        if not int(dropped):
            out = np.asarray(grids)
            return {name: out[:, i] for i, name in enumerate(names)}
        slack *= 2  # skew: double per-bucket capacity and re-shuffle
    raise RuntimeError(f"shuffle overflow after {max_retries} slack doublings: "
                       f"{int(dropped)} rows still dropped (pathological key skew)")
