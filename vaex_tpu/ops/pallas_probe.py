"""Pallas set-probe kernel: isin / ordinal lookup for small key sets.

``jnp.searchsorted`` on TPU is a gather-bound binary search (~8M rows/s for a
1000-key set measured); for sets that fit VMEM a brute compare against all
keys is a pure VPU streaming op: block of rows x key row -> [B, M] equality,
``any``/``argmax`` reductions, nothing leaves VMEM.  O(N*M) beats
O(N log M * gather-latency) by ~2 orders for M <= ~4096.

64-bit values are compared as (hi32, lo32) pairs (Mosaic has no native i64);
floats bitcast to int64 after normalizing -0.0 (keys never contain NaN — the
SortedSet stores NaN in its own slot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

BLOCK = 2048
PROBE_MAX_KEYS = 2048
PROBE_MIN_KEYS = 64


def _round_up(x, m):
    return -(-x // m) * m


def _probe_kernel(klo_ref, khi_ref, xlo_ref, xhi_ref, out_ref, *, m_real):
    xlo = xlo_ref[:]
    xhi = xhi_ref[:]
    klo = klo_ref[:]
    khi = khi_ref[:]
    eq = (xlo[:, None] == klo[None, :]) & (xhi[:, None] == khi[None, :])  # [B, M]
    # first matching slot via a min-reduce over an f32 iota (Mosaic argmax is
    # f32-only); padding slots duplicate the last real key so the first
    # (real) slot always wins
    m_pad = klo.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1).astype(jnp.float32)
    ord_f = jnp.min(jnp.where(eq, iota, jnp.float32(m_pad)), axis=1)
    found = ord_f < m_pad
    ordinal = jnp.minimum(ord_f.astype(jnp.int32), m_real - 1)
    out_ref[:] = jnp.where(found, ordinal, jnp.int32(-1))


def _as_pair(x):
    """Any numeric device array -> (lo32, hi32) exact-equality encoding.

    64-bit values bitcast straight into int32 word pairs (bitcasting to a
    NARROWER dtype appends a trailing axis, and unlike 64-bit bitcasts it
    survives XLA's x64 rewriting on TPU)."""
    if x.dtype == jnp.float64:
        x = jnp.where(x == 0.0, 0.0, x)  # normalize -0.0
        words = jax.lax.bitcast_convert_type(x, jnp.int32)  # [..., 2]
        return words[..., 0], words[..., 1]
    if x.dtype == jnp.float32:
        x = jnp.where(x == 0.0, jnp.float32(0.0), x)
        lo = jax.lax.bitcast_convert_type(x, jnp.int32)
        return lo, jnp.zeros_like(lo)
    if x.dtype in (jnp.int64, jnp.uint64):
        words = jax.lax.bitcast_convert_type(x.astype(jnp.int64), jnp.int32)
        return words[..., 0], words[..., 1]
    lo = x.astype(jnp.int32)
    return lo, jnp.zeros_like(lo)


def probe_ordinals(keys, x, block=BLOCK):
    """keys [M] (sorted, no NaN), x [N] -> int32 ordinals (-1 = not found)."""
    M = keys.shape[0]
    N = x.shape[0]
    m_pad = max(_round_up(M, 128), 128)
    if m_pad > M:
        keys = jnp.concatenate([keys, jnp.broadcast_to(keys[-1], (m_pad - M,))])
    n_pad = _round_up(max(N, block), block) - N
    if n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad,), x.dtype)])
    klo, khi = _as_pair(keys)
    xlo, xhi = _as_pair(x)
    nb = x.shape[0] // block
    kernel = functools.partial(_probe_kernel, m_real=M)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((m_pad,), lambda i: (0,)),
                pl.BlockSpec((m_pad,), lambda i: (0,)),
                pl.BlockSpec((block,), lambda i: (i,)),
                pl.BlockSpec((block,), lambda i: (i,)),
            ],
            out_specs=pl.BlockSpec((block,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0],), jnp.int32),
        )(klo, khi, xlo, xhi)
    return out[:N]


def is_available(n_keys):
    if not HAVE_PALLAS or n_keys < PROBE_MIN_KEYS or n_keys > PROBE_MAX_KEYS:
        return False  # tiny sets: searchsorted's few gather rounds win
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
