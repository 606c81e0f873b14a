"""Pallas TPU kernel for small-grid aggregation — the speed-of-light path.

Replaces the XLA scan-of-matmuls in :func:`vaex_tpu.ops.gridagg.fused_additive`
on TPU.  Why a kernel: the scan materializes each block's one-hot matrix in
HBM (block x G x 4 bytes, re-read by the matmul) and pays scan overhead per
block; here the one-hot never leaves VMEM and the G x A accumulator stays
resident across the whole row stream, so HBM traffic is exactly one read of
(idx, cols) — the reference C++'s "one pass, grid in cache" property
(agg.hpp:106-136) mapped onto the MXU.

f64 fidelity on an f32-class MXU: callers split values hi/lo into two f32
columns; in-kernel accumulation is *compensated* (two-sum) so thousands of
block partials add with ~f64 accuracy; the final hi+lo+err combine happens
in f64 outside the kernel.

Layout: idx [N] int32 (rows to drop carry idx >= G and land in padding bins
that are sliced away), cols [N, 2A] f32 (hi columns then lo columns).  Grid =
N/BLOCK programs, each accumulating its block into the single [G_pad, 2A]
output block (constant out index map => accumulation across the grid, TPU
grid steps run sequentially per core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

BLOCK = 8192


def _round_up(x, m):
    return -(-x // m) * m


def _agg_kernel(idx_ref, cols_ref, acc_ref, err_ref, *, g_pad):
    """cols arrives transposed [A2, B] (lane dim = rows, 128-aligned);
    output [A2, G_pad] accumulates across sequential grid steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        err_ref[:] = jnp.zeros_like(err_ref)

    idx = idx_ref[:]           # [B] int32
    cols = cols_ref[:]         # [A2, B] f32
    bins = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], g_pad), 1)
    onehot = (idx[:, None] == bins).astype(jnp.float32)  # [B, G_pad], VMEM only
    partial = jnp.dot(cols, onehot, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [A2, G_pad]
    acc = acc_ref[:]
    new = acc + partial
    err_ref[:] += (acc - new) + partial
    acc_ref[:] = new


def fused_additive_pallas(idx, cols, G, block=BLOCK):
    """idx [N] int32, cols [N, A] float64 -> [G, A] float64.

    Rows with idx >= G are dropped (they land in padding bins).
    """
    N, A = cols.shape
    g_pad = max(_round_up(G + 1, 128), 128)  # +1 keeps an explicit drop bin
    n_pad = _round_up(max(N, block), block) - N
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), g_pad - 1, jnp.int32)])
    idx = jnp.where(idx >= G, g_pad - 1, idx).astype(jnp.int32)
    hi = cols.astype(jnp.float32)
    lo = (cols - hi.astype(jnp.float64)).astype(jnp.float32)
    cols32 = jnp.concatenate([hi, lo], axis=1)  # [N, 2A]
    if n_pad:
        cols32 = jnp.concatenate([cols32, jnp.zeros((n_pad, 2 * A), jnp.float32)])
    cols32 = cols32.T  # [2A, N]: rows on the 128-lane axis
    nb = idx.shape[0] // block

    kernel = functools.partial(_agg_kernel, g_pad=g_pad)
    # Mosaic requires i32 block-index arithmetic; under global x64 the index
    # maps would emit i64 literals, so trace the kernel with x64 off (all
    # kernel dtypes are explicitly 32-bit anyway).
    with jax.enable_x64(False):
        acc, err = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((block,), lambda i: (i,)),
                pl.BlockSpec((2 * A, block), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((2 * A, g_pad), lambda i: (0, 0)),
                pl.BlockSpec((2 * A, g_pad), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * A, g_pad), jnp.float32),
                jax.ShapeDtypeStruct((2 * A, g_pad), jnp.float32),
            ],
        )(idx, cols32)
    total = acc.astype(jnp.float64) + err.astype(jnp.float64)  # [2A, g_pad]
    out = total[:A, :] + total[A:, :]  # hi + lo
    return out[:, :G].T


# ---------------------------------------------------------------------------
# Two-level one-hot kernel for mid-cardinality grids (2048 < G <= ~131072).
#
# The flat one-hot no longer fits VMEM, but the grid factorizes: with
# idx = hi * 128 + lo, out[h, l] = sum_r [hi_r == h] * ([lo_r == l] * v_r)
# is ONE matmul per value column: onehot_hi.T [H, B] @ (onehot_lo * v) [B, 128].
# Both one-hots live only in VMEM; the [H, 128] accumulator stays resident.
# This replaces the device argsort path (TPU sort: ~600ms for 1e7 rows) for
# additive aggregates.  Precision: hi columns use HIGHEST (bf16x3) matmuls,
# lo-correction columns DEFAULT (their magnitudes are ~1e-8 of the values).

LO = 128  # lane-dimension digit


def _agg2_kernel(idx_ref, cols_ref, acc_ref, err_ref, *, h_pad, n_hi_cols):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        err_ref[:] = jnp.zeros_like(err_ref)

    idx = idx_ref[:]                    # [B] int32 (drop rows carry h_pad*LO)
    hi = idx // LO
    lo = idx - hi * LO
    B = idx.shape[0]
    bins_lo = jax.lax.broadcasted_iota(jnp.int32, (B, LO), 1)
    onehot_lo = (lo[:, None] == bins_lo).astype(jnp.float32)       # [B, 128]
    bins_hi = jax.lax.broadcasted_iota(jnp.int32, (B, h_pad), 1)
    onehot_hi = (hi[:, None] == bins_hi).astype(jnp.float32)       # [B, H]
    a2 = cols_ref.shape[0]
    contract = (((0,), (0,)), ((), ()))  # contract over rows, no transpose copy
    default = jax.lax.Precision.DEFAULT

    def dot(m, precision=default):
        return jax.lax.dot_general(onehot_hi, m, contract,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)             # [H, 128]

    for a in range(a2):
        v = cols_ref[a, :]                                          # [B]
        m = onehot_lo * v[:, None]                                  # [B, 128]
        if a < n_hi_cols:
            # manual bf16x3 limb decomposition of the VALUE operand only:
            # the one-hot operand is exact in bf16, so HIGHEST (which would
            # limb-split BOTH operands and triple the big one-hot in VMEM)
            # is wasted on it — 3 DEFAULT dots give the same f32 fidelity
            m1 = m.astype(jnp.bfloat16).astype(jnp.float32)
            r = m - m1
            m2 = r.astype(jnp.bfloat16).astype(jnp.float32)
            m3 = r - m2
            partial = dot(m1) + dot(m2) + dot(m3)
        else:
            partial = dot(m)
        acc = acc_ref[a, :, :]
        new = acc + partial
        err_ref[a, :, :] += (acc - new) + partial
        acc_ref[a, :, :] = new


def fused_additive_two_level(idx, cols, G, block=2048):
    """idx [N] int32, cols [N, A] float64 -> [G, A] float64, for G up to
    h_max * 128 (one-hot-hi block must fit VMEM: block x H x 4 bytes)."""
    N, A = cols.shape
    H = -(-G // LO)
    h_pad = max(_round_up(H, 8), 8)
    # keep the hi one-hot small enough that the whole working set (one-hots,
    # double-buffered inputs, acc+err) stays inside the 16MB VMEM
    while block * h_pad * 4 > (3 << 20) and block > 1024:
        block //= 2  # 1-D i32 blocks must stay multiples of 1024 (XLA layout)
    n_pad = _round_up(max(N, block), block) - N
    drop = h_pad * LO  # an index whose hi digit lands outside [0, H)
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), drop, jnp.int32)])
    idx = jnp.where(idx >= G, drop, idx).astype(jnp.int32)
    hi_cols = cols.astype(jnp.float32)
    lo_cols = (cols - hi_cols.astype(jnp.float64)).astype(jnp.float32)
    cols32 = jnp.concatenate([hi_cols, lo_cols], axis=1)
    if n_pad:
        cols32 = jnp.concatenate([cols32, jnp.zeros((n_pad, 2 * A), jnp.float32)])
    cols32 = cols32.T  # [2A, N]
    nb = idx.shape[0] // block

    # +1 hi bucket absorbs dropped rows (hi digit == h_pad lands there)
    hp = _round_up(h_pad + 1, 8)
    kernel = functools.partial(_agg2_kernel, h_pad=hp, n_hi_cols=A)
    with jax.enable_x64(False):
        acc, err = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((block,), lambda i: (i,)),
                pl.BlockSpec((2 * A, block), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((2 * A, hp, LO), lambda i: (0, 0, 0)),
                pl.BlockSpec((2 * A, hp, LO), lambda i: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2 * A, hp, LO), jnp.float32),
                jax.ShapeDtypeStruct((2 * A, hp, LO), jnp.float32),
            ],
        )(idx, cols32)
    total = acc.astype(jnp.float64) + err.astype(jnp.float64)      # [2A, hp, LO]
    flat = total.reshape(2 * A, hp * LO)
    out = flat[:A, :] + flat[A:, :]
    return out[:, :G].T


TWO_LEVEL_MAX_G = 128 * 1024


# ---------------------------------------------------------------------------
# Two-level channel-limb kernel: same exact-limb scheme as
# fused_additive_channels but with the grid factored as idx = hi*128 + lo:
#
#   out[h, (c, l)] = sum_r oh_hi[r, h] * (oh_lo[r, l] * limb_c[r])
#
# ONE dot per block: lhs = transposed hi one-hot [H, B] (iota on sublanes,
# idx stays lane-major), rhs = [(C*128), B] built as lo-one-hot rows scaled
# by each limb channel — both operands in their natural layouts, contraction
# over the lane dim.  MXU work is H*128*C per row instead of the flat
# kernel's G_pad*128, so this wins for G beyond a few hundred.

TWO_LEVEL_CHANNEL_MIN_G = 512


def _channels2_kernel(idx_ref, *rest, n_static, n_float, h_pad, g_pad,
                      ones_flags=()):
    refs = rest[:-4]
    acc_s_ref, err_s_ref, acc_f_ref, err_f_ref = rest[-4:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_s_ref[:] = jnp.zeros_like(acc_s_ref)
        err_s_ref[:] = jnp.zeros_like(err_s_ref)
        acc_f_ref[:] = jnp.zeros_like(acc_f_ref)
        err_f_ref[:] = jnp.zeros_like(err_f_ref)

    idx = idx_ref[:]
    B = idx.shape[0]
    hi_digit = idx // LO                                        # drop rows: h_pad-1
    lo_digit = idx - hi_digit * LO
    bins_h = jax.lax.broadcasted_iota(jnp.int32, (h_pad, B), 0)
    oh_hiT = (bins_h == hi_digit[None, :]).astype(jnp.bfloat16)  # [h_pad, B]
    bins_l = jax.lax.broadcasted_iota(jnp.int32, (LO, B), 0)
    oh_loT = (bins_l == lo_digit[None, :]).astype(jnp.float32)   # [LO, B]

    ones_flags = ones_flags or (False,) * n_static
    implicit = None
    if any(ones_flags):
        implicit = (idx < (h_pad - 1) * LO).astype(jnp.float32)

    static_refs = list(refs[:n_static - sum(ones_flags)])
    float_refs = refs[n_static - sum(ones_flags):]
    channels = []
    for flag in ones_flags:
        channels.append(implicit if flag else static_refs.pop(0)[:])
    scales = []
    for a in range(n_float):
        hi = float_refs[2 * a][:]
        lo = float_refs[2 * a + 1][:]
        m = jnp.max(jnp.abs(hi))
        scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))))
        scale = jnp.maximum(scale, jnp.float32(2.0) ** -100)
        inv23 = 8388608.0 / scale
        u = hi * inv23
        t = jnp.floor(u)
        d = (u - t) + lo * inv23
        c = jnp.floor(d)
        t = t + c
        l2, l1, l0 = _limbs3(t)
        w = jnp.floor((d - c) * 65536.0 + 0.5)
        m1 = w - 256.0 * jnp.floor(w / 256.0)
        m2 = (w - m1) / 256.0
        channels.extend([l2, l1, l0, m2, m1])
        scales.append(scale)

    C = len(channels)
    # rhs [(c, l), r] = oh_lo[l, r] * limb_c[r]; every product is 0 or the
    # limb itself (integer in [-256, 256]) so the bf16 cast is exact
    rows = [(oh_loT * ch[None, :]).astype(jnp.bfloat16) for ch in channels]
    rhs = jnp.concatenate(rows, axis=0)                         # [C*LO, B]
    out = jax.lax.dot_general(
        oh_hiT, rhs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)                    # [h_pad, C*LO]

    def accumulate(acc_ref, err_ref, row, x):
        acc = acc_ref[row, :, :]
        err = err_ref[row, :, :]
        h, l = _two_sum(acc, x)
        e = err + l
        acc2, err2 = _two_sum(h, e)
        acc_ref[row, :, :] = acc2
        err_ref[row, :, :] = err2

    for c in range(n_static):
        accumulate(acc_s_ref, err_s_ref, c, out[:, c * LO:(c + 1) * LO])
    base = n_static
    for a in range(n_float):
        scale = scales[a]
        f23 = scale * jnp.float32(2.0) ** -23
        f39 = scale * jnp.float32(2.0) ** -39
        factors = (f23 * 65536.0, f23 * 256.0, f23, f39 * 256.0, f39)
        for k in range(_FLOAT_CHANNELS):
            col = base + a * _FLOAT_CHANNELS + k
            accumulate(acc_f_ref, err_f_ref, a * _FLOAT_CHANNELS + k,
                       factors[k] * out[:, col * LO:(col + 1) * LO])


# Mosaic's default scoped-VMEM limit is 16MB; v5e has 128MB physical VMEM,
# so the mid-cardinality accumulators are allowed to claim most of it.
_VMEM_BUDGET = 100 << 20


def _channels2_vmem(block, h_pad, n_static, n_float):
    """Conservative VMEM footprint (bytes) of one _channels2_kernel block."""
    C = n_static + _FLOAT_CHANNELS * n_float
    cs_pad = max(n_static, 1)
    af_pad = max(n_float * _FLOAT_CHANNELS, 1)
    n_inputs = 1 + n_static + 2 * n_float
    resident = 2 * (cs_pad + af_pad) * h_pad * LO * 4           # acc+err pairs
    out = h_pad * C * LO * 4                                    # dot result
    rhs = C * LO * block * 2 + LO * block * 4                   # bf16 rows + f32 oh_lo
    oh_hi = h_pad * block * 2
    inputs = n_inputs * block * 4 * 2                           # double-buffered
    return resident + out + rhs + oh_hi + inputs


def two_level_channels_fits(G, n_static, n_float):
    """True when the channel accumulators + working set fit the VMEM budget
    at the smallest block size; callers fall back to the sort path if not."""
    H = -(-G // LO)
    h_pad = max(_round_up(H + 1, 8), 8)
    return _channels2_vmem(1024, h_pad, n_static, n_float) <= _VMEM_BUDGET


def fused_additive_two_level_channels(idx, static_channels, float_pairs, G,
                                      block=BLOCK):
    """Exact channel-limb aggregation for mid-cardinality grids.

    Same contract as :func:`fused_additive_channels`; G up to
    TWO_LEVEL_MAX_G.  Returns (static_sums [C_s, G], float_sums [A_f, G])
    in float64.
    """
    n_static = len(static_channels)
    n_float = len(float_pairs)
    C = n_static + _FLOAT_CHANNELS * n_float
    H = -(-G // LO)
    h_pad = max(_round_up(H + 1, 8), 8)                         # +1 drop bucket
    g_pad = h_pad * LO
    while (_channels2_vmem(block, h_pad, n_static, n_float) > _VMEM_BUDGET
           and block > 1024):
        block //= 2
    vmem_limit = min(_channels2_vmem(block, h_pad, n_static, n_float)
                     + (16 << 20), 120 << 20)
    N = idx.shape[0]
    n_pad = _round_up(max(N, block), block) - N

    def pad(a, fill=0.0):
        if n_pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])

    drop = (h_pad - 1) * LO
    idx = jnp.where(idx >= G, drop, idx).astype(jnp.int32)
    idx = pad(idx, drop)
    ones_flags = tuple(ch is None for ch in static_channels)
    inputs = [idx]
    for ch in static_channels:
        if ch is not None:
            inputs.append(pad(ch.astype(jnp.float32)))
    zeros = None
    for hi, lo in float_pairs:
        inputs.append(pad(hi.astype(jnp.float32)))
        if lo is None:
            if zeros is None:
                zeros = jnp.zeros(N + n_pad, jnp.float32)
            inputs.append(zeros)
        else:
            inputs.append(pad(lo.astype(jnp.float32)))
    nb = inputs[0].shape[0] // block

    # leading dim of a 3-d ref has no sublane constraint (h_pad carries it)
    cs_pad = max(n_static, 1)
    af_pad = max(n_float * _FLOAT_CHANNELS, 1)
    kernel = functools.partial(_channels2_kernel, n_static=n_static,
                               n_float=n_float, h_pad=h_pad, g_pad=g_pad,
                               ones_flags=ones_flags)
    with jax.enable_x64(False):
        acc_s, err_s, acc_f, err_f = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * len(inputs),
            out_specs=[pl.BlockSpec((cs_pad, h_pad, LO), lambda i: (0, 0, 0)),
                       pl.BlockSpec((cs_pad, h_pad, LO), lambda i: (0, 0, 0)),
                       pl.BlockSpec((af_pad, h_pad, LO), lambda i: (0, 0, 0)),
                       pl.BlockSpec((af_pad, h_pad, LO), lambda i: (0, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((cs_pad, h_pad, LO), jnp.float32),
                       jax.ShapeDtypeStruct((cs_pad, h_pad, LO), jnp.float32),
                       jax.ShapeDtypeStruct((af_pad, h_pad, LO), jnp.float32),
                       jax.ShapeDtypeStruct((af_pad, h_pad, LO), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        )(*inputs)
    static_sums = (acc_s.astype(jnp.float64)
                   + err_s.astype(jnp.float64)).reshape(cs_pad, g_pad)[:n_static, :G]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        tot = (acc_f.astype(jnp.float64)
               + err_f.astype(jnp.float64)).reshape(af_pad, g_pad)
        tot = tot[:n_float * _FLOAT_CHANNELS, :G]
        float_sums = tot.reshape(n_float, _FLOAT_CHANNELS, G).sum(axis=1)
    return static_sums, float_sums


# ---------------------------------------------------------------------------
# Channel-limb kernel (v2 of the flat kernel): ONE bf16 MXU pass, exact
# accumulation.
#
# Every additive aggregate is decomposed into *channels* whose values are
# integers in [-256, 256] — exactly representable in bf16 — so a single
# DEFAULT-precision dot(limbs [C, B] bf16, onehot [B, G] bf16) accumulates
# them EXACTLY in the MXU's f32 accumulator (|partial| <= 256 * B < 2^24).
# Two channel kinds:
#
# * 'static' (ints, count): 8-bit signed limbs of the integer value, factors
#   2^(8k) applied by the caller — integer sums are exact mod 2^64, vs the
#   reference's C++ int64 accumulation (superagg.cpp:350);
# * 'float' (f64/f32 sums, moments): the kernel block-scales hi/lo f32 parts
#   by 2^ceil(log2(blockmax)) and extracts 5 limbs (40-bit fixed point per
#   block), folding the scale back in at accumulation time.
#
# Per-channel accumulators are renormalized f32 pairs (TwoSum each block):
# for integer channels every intermediate is an exactly-representable
# integer, so channel totals are exact up to 2^47; floats land ~2^-45
# relative.  This replaces the 3-pass HIGHEST matmul (3x the MXU time) AND
# fixes its in-block f32 rounding (~1e-4 absolute on cancellation-heavy
# sums).

_FLOAT_CHANNELS = 5  # 3 limbs of hi (24 bits) + 2 of lo (bits 25..40)


def _two_sum(a, b):
    """Knuth TwoSum: exact (s, err) with s = fl(a+b), a+b = s+err."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _limbs3(t):
    """Integer-valued f32 |t| < 2^24 -> 3 limbs (l2, l1, l0), t = l2*2^16 +
    l1*2^8 + l0, low limbs in [0, 256), top in [-256, 256]."""
    l0 = t - 256.0 * jnp.floor(t / 256.0)
    t1 = (t - l0) / 256.0
    l1 = t1 - 256.0 * jnp.floor(t1 / 256.0)
    l2 = (t1 - l1) / 256.0
    return l2, l1, l0


def _channels_kernel(idx_ref, *rest, n_static, n_float, g_pad, ones_flags=()):
    refs = rest[:-4]
    acc_s_ref, err_s_ref, acc_f_ref, err_f_ref = rest[-4:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_s_ref[:] = jnp.zeros_like(acc_s_ref)
        err_s_ref[:] = jnp.zeros_like(err_s_ref)
        acc_f_ref[:] = jnp.zeros_like(acc_f_ref)
        err_f_ref[:] = jnp.zeros_like(err_f_ref)

    idx = idx_ref[:]
    B = idx.shape[0]
    # transposed one-hot [g_pad, B]: iota on sublanes, idx broadcast along
    # its native lane layout — 2.2x faster than the [B, g_pad] build, which
    # relayouts idx lane->sublane (measured 85ms -> 38ms per 1e8 rows)
    binsT = jax.lax.broadcasted_iota(jnp.int32, (g_pad, B), 0)
    onehotT = (binsT == idx[None, :]).astype(jnp.bfloat16)     # [g_pad, B]

    # implicit count channels: 1 exactly where the (validity-folded) index
    # is a real bin — derived in VMEM, no HBM stream (VERDICT r3 pass cost)
    ones_flags = ones_flags or (False,) * n_static
    implicit = None
    if any(ones_flags):
        implicit = (idx != g_pad - 1).astype(jnp.float32)

    static_refs = list(refs[:n_static - sum(ones_flags)])
    float_refs = refs[n_static - sum(ones_flags):]              # hi0, lo0, hi1, ...

    rows = []
    for flag in ones_flags:
        rows.append(implicit if flag else static_refs.pop(0)[:])
    scales = []
    for a in range(n_float):
        hi = float_refs[2 * a][:]
        lo = float_refs[2 * a + 1][:]
        m = jnp.max(jnp.abs(hi))
        # power-of-2 block scale; clamp so 2^23/scale stays finite and
        # 0-blocks stay 0 (values below ~2^-77 of the block max quantize to 0)
        scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))))
        scale = jnp.maximum(scale, jnp.float32(2.0) ** -100)
        inv23 = 8388608.0 / scale                               # 2^23 / scale
        u = hi * inv23                                          # exact: power-of-2 mult
        t = jnp.floor(u)                                        # |t| <= 2^23
        d = (u - t) + lo * inv23                                # in (-1, 2)
        c = jnp.floor(d)                                        # carry in {-1, 0, 1}
        t = t + c                                               # |t| <= 2^23 + 1
        l2, l1, l0 = _limbs3(t)                                 # l2 in [-129, 130]
        w = jnp.floor((d - c) * 65536.0 + 0.5)                  # bits 24..39, [0, 2^16]
        # round-to-nearest: floor alone biases every value down by half an
        # ulp of the fixed point, which accumulates linearly over a group
        m1 = w - 256.0 * jnp.floor(w / 256.0)
        m2 = (w - m1) / 256.0
        rows.extend([l2, l1, l0, m2, m1])
        scales.append(scale)

    V = jnp.stack(rows, axis=0).astype(jnp.bfloat16)            # [C, B]
    out = jax.lax.dot_general(
        V, onehotT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)                    # [C, g_pad]

    def accumulate(acc_ref, err_ref, row, x):
        acc = acc_ref[row, :]
        err = err_ref[row, :]
        h, l = _two_sum(acc, x)
        e = err + l
        acc2, err2 = _two_sum(h, e)                             # renormalize
        acc_ref[row, :] = acc2
        err_ref[row, :] = err2

    for c in range(n_static):
        accumulate(acc_s_ref, err_s_ref, c, out[c, :])
    base = n_static
    for a in range(n_float):
        scale = scales[a]
        f23 = scale * jnp.float32(2.0) ** -23
        f39 = scale * jnp.float32(2.0) ** -39
        factors = (f23 * 65536.0, f23 * 256.0, f23, f39 * 256.0, f39)
        for k in range(_FLOAT_CHANNELS):
            accumulate(acc_f_ref, err_f_ref, a * _FLOAT_CHANNELS + k,
                       factors[k] * out[base + a * _FLOAT_CHANNELS + k, :])


BLOCK_CHANNELS = 131072  # flat channels kernel: big blocks amortize best


def fused_additive_channels(idx, static_channels, float_pairs, G,
                            block=BLOCK_CHANNELS):
    """One-pass exact grid aggregation.

    idx [N] int32 (rows with idx >= G are dropped); static_channels: list of
    [N] f32 arrays with integer values in [-256, 256] (validity already
    folded in as 0); float_pairs: list of (hi [N] f32, lo [N] f32 or None)
    value columns.  Returns (static_sums [C_s, G] f64 — raw channel sums,
    callers apply their 2^(8k) factors — and float_sums [A_f, G] f64).
    """
    n_static = len(static_channels)
    n_float = len(float_pairs)
    ones_flags = tuple(ch is None for ch in static_channels)
    g_pad = max(_round_up(G + 1, 128), 128)
    # VMEM: the [block, g_pad] bf16 one-hot is the big tensor.  Big blocks
    # measurably amortize per-block costs (per-1e8-row kernel time 23.9 ms
    # at block 8k -> 20.1 ms at 128k, round-4 microbench), so claim real
    # VMEM (v5e has 128 MB physical) instead of the conservative default
    while block * g_pad * 2 > (32 << 20) and block > 1024:
        block //= 2
    N = idx.shape[0]
    n_pad = _round_up(max(N, block), block) - N

    def pad(a, fill=0.0):
        if n_pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])

    idx = jnp.where(idx >= G, g_pad - 1, idx).astype(jnp.int32)
    idx = pad(idx, g_pad - 1)
    inputs = [idx]
    for ch in static_channels:
        if ch is not None:
            inputs.append(pad(ch.astype(jnp.float32)))
    zeros = None
    for hi, lo in float_pairs:
        inputs.append(pad(hi.astype(jnp.float32)))
        if lo is None:
            if zeros is None:
                zeros = jnp.zeros(N + n_pad, jnp.float32)
            inputs.append(zeros)
        else:
            inputs.append(pad(lo.astype(jnp.float32)))
    nb = inputs[0].shape[0] // block

    cs_pad = max(_round_up(max(n_static, 1), 8), 8)
    af_pad = max(_round_up(max(n_float * _FLOAT_CHANNELS, 1), 8), 8)
    kernel = functools.partial(
        _channels_kernel, n_static=n_static, n_float=n_float, g_pad=g_pad,
        ones_flags=ones_flags)
    with jax.enable_x64(False):
        acc_s, err_s, acc_f, err_f = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * len(inputs),
            out_specs=[pl.BlockSpec((cs_pad, g_pad), lambda i: (0, 0)),
                       pl.BlockSpec((cs_pad, g_pad), lambda i: (0, 0)),
                       pl.BlockSpec((af_pad, g_pad), lambda i: (0, 0)),
                       pl.BlockSpec((af_pad, g_pad), lambda i: (0, 0))],
            out_shape=[jax.ShapeDtypeStruct((cs_pad, g_pad), jnp.float32),
                       jax.ShapeDtypeStruct((cs_pad, g_pad), jnp.float32),
                       jax.ShapeDtypeStruct((af_pad, g_pad), jnp.float32),
                       jax.ShapeDtypeStruct((af_pad, g_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(block * g_pad * 2 * 2
                                     + len(inputs) * block * 4 * 2
                                     + (16 << 20), 110 << 20)),
        )(*inputs)
    static_sums = (acc_s.astype(jnp.float64) + err_s.astype(jnp.float64))[:n_static, :G]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        tot = acc_f.astype(jnp.float64) + err_f.astype(jnp.float64)     # [af, g_pad]
        tot = tot[:n_float * _FLOAT_CHANNELS, :G]
        float_sums = tot.reshape(n_float, _FLOAT_CHANNELS, G).sum(axis=1)
    return static_sums, float_sums


def is_available():
    if not HAVE_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
