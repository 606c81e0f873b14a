"""Partitioned two-phase Pallas aggregation for mid-cardinality grids.

The one-hot matmul kernels (ops/pallas_gridagg.py) do MXU work proportional
to the WHOLE grid per row (density 1/G waste); the sort path moves every row
through a sort network.  This kernel splits the grid instead (the TPU
re-think of the reference's bucketed bulk hashmap inserts,
hash_primitives.hpp:96-281):

* **phase 1** — grid over row blocks of B1: rows route to ``P = ceil(G/S)``
  buckets by their bin-index high digit.  Routing is ONE bf16 MXU matmul
  with a destination one-hot (``dest = bucket*F + rank``; rank = stable
  position within the block's bucket run via a log-step VPU prefix scan).
  Every carried payload is decomposed into bf16-EXACT channels (8-bit limbs
  / bf16 Dekker splits), and each destination slot receives exactly one row
  — the matmul is an exact relocation, no rounding anywhere.  Runs are
  zero-padded to capacity ``F`` (zeros are additive identities, so phase 2
  needs no masks); rows whose run overflows are counted and the caller
  retries on another strategy (requires B1/P <= ~80: >6 sigma headroom for
  hash-random keys).
* **phase 2** — grid over (bucket, block-chunks): the bucket's sub-grid
  accumulators (exact channel-limb scheme, pallas_gridagg) stay resident in
  VMEM while its rows stream through a one-hot matmul of width S — per-row
  MXU work drops from G to S (~50x at G = 1e5).

Phase 1 writes phase 2's ``[P, C, nb*F]`` layout directly (a between-phase
XLA transpose of the GB-scale buffer measured 53s); both kernels see
layout-legal (8, 128)-aligned blocks.
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

from .pallas_gridagg import _FLOAT_CHANNELS, _limbs3, _round_up, _two_sum

F = 128        # per-(block, bucket) run capacity (one 128-lane group)
P_MAX = 126    # max buckets (bucket one-hot + trash bucket fit 128 lanes)
# require B1/P <= this: mean run 70 -> F=128 is +7.0 sigma (Poisson tail
# ~1e-10/run; ~1e-4 expected overflows per 1e8-row pass).  The former 80
# (+5.6 sigma) overflowed in practice — a 1e8-row uniform-code pass tripped
# the retry-on-sort-path every time (11 rows over across ~1.3M runs),
# costing far more than slightly smaller blocks do
RUN_HEADROOM = 70


def _split_bf16_exact(x32):
    """f32 [N] -> 3 channels, each exactly representable in bf16, summing
    back to x32 exactly (Dekker split: 8+8+8 mantissa bits >= 24).

    Uses ``lax.reduce_precision``, NOT ``astype(bf16).astype(f32)``: under
    jit, --xla_allow_excess_precision folds the cast round-trip away and the
    split silently collapses to (x, 0, 0) — sums then carry bf16-level
    error."""
    c1 = jax.lax.reduce_precision(x32, exponent_bits=8, mantissa_bits=7)
    r = x32 - c1
    c2 = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
    c3 = r - c2
    return c1, c2, c3


def _phase1_kernel(idx_ref, *refs, P, shift, b1):
    """Route one row block into the [1, C8, P_pad, F] bucketed layout."""
    out_ref, ovf_ref = refs[-2:]
    payload_refs = refs[:-2]
    idx = idx_ref[:]                                   # [B1] i32
    bucket = jax.lax.shift_right_logical(idx, shift)   # high digit
    bucket = jnp.minimum(bucket, P)                    # invalid -> trash P
    bins = jax.lax.broadcasted_iota(jnp.int32, (b1, 128), 1)
    onehot_b8 = (bucket[:, None] == bins).astype(jnp.int8)     # [B1, 128]
    onehot_b = onehot_b8.astype(jnp.float32)

    # rank within the block's bucket run = exclusive per-bucket prefix.
    # Sub-blocked int8 MXU matmuls with a strict-lower-triangular mask
    # replace the log-step VPU shift-scan (12 x [B1,128] concat+add
    # materializations measured ~6 ns/row of the 10 ns phase-1 total):
    # int8 x int8 -> int32 accumulation is exact for counts <= B1, the
    # int8 MXU is rate-equal to bf16 on this chip (RESULTS round 4), and
    # SB=512 keeps the per-row MXU work at SB*128 = 65k MACs (~0.3 ns)
    SB = min(512, b1)
    nsb = b1 // SB
    ri = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    lower = (ci < ri).astype(jnp.int8)                         # [SB, SB]
    parts = []
    running = jnp.zeros((1, 128), jnp.int32)
    for s in range(nsb):
        sub = onehot_b8[s * SB:(s + 1) * SB, :]
        excl_sub = jax.lax.dot_general(
            lower, sub, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                  # [SB, 128]
        parts.append(excl_sub + running)
        running = running + jnp.sum(sub.astype(jnp.int32), axis=0,
                                    keepdims=True)
    excl_i = parts[0] if nsb == 1 else jnp.concatenate(parts, axis=0)
    # keep rank 2-D [B1, 1]: 1-D results of axis reductions carry offset
    # layouts that Mosaic cannot re-reduce ("Offset change")
    rank = jnp.sum(jnp.where(onehot_b8 != 0, excl_i, 0),
                   axis=1, keepdims=True)
    bucket2 = bucket[:, None]                          # [B1, 1]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        ovf_ref[:] = jnp.zeros_like(ovf_ref)
    cnt = jnp.sum(((rank >= F) & (bucket2 < P)).astype(jnp.float32))
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    col0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0
    ovf_ref[:] += jnp.where(row0 & col0, cnt, 0.0)

    dest = jnp.where((bucket2 < P) & (rank < F), bucket2 * F + rank, P * F)

    # payload channels: idx_lo as two 8-bit limbs + caller channels (all
    # bf16-exact, so the DEFAULT-precision dot relocates them exactly)
    idx_lo = idx - jax.lax.shift_left(bucket, shift)
    lo8 = (idx_lo & 255).astype(jnp.float32)
    hi8 = jax.lax.shift_right_logical(idx_lo, 8).astype(jnp.float32)
    cols = [hi8, lo8] + [r[:] for r in payload_refs]
    c8 = out_ref.shape[1]
    while len(cols) < c8:
        cols.append(jnp.zeros((b1,), jnp.float32))
    V = jnp.stack(cols, axis=0).astype(jnp.bfloat16)   # [C8, B1]

    # chunk the destination one-hot over P so its VMEM footprint stays small
    p_pad = out_ref.shape[0]
    CHUNK = 26 * F  # 3328 lanes x B1 x 2B <= 27MB
    width = p_pad * F
    pieces = []
    for w0 in range(0, width, CHUNK):
        w = min(CHUNK, width - w0)
        bins_d = jax.lax.broadcasted_iota(jnp.int32, (b1, w), 1) + w0
        onehot_d = (dest == bins_d).astype(jnp.bfloat16)  # dest is [B1, 1]
        piece = jax.lax.dot_general(
            V, onehot_d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)       # [C8, w]
        pieces.append(piece)
    outT = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    # write DIRECTLY in phase 2's layout [P_pad, C8, F] (block b owns lane
    # slice [b*F, (b+1)*F) of the [P_pad, C8, nb*F] array): an in-VMEM
    # rearrange here replaces an XLA transpose of the whole 1GB+ buffer
    # between the phases (measured 53s — 400x the kernel itself).
    # Per-bucket LANE-SLICE writes instead of a reshape+transpose: the
    # [C8, p_pad, F] -> [p_pad, C8, F] sublane relayout measured 4.2 ns/row
    # — 40% of the whole phase (kern_micro5 p1 10.1 vs p1nt 5.9, round 5)
    for p_i in range(p_pad):
        out_ref[p_i] = outT[:, p_i * F:(p_i + 1) * F]


def _phase2_kernel(data_ref, acc_s_ref, err_s_ref, acc_f_ref, err_f_ref,
                   ext_ref=None, *, n_static, n_float, s_pad, ext_modes=(),
                   two_level=False):
    """Accumulate one bucket-chunk [1, C8, B2*F] into the bucket's
    [*, s_pad] channel accumulators (exact limb scheme).  Optional extreme
    columns (min/max) reduce a masked [s_pad, R] broadcast on the VPU; a
    validity channel distinguishes real rows from empty (zero-filled)
    capacity slots.  With ``two_level`` the sub-grid factors as
    hi*128 + lo (the _channels2_kernel trick): the flat [s_pad, R] one-hot
    build — the dominant cost at S >= 4096 — is replaced by two digit
    one-hots and accumulators shaped [*, h_pad, 128]."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_s_ref[:] = jnp.zeros_like(acc_s_ref)
        err_s_ref[:] = jnp.zeros_like(err_s_ref)
        acc_f_ref[:] = jnp.zeros_like(acc_f_ref)
        err_f_ref[:] = jnp.zeros_like(err_f_ref)
        if ext_ref is not None:
            # ext_ref block [1, s_pad, E8]: cells on sublanes so the masked
            # [s_pad, R] axis-1 reductions store without a transpose
            ext_ref[:] = jnp.zeros_like(ext_ref)
            for e, m in enumerate(ext_modes):
                fill = np.inf if m == "min" else -np.inf
                ext_ref[0, :, e:e + 1] = jnp.full((s_pad, 1), fill, jnp.float32)

    rows = data_ref[0]                                 # [C8, R]
    R = rows.shape[1]
    # keep every extracted channel 2-D [1, R] and reductions FULL (partial
    # reductions over offset-layout slices are unimplemented in Mosaic)
    idx_lo = (rows[0:1] * 256.0 + rows[1:2]).astype(jnp.int32)   # [1, R]
    onehotT = None
    if not two_level:
        binsT = jax.lax.broadcasted_iota(jnp.int32, (s_pad, R), 0)
        onehotT = (binsT == idx_lo).astype(jnp.bfloat16)         # [s_pad, R]

    channels = [rows[2 + i:3 + i] for i in range(n_static)]      # [1, R] each
    scales = []
    base_in = 2 + n_static
    for a in range(n_float):
        # six bf16-exact pieces -> (hi, lo) f32 reconstructed exactly
        a0 = base_in + 6 * a
        hi = rows[a0:a0 + 1] + rows[a0 + 1:a0 + 2] + rows[a0 + 2:a0 + 3]
        lo = rows[a0 + 3:a0 + 4] + rows[a0 + 4:a0 + 5] + rows[a0 + 5:a0 + 6]
        m = jnp.max(jnp.abs(hi))                                  # full reduce
        scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))))
        scale = jnp.maximum(scale, jnp.float32(2.0) ** -100)
        inv23 = 8388608.0 / scale
        u = hi * inv23
        t = jnp.floor(u)
        d = (u - t) + lo * inv23
        cr = jnp.floor(d)
        t = t + cr
        l2, l1, l0 = _limbs3(t)
        w = jnp.floor((d - cr) * 65536.0 + 0.5)
        m1 = w - 256.0 * jnp.floor(w / 256.0)
        m2 = (w - m1) / 256.0
        channels.extend([l2, l1, l0, m2, m1])
        scales.append(scale)

    def accumulate(acc_ref, err_ref, row, x):
        acc = acc_ref[0, row, :]
        err = err_ref[0, row, :]
        h, l = _two_sum(acc, x)
        e = err + l
        acc2, err2 = _two_sum(h, e)
        acc_ref[0, row, :] = acc2
        err_ref[0, row, :] = err2

    def accumulate3(acc_ref, err_ref, row, x):
        acc = acc_ref[0, row, :, :]
        err = err_ref[0, row, :, :]
        h, l = _two_sum(acc, x)
        e = err + l
        acc2, err2 = _two_sum(h, e)
        acc_ref[0, row, :, :] = acc2
        err_ref[0, row, :, :] = err2

    if channels and two_level:
        h_pad = s_pad // 128
        hi_d = jax.lax.shift_right_logical(idx_lo, 7)              # [1, R]
        lo_d = idx_lo & 127
        bins_h = jax.lax.broadcasted_iota(jnp.int32, (h_pad, R), 0)
        oh_hiT = (bins_h == hi_d).astype(jnp.bfloat16)             # [h_pad, R]
        bins_l = jax.lax.broadcasted_iota(jnp.int32, (128, R), 0)
        oh_loT = (bins_l == lo_d).astype(jnp.float32)              # [128, R]
        # rhs row (c, l) = oh_lo[l] * ch_c: products are 0 or the limb
        # itself (ints in [-256, 256]) so the bf16 cast stays exact
        rhs = jnp.concatenate([(oh_loT * ch).astype(jnp.bfloat16)
                               for ch in channels], axis=0)        # [C2*128, R]
        out2 = jax.lax.dot_general(
            oh_hiT, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)                   # [h_pad, C2*128]
        for ci in range(n_static):
            accumulate3(acc_s_ref, err_s_ref, ci, out2[:, ci * 128:(ci + 1) * 128])
        base = n_static
        for a in range(n_float):
            scale = scales[a]
            f23 = scale * jnp.float32(2.0) ** -23
            f39 = scale * jnp.float32(2.0) ** -39
            factors = (f23 * 65536.0, f23 * 256.0, f23, f39 * 256.0, f39)
            for k in range(_FLOAT_CHANNELS):
                col = base + a * _FLOAT_CHANNELS + k
                accumulate3(acc_f_ref, err_f_ref, a * _FLOAT_CHANNELS + k,
                            factors[k] * out2[:, col * 128:(col + 1) * 128])
    elif channels:  # extremes-only calls have no additive channels
        V = jnp.concatenate(channels, axis=0).astype(jnp.bfloat16)   # [C2, R]
        out = jax.lax.dot_general(
            V, onehotT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)                   # [C2, s_pad]
        for ci in range(n_static):
            accumulate(acc_s_ref, err_s_ref, ci, out[ci, :])
        base = n_static
        for a in range(n_float):
            scale = scales[a]
            f23 = scale * jnp.float32(2.0) ** -23
            f39 = scale * jnp.float32(2.0) ** -39
            factors = (f23 * 65536.0, f23 * 256.0, f23, f39 * 256.0, f39)
            for k in range(_FLOAT_CHANNELS):
                col = base + a * _FLOAT_CHANNELS + k
                accumulate(acc_f_ref, err_f_ref, a * _FLOAT_CHANNELS + k,
                           factors[k] * out[col, :])

    if ext_ref is not None and ext_modes:
        base_ext = 2 + n_static + 6 * n_float
        validr = rows[base_ext:base_ext + 1]                       # [1, R] f32 0/1
        ohf = onehotT.astype(jnp.float32)                          # [s_pad, R] 0/1
        for e, m in enumerate(ext_modes):
            a0 = base_ext + 1 + 3 * e
            v = rows[a0:a0 + 1] + rows[a0 + 1:a0 + 2] + rows[a0 + 2:a0 + 3]
            # mask-free arithmetic select (boolean masks of mismatched
            # broadcast layouts trip Mosaic relayouts); the fill is a finite
            # sentinel so 0 * fill stays 0, converted to inf at extraction
            big = jnp.float32((2.0 ** 127) if m == "min" else -(2.0 ** 127))
            vrow = validr * v + (1.0 - validr) * big               # [1, R]
            vb = ohf * vrow + (1.0 - ohf) * big                    # [s_pad, R]
            if m == "min":
                red = jnp.min(vb, axis=1, keepdims=True)           # [s_pad, 1]
                ext_ref[0, :, e:e + 1] = jnp.minimum(ext_ref[0, :, e:e + 1], red)
            else:
                red = jnp.max(vb, axis=1, keepdims=True)
                ext_ref[0, :, e:e + 1] = jnp.maximum(ext_ref[0, :, e:e + 1], red)


# measured per-element/per-MAC costs on v5e (kern_micro5, round 5):
# one-hot build / masked select ~0.62 ps per output element; bf16 MXU
# ~5.1e-6 ns per MAC (197 T MACs/s)
_CV = 0.62e-3   # ns per VPU one-hot element
_CM = 5.1e-6    # ns per bf16 MAC


# test/bench hook: force a specific S (micro-benchmarks sweep it)
PLAN_S_OVERRIDE = None


def plan(G, n_static, n_float):
    """(S, P, B1, B2) for a grid of G cells, or None when out of range.

    Round-5 redesign: S is chosen by a cost model instead of minimally.
    Phase-1's relocation one-hot costs P_pad*F elements PER ROW (the
    dominant term at G=1e6: width 16384 measured 10.2 ns/row), so FEWER,
    BIGGER buckets with a smaller row block B1 cut it directly; the price
    is phase-2 hi-digit/MXU work growing with S.  The model uses the
    measured constants above; at G=1e6 it moves S 8192 -> 32768
    (width 16384 -> 4096, slack 3.84 -> 1.94)."""
    if G <= 8192:
        return None  # the flat/two-level kernels already win there
    C2 = n_static + _FLOAT_CHANNELS * n_float
    best = None
    candidates = ((PLAN_S_OVERRIDE,) if PLAN_S_OVERRIDE
                  else (1024, 2048, 4096, 8192, 16384, 32768))
    for S in candidates:
        P = -(-G // S)
        if P > P_MAX:
            continue
        P_pad = _round_up(P, 8)
        # largest block with mean run <= RUN_HEADROOM; 1024-multiples, not
        # just powers of two — P=98 at B1=4096 means run 42 (slack 3.06)
        # while 6144 gives 63 (slack 2.04): the pow-2 quantization was
        # costing a third of phase 2 at G=1e5-class shapes
        B1 = 512
        for cand in (6144, 5120, 4096, 3072, 2048, 1024, 512):  # 1024-multiples (XLA 1-D block layout) + legacy 512
            if cand // P <= RUN_HEADROOM:
                B1 = cand
                break
        if B1 // P > RUN_HEADROOM:
            continue  # even 512-row blocks would overflow F=128 runs
        slack = P * F / B1
        # phase 1 measured FLAT across a 4x relocation-width change
        # (kern_micro5 sweep: 10.1 -> 10.1 ns/row; ~5.9 after the
        # transpose fix) — so the model weighs only phase 2's per-slot
        # work: hi one-hot (S/128) + lo one-hot (128) + rhs channel build
        # (C2*128) + accumulate epilogue (~500), plus the two-level dot's
        # S*C2 MACs, all multiplied by the relocation slack.  Measured at
        # G=1e6/C2=11: S=8192 7.8, S=16384 6.9, S=32768 10.4 ns/row —
        # the model reproduces that ordering
        vpu_slot = (S // 128 + 128 + C2 * 128 + 500) if S >= 4096 else (S + 500)
        mxu_slot = S * C2
        cost = slack * (vpu_slot * _CV + mxu_slot * _CM)
        if best is None or cost < best[0]:
            best = (cost, S, P, B1)
    if best is None:
        return None  # beyond P_MAX at every S: sort path
    _, S, P, B1 = best
    if S >= 4096:
        # two-level phase 2: the rhs [C2*128, B2*F] bf16 block is the big
        # VMEM tensor
        B2 = max(1, min(32, (24 << 20) // (max(C2, 1) * 128 * F * 2)))
    else:
        # flat phase 2 materializes the [S, B2*F] one-hot
        B2 = max(1, min(32, (24 << 20) // (S * F * 2)))
    return S, P, B1, B2


# finite stand-in for the +-inf extreme identity: infs would turn the
# relocation matmul's inf*0 products into NaN.  bf16-exact, far above any
# realistic data value; converted back to the inf identity at extraction.
_EXT_BIG = float(2.0 ** 126)


def partitioned_additive_channels(idx, static_channels, float_pairs, G,
                                  extreme_cols=(), validity=None):
    """Exact channel aggregation via partition + per-bucket one-hot.

    Same contract as fused_additive_channels: idx [N] int32 (>= G drops),
    static channels bf16-exact ints in [-256, 256], float (hi, lo) f32
    pairs.  ``extreme_cols`` is a list of (col_f32, mode) for per-cell
    min/max — exact for values exactly representable in f32 (f32 inputs,
    range-bounded ints); requires ``validity`` (f32 0/1 per row) to
    distinguish empty capacity slots.  Returns (static_sums [Cs, G] f64,
    float_sums [Af, G] f64, extreme_grids list of [G] f32, overflow int32).
    Nonzero overflow means rows were NOT aggregated (pathologically
    clustered keys): discard and use another strategy.
    """
    n_static = len(static_channels)
    n_float = len(float_pairs)
    n_ext = len(extreme_cols)
    ext_modes = tuple(m for _, m in extreme_cols)
    S, P, b1, B2 = plan(G, n_static, n_float)
    if n_ext:
        # extremes run the flat [S, R] masked reduce (no two-level form):
        # cap S and size B2 for the flat one-hot so VMEM stays sane.  The
        # engine no longer routes extremes here (gridagg.extreme_fast,
        # round 5); this keeps the direct API usable.
        if S > 8192:
            S = 8192
            P = -(-G // S)
            if P > P_MAX:
                raise ValueError("grid too large for the extremes-capable plan")
            b1 = 4096
            while b1 > 512 and b1 // P > RUN_HEADROOM:
                b1 //= 2
        B2 = max(1, min(32, (24 << 20) // (S * F * 2)))
    shift = int(np.log2(S))
    Cp = 2 + n_static + 6 * n_float + ((1 + 3 * n_ext) if n_ext else 0)
    C8 = _round_up(Cp, 8)
    P_pad = _round_up(P, 8)  # trash rows land in pad bucket P (never read)

    N = idx.shape[0]
    nb = -(-N // b1)
    nb = _round_up(nb, B2)  # phase 2 reads B2-block chunks: pad with drop
    n_pad = nb * b1 - N     # rows so every phase-1 block writes real zeros
    drop = (P + 1) << shift  # shifts to bucket > P -> clamped to trash

    def pad(a, fill=0.0):
        if n_pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])

    idx = jnp.where(idx >= G, drop, idx).astype(jnp.int32)
    idx = pad(idx, drop)
    inputs = [idx]
    for ch in static_channels:
        inputs.append(pad(ch.astype(jnp.float32)))
    for hi, lo in float_pairs:
        h1, h2, h3 = _split_bf16_exact(hi.astype(jnp.float32))
        if lo is None:
            l1 = l2 = l3 = jnp.zeros_like(h1)
        else:
            l1, l2, l3 = _split_bf16_exact(lo.astype(jnp.float32))
        for ch in (h1, h2, h3, l1, l2, l3):
            inputs.append(pad(ch))
    if n_ext:
        inputs.append(pad(validity.astype(jnp.float32)))
        for col, mode in extreme_cols:
            c = col.astype(jnp.float32)
            big = jnp.float32(_EXT_BIG if mode == "min" else -_EXT_BIG)
            c = jnp.where(jnp.isfinite(c), c, big)  # inf x 0 in the MXU = NaN
            e1, e2, e3 = _split_bf16_exact(c)
            for ch in (e1, e2, e3):
                inputs.append(pad(ch))

    kern1 = functools.partial(_phase1_kernel, P=P, shift=shift, b1=b1)
    with jax.enable_x64(False):
        bucketed, ovf = pl.pallas_call(
            kern1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((b1,), lambda b: (b,))] * len(inputs),
            out_specs=[
                pl.BlockSpec((P_pad, C8, F), lambda b: (0, 0, b)),
                pl.BlockSpec((8, 128), lambda b: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((P_pad, C8, nb * F), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(*inputs)
        overflow = ovf[0, 0].astype(jnp.int32)
        re_tiled = bucketed  # already in phase-2 layout, zero relayout cost
        nb2 = nb // B2

        C2 = n_static + _FLOAT_CHANNELS * n_float
        cs_pad = _round_up(max(n_static, 1), 8)
        af_pad = _round_up(max(n_float * _FLOAT_CHANNELS, 1), 8)
        e8 = _round_up(max(n_ext, 1), 8)
        # big sub-grids without extremes factor as hi*128+lo: the flat
        # [S, R] one-hot build is the dominant cost there
        two_level = S >= 4096 and not n_ext
        kern2 = functools.partial(_phase2_kernel, n_static=n_static,
                                  n_float=n_float, s_pad=S, ext_modes=ext_modes,
                                  two_level=two_level)
        if two_level:
            h_pad = S // 128
            acc_dims = (h_pad, 128)
        else:
            acc_dims = (S,)
        out_specs = [
            pl.BlockSpec((1, cs_pad) + acc_dims, lambda p, c: (p, 0, 0, 0)[:2 + len(acc_dims)]),
            pl.BlockSpec((1, cs_pad) + acc_dims, lambda p, c: (p, 0, 0, 0)[:2 + len(acc_dims)]),
            pl.BlockSpec((1, af_pad) + acc_dims, lambda p, c: (p, 0, 0, 0)[:2 + len(acc_dims)]),
            pl.BlockSpec((1, af_pad) + acc_dims, lambda p, c: (p, 0, 0, 0)[:2 + len(acc_dims)]),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((P, cs_pad) + acc_dims, jnp.float32),
            jax.ShapeDtypeStruct((P, cs_pad) + acc_dims, jnp.float32),
            jax.ShapeDtypeStruct((P, af_pad) + acc_dims, jnp.float32),
            jax.ShapeDtypeStruct((P, af_pad) + acc_dims, jnp.float32),
        ]
        if n_ext:
            out_specs.append(pl.BlockSpec((1, S, e8), lambda p, c: (p, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((P, S, e8), jnp.float32))
        outs = pl.pallas_call(
            kern2,
            grid=(P, nb2),
            in_specs=[pl.BlockSpec((1, C8, B2 * F), lambda p, c: (p, 0, c))],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(re_tiled)
        acc_s, err_s, acc_f, err_f = outs[:4]
        ext_out = outs[4] if n_ext else None

    def combine(acc, err, width):
        tot = acc.astype(jnp.float64) + err.astype(jnp.float64)
        if tot.ndim == 4:  # two-level accumulators [P, width, h_pad, 128]
            tot = tot.reshape(tot.shape[0], width, S)
        return tot.transpose(1, 0, 2).reshape(width, P * S)[:, :G]

    static_sums = combine(acc_s, err_s, cs_pad)[:n_static]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        tot = combine(acc_f, err_f, af_pad)[:n_float * _FLOAT_CHANNELS]
        float_sums = tot.reshape(n_float, _FLOAT_CHANNELS, G).sum(axis=1)
    extreme_grids = []
    for e, (_, mode) in enumerate(extreme_cols):
        grid = ext_out[:, :, e].reshape(P * S)[:G]
        ident = jnp.float32(np.inf if mode == "min" else -np.inf)
        # cells holding only identity-filled (value-invalid) rows carry the
        # finite sentinel: restore the inf identity
        grid = jnp.where(jnp.abs(grid) >= jnp.float32(_EXT_BIG), ident, grid)
        extreme_grids.append(grid)
    return static_sums, float_sums, extreme_grids, overflow
