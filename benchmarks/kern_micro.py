"""Microbenchmark harness for the grid-aggregation Pallas kernels.

Times kernel variants on-chip with in-jit repeat loops (tunnel RTT excluded):
the jitted program runs the kernel REPS times over the same device-resident
inputs (idx perturbed per rep with one XOR to defeat CSE) and sums a scalar
probe of each result so nothing is dead-code-eliminated.

Usage:  python benchmarks/kern_micro.py [variant ...]
Variants: current, onehot, dot, factored, factored32, noop
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vaex_tpu.ops import pallas_gridagg as pg
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 25          # rows per rep
REPS = 8
G = 100
BLOCK = 8192


def make_inputs(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    idx = jax.random.randint(k1, (N,), 0, G, dtype=jnp.int32)
    x = jax.random.uniform(k2, (N,), dtype=jnp.float32).astype(jnp.float64)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    ones = jnp.ones((N,), jnp.float32)
    return idx, ones, hi, lo


def timeit(fn, *args):
    # np.asarray forces a real D2H sync; block_until_ready does not reliably
    # block through the axon tunnel (verify skill)
    float(np.asarray(fn(*args)))
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rows = N * REPS
    print(f"  {rows / best / 1e9:8.2f} G rows/s   {best * 1e3:8.1f} ms "
          f"  {best / rows * 1e9:6.3f} ns/row")
    return best


# --- current production kernel ---------------------------------------------

@jax.jit
def run_current(idx, ones, hi, lo):
    def body(i, acc):
        s, f = pg.fused_additive_channels(idx ^ i, [ones], [(hi, lo)], G)
        return acc + s[0, 0] + f[0, 0]
    return jax.lax.fori_loop(0, REPS, body, 0.0)


# --- components: one-hot build only / dot only ------------------------------

def _onehot_kernel(idx_ref, out_ref, *, g_pad):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]
    B = idx.shape[0]
    binsT = jax.lax.broadcasted_iota(jnp.int32, (g_pad, B), 0)
    onehotT = (binsT == idx[None, :]).astype(jnp.bfloat16)
    # cheap probe so the build is not DCE'd: one add per element
    out_ref[:] += jnp.sum(onehotT.astype(jnp.float32), axis=1, keepdims=True)


def onehot_only(idx, g_pad=128, block=BLOCK):
    nb = idx.shape[0] // block
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_onehot_kernel, g_pad=g_pad),
            grid=(nb,),
            in_specs=[pl.BlockSpec((block,), lambda i: (i,))],
            out_specs=pl.BlockSpec((g_pad, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((g_pad, 1), jnp.float32),
        )(idx)


@jax.jit
def run_onehot(idx, ones, hi, lo):
    def body(i, acc):
        return acc + onehot_only(idx ^ i)[0, 0]
    return jax.lax.fori_loop(0, REPS, body, 0.0)


def _dot_kernel(idx_ref, v_ref, acc_ref, *, g_pad, C):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    B = idx_ref.shape[0]
    # constant one-hot (no build cost): measures the MXU contraction alone
    onehotT = jnp.broadcast_to(
        (jax.lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0) == 0
         ).astype(jnp.bfloat16), (g_pad, B))
    V = jnp.broadcast_to(v_ref[:][None, :], (C, B)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(V, onehotT, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc_ref[:] += out


def dot_only(v, g_pad=128, C=8, block=BLOCK):
    nb = v.shape[0] // block
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_dot_kernel, g_pad=g_pad, C=C),
            grid=(nb,),
            in_specs=[pl.BlockSpec((block,), lambda i: (i,)),
                      pl.BlockSpec((block,), lambda i: (i,))],
            out_specs=pl.BlockSpec((C, g_pad), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, g_pad), jnp.float32),
        )(v, v)


@jax.jit
def run_dot(idx, ones, hi, lo):
    def body(i, acc):
        return acc + dot_only(hi + i)[0, 0]
    return jax.lax.fori_loop(0, REPS, body, 0.0)


# --- factored H x L Khatri-Rao variant --------------------------------------

def _fact_kernel(idx_ref, *rest, n_static, n_float, H, L, shift,
                 skip_dot=False, skip_kr=False, bf16_mult=False):
    refs = rest[:-2]
    acc_ref, err_ref = rest[-2:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        err_ref[:] = jnp.zeros_like(err_ref)

    idx = idx_ref[:]
    B = idx.shape[0]
    hi_d = idx >> shift
    lo_d = idx & (L - 1)
    bins_h = jax.lax.broadcasted_iota(jnp.int32, (H, B), 0)
    oh_hiT = (bins_h == hi_d[None, :]).astype(jnp.bfloat16)     # [H, B]
    bins_l = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)
    oh_loT = (bins_l == lo_d[None, :]).astype(jnp.float32)      # [L, B]

    static_refs = refs[:n_static]
    float_refs = refs[n_static:]
    rows = [r[:] for r in static_refs]
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
        l2, l1, l0 = pg._limbs3(t)
        w = jnp.floor((d - c) * 65536.0 + 0.5)
        m1 = w - 256.0 * jnp.floor(w / 256.0)
        m2 = (w - m1) / 256.0
        rows.extend([l2, l1, l0, m2, m1])
        scales.append(scale)

    C = len(rows)
    V = jnp.stack(rows, axis=0)                                  # [C, B] f32
    if skip_kr:
        W = jnp.broadcast_to(V.astype(jnp.bfloat16)[:, None, :],
                             (C, L, B)).reshape(C * L, B)
        probe = jnp.sum(oh_loT[:, :128])  # keep oh_lo alive
    elif bf16_mult:
        W = (V.astype(jnp.bfloat16)[:, None, :]
             * oh_loT.astype(jnp.bfloat16)[None, :, :]).reshape(C * L, B)
        probe = 0.0
    else:
        W = (V[:, None, :] * oh_loT[None, :, :]).astype(jnp.bfloat16)
        W = W.reshape(C * L, B)                                  # [CL, B]
        probe = 0.0
    if skip_dot:
        out = (jnp.zeros((H, C * L), jnp.float32)
               + jnp.sum(W[:, :128].astype(jnp.float32), axis=1)[None, :]
               + jnp.sum(oh_hiT[:, :128].astype(jnp.float32), axis=1)[:, None])
    else:
        out = jax.lax.dot_general(oh_hiT, W, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [H, CL]
    out = out + probe * 0.0

    # factor vector [1, C*L] built 2-D (Mosaic rejects 1-D reshapes): each
    # lane's channel id = lane >> log2(L); select the per-channel factor
    ch_id = jax.lax.broadcasted_iota(jnp.int32, (1, C * L), 1) >> shift
    fvec = jnp.zeros((1, C * L), jnp.float32)
    for c in range(n_static):
        fvec = jnp.where(ch_id == c, 1.0, fvec)
    for a in range(n_float):
        scale = scales[a]
        f23 = scale * jnp.float32(2.0) ** -23
        f39 = scale * jnp.float32(2.0) ** -39
        factors = (f23 * 65536.0, f23 * 256.0, f23, f39 * 256.0, f39)
        for k in range(5):
            fvec = jnp.where(ch_id == n_static + a * 5 + k, factors[k], fvec)
    x = out * fvec
    acc = acc_ref[:]
    err = err_ref[:]
    h, l = pg._two_sum(acc, x)
    e = err + l
    acc2, err2 = pg._two_sum(h, e)
    acc_ref[:] = acc2
    err_ref[:] = err2


def fused_factored(idx, static_channels, float_pairs, G, L=8, block=BLOCK,
                   **kw):
    n_static = len(static_channels)
    n_float = len(float_pairs)
    C = n_static + 5 * n_float
    shift = int(np.log2(L))
    H = -(-(G + 1) // L)
    H = max(-(-H // 8) * 8, 8)
    N_ = idx.shape[0]
    n_pad = -(-max(N_, block) // block) * block - N_
    drop = G  # one past the real grid; hi digit G//L < H

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
        inputs.append(pad(hi.astype(jnp.float32)))
        inputs.append(pad(lo.astype(jnp.float32)) if lo is not None
                      else jnp.zeros(N_ + n_pad, jnp.float32))
    nb = inputs[0].shape[0] // block

    kernel = functools.partial(_fact_kernel, n_static=n_static,
                               n_float=n_float, H=H, L=L, shift=shift, **kw)
    with jax.enable_x64(False):
        acc, err = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * len(inputs),
            out_specs=[pl.BlockSpec((H, C * L), lambda i: (0, 0)),
                       pl.BlockSpec((H, C * L), lambda i: (0, 0))],
            out_shape=[jax.ShapeDtypeStruct((H, C * L), jnp.float32),
                       jax.ShapeDtypeStruct((H, C * L), jnp.float32)],
        )(*inputs)
    total = acc.astype(jnp.float64) + err.astype(jnp.float64)    # [H, C*L]
    total = total.reshape(H, C, L).transpose(1, 0, 2).reshape(C, H * L)
    static_sums = total[:n_static, :G]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        t = total[n_static:, :G].reshape(n_float, 5, G).sum(axis=1)
        float_sums = t
    return static_sums, float_sums


def make_run_factored(L, block=BLOCK, **kw):
    @jax.jit
    def run(idx, ones, hi, lo):
        def body(i, acc):
            s, f = fused_factored(idx ^ i, [ones], [(hi, lo)], G, L=L,
                                  block=block, **kw)
            return acc + s[0, 0] + f[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return run


def make_run_current(block=BLOCK, count_only=False):
    @jax.jit
    def run(idx, ones, hi, lo):
        def body(i, acc):
            fp = [] if count_only else [(hi, lo)]
            s, f = pg.fused_additive_channels(idx ^ i, [ones], fp, G,
                                              block=block)
            return acc + s[0, 0] + (f[0, 0] if not count_only else 0.0)
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return run


def check_correct():
    idx, ones, hi, lo = make_inputs()
    s0, f0 = pg.fused_additive_channels(idx, [ones], [(hi, lo)], G)
    s1, f1 = fused_factored(idx, [ones], [(hi, lo)], G, L=8)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-12)
    # oracle
    counts = np.bincount(np.asarray(idx), minlength=G)
    np.testing.assert_allclose(np.asarray(s1[0]), counts)
    sums = np.bincount(np.asarray(idx), weights=np.asarray(hi).astype(np.float64)
                       + np.asarray(lo).astype(np.float64), minlength=G)
    np.testing.assert_allclose(np.asarray(f1[0]), sums, rtol=1e-9)
    print("  factored == current == oracle OK")


VARIANTS = {
    "current": lambda: run_current,
    "current32k": lambda: make_run_current(block=32768),
    "current_c1": lambda: make_run_current(count_only=True),
    "onehot": lambda: run_onehot,
    "dot": lambda: run_dot,
    "factored": lambda: make_run_factored(8),
    "factored4": lambda: make_run_factored(4),
    "factored16": lambda: make_run_factored(16),
    "factored32k": lambda: make_run_factored(8, block=32768),
    "fact_nodot": lambda: make_run_factored(8, skip_dot=True),
    "fact_nokr": lambda: make_run_factored(8, skip_kr=True),
    "fact_bf16": lambda: make_run_factored(8, bf16_mult=True),
    "fact_nodot_nokr": lambda: make_run_factored(8, skip_dot=True,
                                                 skip_kr=True),
}


def main():
    names = sys.argv[1:] or ["current", "onehot", "dot", "factored"]
    idx, ones, hi, lo = make_inputs()
    if "check" in names:
        check_correct()
        names.remove("check")
    for name in names:
        print(f"{name}:")
        fn = VARIANTS[name]()
        timeit(fn, idx, ones, hi, lo)


if __name__ == "__main__":
    main()
