"""Round-4 candidate: factored channels kernel (H x L grid split,
2-D select-built Khatri-Rao rhs, one small-tile MXU dot).

python benchmarks/kern_micro3.py [check] [fact2 fact2_h32 fact2_b16k current]
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

N = 1 << 25
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
    float(np.asarray(fn(*args)))
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rows = N * REPS
    print(f"  {rows / best / 1e9:8.2f} G rows/s   {best * 1e3:8.1f} ms "
          f"  {best / rows * 1e9:6.3f} ns/row", flush=True)


def _fact2_kernel(idx_ref, *rest, n_static, n_float, H, L, shift):
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
    oh_hiT = (bins_h == hi_d[None, :]).astype(jnp.bfloat16)       # [H, B]
    bins_l = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)
    oh_loT = (bins_l == lo_d[None, :]).astype(jnp.bfloat16)       # [L, B]

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
    # rhs [(c, l), b]: channel value where the lo-digit matches, else 0 —
    # per channel one 2-D bf16 multiply against the lo one-hot (exact:
    # {0,1} x integer-valued limbs <= 256; no 3-D broadcast relayouts)
    W = jnp.concatenate(
        [oh_loT * r.astype(jnp.bfloat16)[None, :] for r in rows],
        axis=0)                                                   # [C*L, B]
    out = jax.lax.dot_general(oh_hiT, W, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [H, CL]

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


def fused_factored2(idx, static_channels, float_pairs, G, L=8, block=BLOCK):
    n_static = len(static_channels)
    n_float = len(float_pairs)
    C = n_static + 5 * n_float
    shift = int(np.log2(L))
    H = max(-(-(-(-(G + 1) // L)) // 8) * 8, 8)
    N_ = idx.shape[0]
    n_pad = -(-max(N_, block) // block) * block - N_
    drop = G

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

    kernel = functools.partial(_fact2_kernel, n_static=n_static,
                               n_float=n_float, H=H, L=L, shift=shift)
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
    total = acc.astype(jnp.float64) + err.astype(jnp.float64)     # [H, C*L]
    total = total.reshape(H, C, L).transpose(1, 0, 2).reshape(C, H * L)
    static_sums = total[:n_static, :G]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        float_sums = total[n_static:, :G].reshape(n_float, 5, G).sum(axis=1)
    return static_sums, float_sums


def make_run(L=8, block=BLOCK):
    @jax.jit
    def run(idx, ones, hi, lo):
        def body(i, acc):
            s, f = fused_factored2(idx ^ i, [ones], [(hi, lo)], G, L=L,
                                   block=block)
            return acc + s[0, 0] + f[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return run


def make_run_current(block=BLOCK):
    @jax.jit
    def run(idx, ones, hi, lo):
        def body(i, acc):
            s, f = pg.fused_additive_channels(idx ^ i, [ones], [(hi, lo)], G,
                                              block=block)
            return acc + s[0, 0] + f[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return run


def check():
    idx, ones, hi, lo = make_inputs()
    s0, f0 = pg.fused_additive_channels(idx, [ones], [(hi, lo)], G)
    for L in (4, 8):
        s1, f1 = fused_factored2(idx, [ones], [(hi, lo)], G, L=L)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-12)
    counts = np.bincount(np.asarray(idx), minlength=G)
    np.testing.assert_allclose(np.asarray(s1[0]), counts)
    print("  fact2 == current == oracle OK", flush=True)


VARIANTS = {
    "current": lambda: make_run_current(),
    "fact2": lambda: make_run(L=8),
    "fact2_h32": lambda: make_run(L=4),
    "fact2_b16k": lambda: make_run(L=8, block=16384),
    "fact2_b32k": lambda: make_run(L=8, block=32768),
}


def main():
    names = sys.argv[1:] or ["check", "fact2", "fact2_h32", "fact2_b16k"]
    idx, ones, hi, lo = make_inputs()
    if "check" in names:
        check()
        names.remove("check")
    for name in names:
        print(f"{name}:", flush=True)
        try:
            timeit(VARIANTS[name](), idx, ones, hi, lo)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()


def make_run_current_vmem(block):
    """Current flat channels kernel with a raised one-hot VMEM cap."""
    import vaex_tpu.ops.pallas_gridagg as _pg

    @jax.jit
    def run(idx, ones, hi, lo):
        def body(i, acc):
            s, f = _fused_channels_bigblock(idx ^ i, [ones], [(hi, lo)], G,
                                            block=block)
            return acc + s[0, 0] + f[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)
    return run


def _fused_channels_bigblock(idx, static_channels, float_pairs, G, block):
    """fused_additive_channels with the VMEM block cap lifted (v5e has far
    more physical VMEM than the conservative 8MB one-hot budget)."""
    n_static = len(static_channels)
    n_float = len(float_pairs)
    g_pad = max(-(-(G + 1) // 128) * 128, 128)
    N_ = idx.shape[0]
    n_pad = -(-max(N_, block) // block) * block - N_

    def pad(a, fill=0.0):
        if n_pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])

    idx = jnp.where(idx >= G, g_pad - 1, idx).astype(jnp.int32)
    idx = pad(idx, g_pad - 1)
    inputs = [idx]
    for ch in static_channels:
        inputs.append(pad(ch.astype(jnp.float32)))
    for hi, lo in float_pairs:
        inputs.append(pad(hi.astype(jnp.float32)))
        inputs.append(pad(lo.astype(jnp.float32)) if lo is not None
                      else jnp.zeros(N_ + n_pad, jnp.float32))
    nb = inputs[0].shape[0] // block
    cs_pad = 8
    af_pad = 8
    kernel = functools.partial(pg._channels_kernel, n_static=n_static,
                               n_float=n_float, g_pad=g_pad)
    vmem = min(block * g_pad * 2 * 2 + (8 << 20), 120 << 20)
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
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        )(*inputs)
    static_sums = (acc_s.astype(jnp.float64) + err_s.astype(jnp.float64))[:n_static, :G]
    float_sums = jnp.zeros((n_float, G), jnp.float64)
    if n_float:
        tot = acc_f.astype(jnp.float64) + err_f.astype(jnp.float64)
        tot = tot[:n_float * 5, :G]
        float_sums = tot.reshape(n_float, 5, G).sum(axis=1)
    return static_sums, float_sums


VARIANTS["cur_b32k"] = lambda: make_run_current_vmem(32768)
VARIANTS["cur_b64k"] = lambda: make_run_current_vmem(65536)
VARIANTS["cur_b128k"] = lambda: make_run_current_vmem(131072)
