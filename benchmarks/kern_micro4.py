"""Round-4 q10 sort-floor experiments (VERDICT r4 #4).

Measures the primitives the fused one-sort groupby is built from, plus
candidate reformulations, at q10 scale (N=1e7, near-unique keys):

  sort1   carried sort (i64 key + f64 channel)        [the 56 ms floor]
  sort2   the same key split as two i32 sort keys
  comp1   compaction: stable sort (flag, key, rows, csum)
  comp2   compaction: ONE combined i64 key (flag in the top bit)
  batched P=2048 independent sorts of 8192 rows (the per-bucket cost of
          a radix-partitioned sort, excluding relocation)

python benchmarks/kern_micro4.py [names...]
"""

import sys
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 10_000_000
REPS = 4


def make_inputs(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    key = jax.random.randint(k1, (N,), 0, 1 << 62, dtype=jnp.int64)
    v = jax.random.uniform(k2, (N,), dtype=jnp.float64)
    return key, v


def timeit(fn, *args):
    float(np.asarray(fn(*args)))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = (best * 1e3) / REPS
    print(f"  {per:8.1f} ms/op   {N / (best / REPS) / 1e6:8.1f} M rows/s",
          flush=True)


@jax.jit
def sort1(key, v):
    def body(i, acc):
        k, sv = jax.lax.sort((key ^ i, v), num_keys=1)
        return acc + sv[0] + k[0].astype(jnp.float64)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


@jax.jit
def sort2(key, v):
    def body(i, acc):
        k = key ^ i
        hi = (k >> 31).astype(jnp.int32)
        lo = (k & ((1 << 31) - 1)).astype(jnp.int32)
        h, l, sv = jax.lax.sort((hi, lo, v), num_keys=2)
        return acc + sv[0] + h[0].astype(jnp.float64)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


@jax.jit
def comp1(key, v):
    rows = jnp.arange(N, dtype=jnp.int32)

    def body(i, acc):
        k = key ^ i
        flag = (k & 1).astype(jnp.int32)  # ~half ends, like q10
        out = jax.lax.sort((flag, k, rows, v), num_keys=1, is_stable=True)
        return acc + out[3][0] + out[2][0].astype(jnp.float64)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


@jax.jit
def comp2(key, v):
    rows = jnp.arange(N, dtype=jnp.int32)

    def body(i, acc):
        k = key ^ i
        flag = k & 1
        combined = (k >> 1) | (flag << 62)  # flag in the top bit: no
        # stability needed — ends sort first, ordered by key
        out = jax.lax.sort((combined, rows, v), num_keys=1)
        return acc + out[2][0] + out[1][0].astype(jnp.float64)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


@jax.jit
def batched(key, v):
    P, cap = 2048, 8192  # 16.8M slots ~ 1.68x q10's rows (radix slack)
    k2 = jnp.tile(key[: P * cap // 2].reshape(P, cap // 2), (1, 2))
    v2 = jnp.tile(v[: P * cap // 2].reshape(P, cap // 2), (1, 2))

    def body(i, acc):
        sk, sv = jax.lax.sort((k2 ^ i, v2), num_keys=1, dimension=-1)
        return acc + sv[0, 0] + sk[0, 0].astype(jnp.float64)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


VARIANTS = {"sort1": sort1, "sort2": sort2, "comp1": comp1, "comp2": comp2,
            "batched": batched}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    key, v = make_inputs()
    for name in names:
        print(f"{name}:", flush=True)
        try:
            timeit(VARIANTS[name], key, v)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
