import cProfile, pstats, io, time
import numpy as np

N = 1_000_000; K = 100
rng = np.random.default_rng(42)
keys = rng.integers(0, K, N).astype(np.int64)
x = rng.random(N)

import vaex_tpu as vt
from vaex_tpu import cache

df = vt.from_arrays(i1=keys, x=x)
df = df.categorize("i1", labels=list(range(K)))
df = df.to_device()
df._tile_rows = 1 << 22

with cache.off():
    t0 = time.perf_counter()
    df.sum("x", binby=["i1"])  # warm
    print(f"warm: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    df.sum("x", binby=["i1"])
    print(f"second: {time.perf_counter()-t0:.3f}s", flush=True)
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(5):
        df.sum("x", binby=["i1"])
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue(), flush=True)
