"""H2O db-benchmark groupby questions Q1-Q10
(reference: benchmarks/groupbyh2o.py:15-93; the reference itself leaves
q6/q8/q9 commented out — here they run with the standard H2O semantics:
q6 median+sd, q8 largest-two, q9 corr^2).

Run: python benchmarks/groupbyh2o.py [--n 1e7] [--check]
Prints per-question timing; with --check validates EVERY answer against a
pandas oracle (int sums exact, float aggregates to tolerance, median to
histogram resolution).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from benchmarks.fixtures import h2o  # noqa: E402


def questions(vt):
    a = vt.agg
    return {
        "q1": lambda df: df.groupby(["id1"], agg={"v1": "sum"}),
        "q2": lambda df: df.groupby(["id1", "id2"], agg={"v1": "sum"}),
        "q3": lambda df: df.groupby(["id3"], agg={"v1": "sum", "v3": a.mean("v3")}),
        "q4": lambda df: df.groupby(["id4"], agg={"v1": a.mean("v1"), "v2": a.mean("v2"),
                                                  "v3": a.mean("v3")}),
        "q5": lambda df: df.groupby(["id6"], agg={"v1": "sum", "v2": "sum", "v3": "sum"}),
        "q6": lambda df: df.groupby(["id4", "id5"],
                                    agg={"median_v3": a.median_approx("v3"),
                                         "sd_v3": a.std("v3", ddof=1)}),
        "q7": lambda df: df.groupby(["id3"], agg={"max_v1": a.max("v1"),
                                                  "min_v2": a.min("v2")}),
        "q8": lambda df: df.groupby(["id6"],
                                    agg={"largest1_v3": a.nth_largest("v3", 0),
                                         "largest2_v3": a.nth_largest("v3", 1)}),
        "q9": lambda df: df.groupby(["id2", "id4"], agg={"r2": a.corr("v1", "v2")}),
        "q10": lambda df: df.groupby(["id1", "id2", "id3", "id4", "id5", "id6"],
                                     agg={"v3": "sum", "v1": "count"}),
    }


def pandas_oracle(pdf, q):
    """The same queries in pandas; returns (key_columns, value_frame)."""
    if q == "q1":
        out = pdf.groupby("id1", as_index=False)["v1"].sum()
        return ["id1"], out
    if q == "q2":
        out = pdf.groupby(["id1", "id2"], as_index=False)["v1"].sum()
        return ["id1", "id2"], out
    if q == "q3":
        g = pdf.groupby("id3", as_index=False)
        out = g.agg(v1=("v1", "sum"), v3=("v3", "mean"))
        return ["id3"], out
    if q == "q4":
        out = pdf.groupby("id4", as_index=False).agg(
            v1=("v1", "mean"), v2=("v2", "mean"), v3=("v3", "mean"))
        return ["id4"], out
    if q == "q5":
        out = pdf.groupby("id6", as_index=False).agg(
            v1=("v1", "sum"), v2=("v2", "sum"), v3=("v3", "sum"))
        return ["id6"], out
    if q == "q6":
        out = pdf.groupby(["id4", "id5"], as_index=False).agg(
            median_v3=("v3", "median"), sd_v3=("v3", "std"))
        return ["id4", "id5"], out
    if q == "q7":
        out = pdf.groupby("id3", as_index=False).agg(
            max_v1=("v1", "max"), min_v2=("v2", "min"))
        return ["id3"], out
    if q == "q8":
        g = pdf.groupby("id6")["v3"]
        out = g.agg(largest1_v3="max",
                    largest2_v3=lambda s: s.nlargest(2).iloc[-1]).reset_index()
        return ["id6"], out
    if q == "q9":
        out = pdf.groupby(["id2", "id4"]).apply(
            lambda g: g["v1"].corr(g["v2"])).rename("r2").reset_index()
        return ["id2", "id4"], out
    if q == "q10":
        out = pdf.groupby(["id1", "id2", "id3", "id4", "id5", "id6"],
                          as_index=False).agg(v3=("v3", "sum"), v1=("v1", "count"))
        return ["id1", "id2", "id3", "id4", "id5", "id6"], out
    return None, None


# value-column comparison tolerances per question (int sums/counts exact;
# float sums/means/corr to float64 roundoff; median to histogram resolution)
TOLERANCES = {
    "q1": {"v1": 0}, "q2": {"v1": 0},
    "q3": {"v1": 0, "v3": 1e-9},
    "q4": {"v1": 1e-12, "v2": 1e-12, "v3": 1e-9},
    "q5": {"v1": 0, "v2": 0, "v3": 1e-9},
    # median is EXACT (one carried (cell, value) sort, agg.py
    # OpPercentileExact — the reference is approx-only).  sd moments ride
    # exact per-segment sums where the sort path exists (CPU passes 1e-9);
    # the TPU two-level moment kernel for cartesian grids carries the
    # library's ~1e-6-relative float contract (measured 4e-8 at 3e5 rows)
    "q6": {"median_v3": 1e-9, "sd_v3": 1e-6},
    "q7": {"max_v1": 0, "min_v2": 0},
    "q8": {"largest1_v3": 0, "largest2_v3": 0},
    "q9": {"r2": 1e-9},
    # q10's fused one-sort path sums v3 by cumsum differences: error scales
    # with the running total (~eps * N * mean|v|), the library's documented
    # ~1e-6-relative float contract — not the 1e-9 of the exact-limb kernels
    "q10": {"v3": 1e-6, "v1": 0},
}


def check_question(df, q, out):
    keys, oracle = pandas_oracle(df.to_pandas_df(), q)
    if oracle is None:
        return
    got = out.sort(keys).to_pandas_df().reset_index(drop=True)
    oracle = oracle.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(oracle), f"{q}: {len(got)} groups != oracle {len(oracle)}"
    for k in keys:
        np.testing.assert_array_equal(got[k].to_numpy(), oracle[k].to_numpy(),
                                      err_msg=f"{q} key {k}")
    for col, tol in TOLERANCES[q].items():
        g = got[col].to_numpy(dtype="f8")
        o = oracle[col].to_numpy(dtype="f8")
        if tol == 0:
            np.testing.assert_array_equal(g, o, err_msg=f"{q} col {col}")
        elif col.startswith("median"):
            np.testing.assert_allclose(g, o, atol=tol, err_msg=f"{q} col {col}")
        else:
            np.testing.assert_allclose(g, o, rtol=tol, atol=tol, err_msg=f"{q} col {col}")
    print(f"  {q} matches pandas oracle ({len(oracle):,} groups)", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=float, default=1e7)
    parser.add_argument("--check", action="store_true")
    parser.add_argument("--device", action="store_true", help="stage data in HBM")
    parser.add_argument("--device-gen", action="store_true",
                        help="generate the table directly in HBM (a 1e8-row "
                             "upload through a tunneled chip measures the "
                             "network, not the engine)")
    parser.add_argument("--q", default=None, help="comma-separated question subset, e.g. q7,q10")
    parser.add_argument("--cross-check", action="store_true",
                        help="re-run each question with the fused one-sort "
                             "path disabled and compare (independent engine "
                             "strategies; usable at 1e8 where a pandas "
                             "oracle cannot ship through the tunnel)")
    args = parser.parse_args()

    import vaex_tpu as vt
    from vaex_tpu import cache

    n = int(args.n)
    if args.device_gen:
        import jax
        import jax.numpy as jnp
        ks = jax.random.split(jax.random.PRNGKey(42), 9)
        k = 100

        # int32 storage at n >= 1e8: the 9-column all-int64 table alone is
        # 7.2 GB of 16 GB HBM; values are identical (ids <= 1e6, v1/v2 tiny)
        # and the q10 span PRODUCT (1e20 > 2^62) still forces the unpacked
        # multi-key path, so the shape parity is unchanged
        wide = jnp.int32 if n >= 50_000_000 else jnp.int64

        def ints(key, lo, hi):
            return jax.random.randint(key, (n,), lo, hi, dtype=jnp.int32).astype(wide)
        df = vt.from_dataset(vt.DatasetArrays({
            "id1": ints(ks[0], 1, k + 1), "id2": ints(ks[1], 1, k + 1),
            "id3": ints(ks[2], 1, n // k + 1), "id4": ints(ks[3], 1, k + 1),
            "id5": ints(ks[4], 1, k + 1), "id6": ints(ks[5], 1, n // k + 1),
            "v1": ints(ks[6], 1, 6), "v2": ints(ks[7], 1, 16),
            "v3": jax.random.uniform(ks[8], (n,), dtype=jnp.float64) * 100,
        }))
    else:
        df = h2o(n)
        if args.device:
            df = df.to_device()
    df._tile_rows = 1 << 22

    results = {}
    subset = set(args.q.split(",")) if args.q else None
    with cache.off():
        for name, fn in questions(vt).items():
            if subset is not None and name not in subset:
                continue
            fn(df)  # warm/compile
            t0 = time.perf_counter()
            out = fn(df)
            dt = time.perf_counter() - t0
            results[name] = {"seconds": dt, "rows_per_s": n / dt, "groups": len(out)}
            print(f"{name}: {dt*1e3:8.1f} ms  {n/dt/1e6:8.1f} M rows/s  "
                  f"({len(out):,} groups)", flush=True)
            if args.check:
                check_question(df, name, out)
            if args.cross_check:
                cross_check(df, name, fn, out)
    print(json.dumps(results))


def cross_check(df, q, fn, out):
    """Strategy cross-validation: the same question with the fused one-sort
    path disabled must agree (ints/counts/extremes exactly, floats 1e-9) —
    two independent code paths bit-checking each other on-device."""
    import os
    os.environ["VAEX_TPU_FUSED_GROUPBY"] = "0"
    try:
        out2 = fn(df)
    except ValueError as e:
        # the classic path cannot express every fused-path shape (int64
        # span-product overflow: only the unpacked multi-key sort runs it)
        print(f"  {q} cross-check skipped: classic path unavailable ({e})",
              flush=True)
        return
    finally:
        os.environ["VAEX_TPU_FUSED_GROUPBY"] = "1"
    cols = out.get_column_names()
    assert len(out) == len(out2), f"{q}: {len(out)} vs {len(out2)} groups"
    keys = [c for c in cols if c.startswith("id")] or cols[:1]
    a = out.sort(keys) if len(out) else out
    b = out2.sort(keys) if len(out2) else out2
    for col in cols:
        va = np.asarray(a.evaluate(col, array_type="numpy"), dtype="f8")
        vb = np.asarray(b.evaluate(col, array_type="numpy"), dtype="f8")
        np.testing.assert_allclose(va, vb, rtol=1e-9, atol=1e-9,
                                   err_msg=f"{q} col {col} (strategy mismatch)")
    print(f"  {q} strategies agree ({len(out):,} groups)", flush=True)


if __name__ == "__main__":
    main()
