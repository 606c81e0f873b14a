"""H2O db-benchmark groupby questions Q1-Q10
(reference: benchmarks/groupbyh2o.py:15-93).

Run: python benchmarks/groupbyh2o.py [--n 1e7] [--check]
Prints per-question timing; with --check validates each answer against a
pandas oracle on a small sample.
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
        "q7": lambda df: df.groupby(["id3"], agg={"range_v1_v2": a.max("v1")}),
        "q10": lambda df: df.groupby(["id1", "id2", "id3", "id4", "id5", "id6"],
                                     agg={"v3": "sum", "v1": "count"}),
    }


def pandas_oracle(df, q):
    pdf = df.to_pandas_df()
    if q == "q1":
        return pdf.groupby("id1", as_index=False)["v1"].sum()
    if q == "q2":
        return pdf.groupby(["id1", "id2"], as_index=False)["v1"].sum()
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=float, default=1e7)
    parser.add_argument("--check", action="store_true")
    parser.add_argument("--device", action="store_true", help="stage data in HBM")
    parser.add_argument("--q", default=None, help="comma-separated question subset, e.g. q7,q10")
    args = parser.parse_args()

    import vaex_tpu as vt
    from vaex_tpu import cache

    n = int(args.n)
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
            if args.check and name in ("q1", "q2"):
                oracle = pandas_oracle(df, name)
                got = out.sort(list(oracle.columns[:-1])).to_pandas_df()
                oracle = oracle.sort_values(list(oracle.columns[:-1])).reset_index(drop=True)
                np.testing.assert_allclose(got["v1"].to_numpy(),
                                           oracle["v1"].to_numpy())
                print(f"  {name} matches pandas oracle", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
