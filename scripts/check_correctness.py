"""Local mimic of the round driver's correctness gate.

Runs every __ray_entry__.queries() callable at sf0.01 and compares against
oracle_sql() via DuckDB (row count + schema + order-insensitive values).

Usage: python scripts/check_correctness.py [--artifact PATH] [query ...]

--artifact PATH writes the per-query results as a JSON artifact (the
checked-in ``CORRECTNESS_local_r{N}.json`` — the inspectable record of
the local gate over EVERY oracle-backed entry, including the ones past
the driver's 50-slot window).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    def _fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                      f"read_parquet('{SF}/{t}.parquet')")
        return c

    con = _fresh_con()

    qs = E.queries()
    oracles = E.oracle_sql()
    args = sys.argv[1:]
    artifact = None
    if "--artifact" in args:
        i = args.index("--artifact")
        artifact = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(SF))
        except Exception as ex:
            print(f"[FAIL-run ] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            results[name] = {"kind": "error", "err": f"{type(ex).__name__}: {ex}"}
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, "
                  f"{len(got.columns)} cols ({dt:.1f}s)")
            if len(got) == 0 and name != "embedding_neardup":
                print(f"           WARNING: zero rows")
            results[name] = {"kind": "rows-only", "rows": len(got),
                             "cols": len(got.columns),
                             "secs": round(dt, 2)}
            continue
        try:
            try:
                want = con.execute(oracles[name]).fetchdf()
            except duckdb.IOException:
                # transient EMFILE observed when DuckDB re-opens a view's
                # parquet right after a many-operator Ray job — one retry
                # after a breather has always cleared it
                import gc
                gc.collect()
                time.sleep(2.0)
                want = con.execute(oracles[name]).fetchdf()
            except duckdb.OutOfMemoryException:
                # the shared connection's allocator fragments over 100+
                # oracle runs and can fail a big query that passes in
                # isolation — retry once on a FRESH connection
                import gc
                con.close()
                gc.collect()
                con = _fresh_con()
                want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"[FAIL-sql ] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            results[name] = {"kind": "error",
                             "err": f"sql: {type(ex).__name__}: {ex}"}
            continue
        g, w = normalize(got), normalize(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == list(w.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[:6]
        results[name] = {"kind": "oracle", "rows": len(g),
                         "oracle_rows": len(w), "rows_match": ok_rows,
                         "schema_match": ok_cols, "values_match": ok_vals,
                         "secs": round(dt, 2)}
        if ok_rows and ok_cols and ok_vals:
            print(f"[OK       ] {name}: {len(g)} rows match ({dt:.1f}s)")
        else:
            print(f"[MISMATCH ] {name}: rows {len(g)} vs {len(w)}, "
                  f"cols {list(g.columns)} vs {list(w.columns)}")
            if ok_rows and ok_cols:
                print("            " + " / ".join(detail))
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    if artifact:
        import json
        with open(artifact, "w") as f:
            json.dump({"sf": SF, "failures": failures,
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"artifact -> {artifact}")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray
    ray.shutdown()
    sys.exit(code)
