"""Non-interactive query runner — the ``joern --script`` analog.

The reference's console executes scripts / named queries against a stored
CPG (``console/BridgeBase.scala:26-30,137,418``); the engine's equivalent
surface is every registered ``queries()`` pipeline, runnable by name from
the command line against any sf directory:

    python scripts/query_cli.py kg_findings --sf /root/testdata/sf0.01 \
        --out /tmp/findings.parquet
    python scripts/query_cli.py --list

Prints the first rows and the row count; ``--out`` writes the full result
to Parquet (a Dataset result is written distributed, never collected).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() entry name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="write full result to this Parquet path")
    ap.add_argument("--head", type=int, default=5)
    ap.add_argument("--list", action="store_true", dest="list_queries")
    args = ap.parse_args()

    import __ray_entry__ as E
    qs = E.queries()
    if args.list_queries or not args.query:
        oracles = set(E.oracle_sql())
        for name in qs:
            print(f"{name}{'  [sql-oracle]' if name in oracles else ''}")
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; --list shows all",
              file=sys.stderr)
        return 2

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        res = qs[args.query](args.sf)
        import pandas as pd
        import pyarrow as pa

        import ray.data
        if isinstance(res, ray.data.Dataset):
            if args.out:
                res.write_parquet(args.out)
                print(f"wrote {args.out}")
            head = res.take(args.head)
            n = res.count()
            print(pd.DataFrame(head))
        else:
            df = (res.to_pandas() if isinstance(res, pa.Table) else res)
            if args.out:
                pa.parquet.write_table(
                    pa.Table.from_pandas(df), args.out)
                print(f"wrote {args.out}")
            n = len(df)
            print(df.head(args.head))
        print(f"[{args.query}] {n} rows")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
