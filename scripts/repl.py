"""Interactive console / HTTP server entry point.

The ``joern`` REPL / ``joern --server`` analog
(``console/BridgeBase.scala:26-30,137,418``) over the Ray-Data query
registry.  ``scripts/query_cli.py`` stays the non-interactive
``--script`` analog.

    python scripts/repl.py [--sf-dir DIR]            # interactive
    python scripts/repl.py --server [--port 8080]    # HTTP mode
    python scripts/repl.py -c "run kg_nodes 5"       # one-shot command
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--server", action="store_true",
                    help="serve HTTP instead of an interactive loop")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", dest="command", default=None,
                    help="run one console command and exit")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as E

    from joern_ray.console import Console, make_server, repl
    con = Console(E.queries(), E.oracle_sql(), sf_dir=args.sf_dir)

    try:
        if args.command is not None:
            out, _ = con.execute(args.command)
            print(out)
        elif args.server:
            srv = make_server(con, args.host, args.port)
            print(f"serving on http://{args.host}:{srv.server_address[1]} "
                  "(GET /queries, GET /run?name=&limit=)")
            srv.serve_forever()
        else:
            print("joern> ", end="", flush=True)
            repl(con)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
