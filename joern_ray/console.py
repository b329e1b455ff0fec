"""Interactive console + HTTP server over the query registry.

The analog of the reference's Scala REPL / ``--server`` mode
(``console/BridgeBase.scala:26-30,137,418``): an interactive surface where a
user lists the registered pipelines, runs one against a scale-factor
directory, inspects schemas, and drops to raw SQL over the same parquet
tables the oracles use.  ``scripts/query_cli.py`` remains the
non-interactive ``--script`` analog; this module adds the interactive
(``repl()``) and server (``serve()``) surfaces.

Design constraints:
  * the console never owns a Ray session — the wrapper script
    (``scripts/repl.py``) or the test fixture does, exactly like
    ``__ray_entry__`` (driver contract);
  * results are BOUNDED before they reach the driver/display: ``run``
    applies ``limit`` via ``Dataset.limit`` (streaming, never
    ``take_all``), so an interactive user cannot accidentally
    materialize a 100-TB result;
  * the HTTP server is stdlib ``http.server`` (no new deps), JSON in/out,
    single-threaded by design — it is an operator convenience, not a
    throughput surface.
"""

from __future__ import annotations

import json
import shlex
import time
from typing import Any, Callable

DEFAULT_LIMIT = 20
SERVER_MAX_LIMIT = 10_000


def _to_table(res, limit: int | None):
    """Bound + normalize a query result to a pyarrow Table."""
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            if limit is not None:
                res = res.limit(limit)
            batches = list(res.iter_batches(batch_format="pyarrow"))
            return pa.concat_tables(batches) if batches else pa.table({})
    except ImportError:          # pragma: no cover - ray is always present
        pass
    if isinstance(res, pd.DataFrame):
        tbl = pa.Table.from_pandas(res, preserve_index=False)
    elif isinstance(res, pa.Table):
        tbl = res
    else:
        raise TypeError(f"unsupported query result type: {type(res)!r}")
    return tbl.slice(0, limit) if limit is not None else tbl


class Console:
    """Command interpreter over a query registry.

    ``registry`` maps name -> callable(sf_dir) (the ``queries()`` dict);
    ``oracles`` maps name -> SQL string (``oracle_sql()``), used by the
    ``oracle`` command and to mark entries in ``ls``.
    """

    TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")

    def __init__(self, registry: dict[str, Callable[[str], Any]],
                 oracles: dict[str, str] | None = None,
                 sf_dir: str = "/root/testdata/sf0.001"):
        self.registry = registry
        self.oracles = oracles or {}
        self.sf_dir = sf_dir
        self._duck = None
        self._streg = None       # lazy Stage registry (overlay runner)

    # -- helpers ----------------------------------------------------------
    def _con(self):
        if self._duck is None:
            import os

            import duckdb
            self._duck = duckdb.connect()
            for t in self.TABLES:
                p = os.path.join(self.sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    self._duck.execute(
                        f"CREATE OR REPLACE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
        return self._duck

    def _fmt(self, tbl) -> str:
        df = tbl.to_pandas()
        return df.to_string(index=False, max_rows=50, max_colwidth=60)

    # -- commands ---------------------------------------------------------
    def cmd_ls(self, pattern: str = "") -> str:
        rows = []
        for name in self.registry:
            if pattern and pattern not in name:
                continue
            rows.append(f"{name}  {'[sql-oracle]' if name in self.oracles else '[rows-only]'}")
        return "\n".join(rows) if rows else "(no matching queries)"

    def cmd_run(self, name: str, limit: str | int = DEFAULT_LIMIT) -> str:
        if name not in self.registry:
            return f"unknown query: {name!r} (try: ls)"
        limit = None if str(limit) in ("all", "0") else int(limit)
        t0 = time.perf_counter()
        tbl = _to_table(self.registry[name](self.sf_dir), limit)
        dt = time.perf_counter() - t0
        head = (f"-- {name} @ {self.sf_dir}: showing "
                f"{tbl.num_rows} row(s) in {dt:.2f}s --\n")
        return head + self._fmt(tbl)

    def cmd_count(self, name: str) -> str:
        if name not in self.registry:
            return f"unknown query: {name!r} (try: ls)"
        import pandas as pd
        import pyarrow as pa

        import ray.data
        res = self.registry[name](self.sf_dir)
        if isinstance(res, ray.data.Dataset):
            n = res.count()
        elif isinstance(res, (pa.Table, pd.DataFrame)):
            n = len(res)
        else:
            return f"unsupported result type: {type(res)!r}"
        return f"{name}: {n} rows"

    def cmd_schema(self, name: str) -> str:
        if name not in self.registry:
            return f"unknown query: {name!r} (try: ls)"
        tbl = _to_table(self.registry[name](self.sf_dir), 1)
        return "\n".join(f"{f.name}: {f.type}" for f in tbl.schema)

    def cmd_sql(self, *stmt: str) -> str:
        q = " ".join(stmt)
        tbl = self._con().execute(q).arrow()
        return self._fmt(tbl.slice(0, 200))

    def cmd_oracle(self, name: str) -> str:
        if name not in self.oracles:
            return f"no SQL oracle registered for {name!r}"
        return self.oracles[name]

    # -- overlay runner (the console/Run.scala `run.<overlay>` analog:
    # invoke a registered Stage by name; deps toposort + execute, and an
    # optional workspace dir checkpoints each stage through the Manifest
    # ledger exactly like the reference's per-overlay project dirs) -----
    def _stages(self):
        if self._streg is None:
            from .state.registry import kg_registry
            self._streg = kg_registry()
        return self._streg

    def cmd_stages(self) -> str:
        reg = self._stages()
        rows = []
        for name in reg.names():
            st = reg._stages[name]
            deps = ", ".join(st.deps) or "-"
            rows.append(f"{name}  [deps: {deps}]  {st.description}")
        return "\n".join(rows)

    def cmd_stage(self, name: str, out_dir: str = "",
                  limit: str | int = DEFAULT_LIMIT) -> str:
        """run.<stage>: execute a registered overlay Stage (plus its
        dependency closure) over the current sf_dir's transcripts.  With
        out_dir, stages checkpoint through the Manifest (skip-completed
        resume — the overlays-ledger discipline)."""
        reg = self._stages()
        if name not in reg.names():
            return (f"unknown stage: {name!r} "
                    f"(try: stages; known: {', '.join(reg.names())})")
        import ray.data

        from . import synth
        limit = None if str(limit) in ("all", "0") else int(limit)
        tds = ray.data.read_parquet(synth.transcripts_path(self.sf_dir))
        t0 = time.perf_counter()
        datasets = reg.run({"transcripts": tds}, targets=[name],
                           out_dir=out_dir or None)
        tbl = _to_table(datasets[name], limit)
        dt = time.perf_counter() - t0
        where = f" -> {out_dir}" if out_dir else ""
        head = (f"-- stage {name} @ {self.sf_dir}{where}: showing "
                f"{tbl.num_rows} row(s) in {dt:.2f}s --\n")
        return head + self._fmt(tbl)

    def cmd_cd(self, sf_dir: str) -> str:
        self.sf_dir = sf_dir
        self._duck = None        # re-register views lazily
        return f"sf_dir = {sf_dir}"

    def cmd_help(self) -> str:
        return ("commands:\n"
                "  ls [substr]        list registered queries\n"
                "  run <name> [n|all] run a query, show first n rows "
                f"(default {DEFAULT_LIMIT})\n"
                "  count <name>       full row count (streams; no limit)\n"
                "  schema <name>      result schema\n"
                "  oracle <name>      show the DuckDB oracle SQL\n"
                "  sql <stmt...>      raw DuckDB SQL over the sf tables\n"
                "  stages             list registered overlay stages\n"
                "  stage <name> [out_dir] [n|all]  run an overlay stage "
                "(+ deps; out_dir checkpoints via the manifest)\n"
                "  cd <sf_dir>        switch scale-factor directory\n"
                "  help / exit")

    def execute(self, line: str) -> tuple[str, bool]:
        """Run one command line.  Returns (output, should_exit)."""
        line = line.strip()
        if not line:
            return "", False
        try:
            parts = shlex.split(line)
        except ValueError as e:
            return f"parse error: {e}", False
        cmd, args = parts[0], parts[1:]
        if cmd in ("exit", "quit"):
            return "", True
        fn = getattr(self, f"cmd_{cmd}", None)
        if fn is None:
            return f"unknown command: {cmd!r} (try: help)", False
        try:
            return fn(*args), False
        except TypeError as e:
            return f"usage error: {e}", False
        except Exception as e:                       # surface, don't die
            return f"error: {type(e).__name__}: {e}", False


def repl(console: Console, stdin=None, stdout=None) -> None:
    """Interactive loop (the BridgeBase REPL analog)."""
    import sys
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    stdout.write("joern_ray console — 'help' for commands, 'exit' to quit\n")
    stdout.flush()
    for line in stdin:
        out, stop = console.execute(line)
        if out:
            stdout.write(out + "\n")
        if stop:
            break
        stdout.write("joern> ")
        stdout.flush()


# ---------------------------------------------------------------------------
# HTTP server mode (the --server analog): GET /queries, GET /run?name=&limit=
# ---------------------------------------------------------------------------

def make_server(console: Console, host: str = "127.0.0.1", port: int = 0):
    """Build (not start) an HTTP server over the console.  Returns the
    ``http.server.HTTPServer``; callers drive ``serve_forever`` (script) or
    ``handle_request`` in a thread (tests)."""
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):                    # keep tests quiet
            pass

        def do_GET(self):
            u = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(u.query)
            if u.path == "/queries":
                self._send(200, {
                    "sf_dir": console.sf_dir,
                    "queries": sorted(console.registry),
                    "oracle_backed": sorted(
                        n for n in console.registry
                        if n in console.oracles)})
                return
            if u.path == "/run":
                name = (qs.get("name") or [""])[0]
                if name not in console.registry:
                    self._send(404, {"error": f"unknown query: {name}"})
                    return
                limit = min(int((qs.get("limit") or [DEFAULT_LIMIT])[0]),
                            SERVER_MAX_LIMIT)
                try:
                    tbl = _to_table(console.registry[name](console.sf_dir),
                                    limit)
                except Exception as e:
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._send(200, {
                    "name": name,
                    "rows": tbl.to_pylist(),
                    "schema": {f.name: str(f.type) for f in tbl.schema}})
                return
            self._send(404, {"error": "routes: /queries, /run"})

    return HTTPServer((host, port), Handler)
