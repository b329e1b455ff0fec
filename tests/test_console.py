"""Interactive console + HTTP server (the BridgeBase REPL/--server analog)."""

import io
import json
import threading
import urllib.request

import pyarrow as pa

from joern_ray.console import Console, make_server, repl


def _registry(sf_small):
    """A small real slice of the query registry (avoids importing the full
    __ray_entry__ module from inside the package tests)."""
    import ray

    def kg_turns(sf_dir):
        from joern_ray import synth
        return ray.data.read_parquet(synth.transcripts_path(sf_dir)) \
            .select_columns(["conv_id", "turn_idx", "role"])

    def tiny_table(sf_dir):
        return pa.table({"a": [1, 2, 3]})

    return {"kg_turns": kg_turns, "tiny": tiny_table}


def _console(sf_small):
    return Console(_registry(sf_small),
                   {"kg_turns": "SELECT 1"}, sf_dir=sf_small)


def test_console_ls_run_schema_count(ray_session, sf_small):
    con = _console(sf_small)
    ls = con.cmd_ls()
    assert "kg_turns  [sql-oracle]" in ls and "tiny  [rows-only]" in ls
    assert con.cmd_ls("kg") == "kg_turns  [sql-oracle]"

    out, stop = con.execute("run kg_turns 5")
    assert not stop and "5 row(s)" in out and "conv_id" in out

    out, _ = con.execute("schema kg_turns")
    assert "conv_id: string" in out and "turn_idx:" in out

    out, _ = con.execute("count tiny")
    assert out == "tiny: 3 rows"

    out, _ = con.execute("oracle kg_turns")
    assert out == "SELECT 1"


def test_console_limit_bounds_result(ray_session, sf_small):
    con = _console(sf_small)
    from joern_ray.console import _to_table
    tbl = _to_table(con.registry["kg_turns"](sf_small), 7)
    assert tbl.num_rows == 7


def test_console_sql_and_errors(ray_session, sf_small):
    con = _console(sf_small)
    out, _ = con.execute("sql SELECT count(*) AS n FROM documents")
    assert "n" in out
    out, stop = con.execute("run nope")
    assert not stop and "unknown query" in out
    out, _ = con.execute("frobnicate")
    assert "unknown command" in out
    out, _ = con.execute("sql SELECT broken syntax FROM")
    assert out.startswith("error:")          # surfaced, not raised
    out, stop = con.execute("exit")
    assert stop


def test_repl_loop_drives_commands(ray_session, sf_small):
    con = _console(sf_small)
    stdin = io.StringIO("ls\ncount tiny\nexit\n")
    stdout = io.StringIO()
    repl(con, stdin=stdin, stdout=stdout)
    text = stdout.getvalue()
    assert "kg_turns" in text and "tiny: 3 rows" in text


def test_http_server_queries_and_run(ray_session, sf_small):
    con = _console(sf_small)
    srv = make_server(con, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/queries", timeout=30) as r:
            body = json.loads(r.read())
        assert body["queries"] == ["kg_turns", "tiny"]
        assert body["oracle_backed"] == ["kg_turns"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/run?name=tiny&limit=2",
                timeout=30) as r:
            body = json.loads(r.read())
        assert body["rows"] == [{"a": 1}, {"a": 2}]
        assert body["schema"] == {"a": "int64"}

        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/run?name=nope", timeout=30)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_console_stage_runner(ray_session, sf_small, tmp_path):
    """The run.<overlay> analog (``console/Run.scala:1-104``): invoke a
    registered Stage by name from the console — deps toposort+execute;
    a workspace dir checkpoints each stage through the Manifest so a
    re-run SKIPS completed stages (the overlays-ledger discipline)."""
    con = _console(sf_small)

    out, _ = con.execute("stages")
    for name in ("triples_surface", "entities", "triples_canonical",
                 "nodes", "edges"):
        assert name in out
    assert "deps:" in out

    out, _ = con.execute("stage entities '' 5")
    assert "stage entities @" in out and "row(s)" in out
    assert "kind" in out          # entities schema column

    # unknown stage is a user error, not an exception
    out, _ = con.execute("stage nope")
    assert "unknown stage" in out

    # workspace mode: second run resumes from the manifest checkpoints
    ws = str(tmp_path / "ws")
    out1, _ = con.execute(f"stage triples_surface {ws} 3")
    assert "3 row(s)" in out1
    import os
    ledger = os.path.join(ws, "_manifest", "triples_surface.json")
    assert os.path.exists(ledger)
    before = os.path.getmtime(ledger)
    out2, _ = con.execute(f"stage triples_surface {ws} 3")
    assert "3 row(s)" in out2
    # skip-completed: the ledger record was not rewritten on re-run
    assert os.path.getmtime(ledger) == before
