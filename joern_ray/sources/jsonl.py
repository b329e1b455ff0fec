"""Alternative transcript sources — the SourceFiles / InputProvider analog
(``x2cpg/.../SourceFiles.scala:67-96`` recursive discovery with filters;
``pysrc2cpg/Py2Cpg.scala:10-53`` content providers).

Parquet is the canonical format; JSONL covers raw-dump ingestion.  Both
readers land on the same Arrow schema (schema.TRANSCRIPTS), so every
downstream stage is source-agnostic — the X2CpgFrontend plugin discipline.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from .. import schema as S


def read_transcripts_parquet(path: str, *, conv_prefix: str | None = None
                             ) -> "ray.data.Dataset":
    """Column-complete parquet read; optional conv_id prefix pushdown (the
    ignore-regex/allowlist analog, applied at the read)."""
    ds = ray.data.read_parquet(path)
    if conv_prefix is not None:
        import pyarrow.compute as pc
        ds = ds.map_batches(
            lambda t: t.filter(pc.starts_with(t.column("conv_id"),
                                              conv_prefix)),
            batch_format="pyarrow")
    return ds


def _cast_to_canonical(t: pa.Table) -> pa.Table:
    cols = []
    for f in S.TRANSCRIPTS:
        c = t.column(f.name) if f.name in t.schema.names else \
            pa.nulls(t.num_rows, f.type)
        if f.name == "ts" and pa.types.is_integer(c.type):
            c = c.cast(pa.int64()).cast(pa.timestamp("us"))
        else:
            c = c.cast(f.type)
        cols.append(c)
    return pa.Table.from_arrays(cols, schema=S.TRANSCRIPTS)


def read_transcripts_jsonl(path: str) -> "ray.data.Dataset":
    """JSONL → transcript Dataset cast to the canonical Arrow schema
    (ts parsed from ISO-8601 or microseconds-since-epoch int)."""
    return ray.data.read_json(path).map_batches(
        _cast_to_canonical, batch_format="pyarrow")


def read_transcripts_csv(path: str) -> "ray.data.Dataset":
    """CSV → transcript Dataset on the canonical schema (same frontend
    discipline: any source lands on schema.TRANSCRIPTS; empty strings in
    nullable columns become nulls)."""
    import pyarrow.compute as pc

    def cast(t: pa.Table) -> pa.Table:
        if "tool" in t.schema.names and \
                pa.types.is_string(t.column("tool").type):
            tool = t.column("tool")
            t = t.set_column(t.schema.get_field_index("tool"), "tool",
                             pc.if_else(pc.equal(tool, ""),
                                        pa.nulls(t.num_rows, pa.string()),
                                        tool))
        return _cast_to_canonical(t)
    return ray.data.read_csv(path).map_batches(cast, batch_format="pyarrow")
