"""Text-analysis + deduplication pack over the ``documents`` table.

Large-scale training-data pipeline operators: token counting, quality
signals, language-ID heuristic, document fingerprinting, exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dup.  All per-document signals
are vectorized Arrow kernels; near-dup blocking reuses the engine's LSH
machinery (joern_ray.functions.hashing).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from ..functions import hashing as H

_STOPWORD_RE = r"\b(the|a|of|and)\b"
_WS_RE = r"\s+"

# ASCII whitespace set == RE2's \s class [\t\n\f\r ] (both Arrow and DuckDB
# regex kernels are RE2): trimming with THIS set keeps the engine's trim and
# the oracle's SQL trim byte-for-byte aligned on tab/newline-padded dirty
# input, where utf8_trim_whitespace (Unicode) vs SQL trim (space only)
# silently diverge.
TRIM_CHARS = " \t\n\f\r"


def ascii_trim(col):
    return pc.utf8_trim(col, TRIM_CHARS)


def _p(sf_dir: str, table: str = "documents") -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _tidy(ds):
    return ds.repartition(4)


# ---------------------------------------------------------------------------
# per-document signals (SQL-checkable: integer/string outputs only)
# ---------------------------------------------------------------------------

def text_stats(sf_dir: str):
    """doc_id → token count, char count, stopword hits, digit chars."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t.column("text")
        trimmed = ascii_trim(text)
        seps = pc.count_substring_regex(trimmed, _WS_RE)
        n_tokens = pc.if_else(pc.equal(trimmed, ""), 0, pc.add(seps, 1))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": n_tokens.cast(pa.int64()),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "stop_hits": pc.count_substring_regex(text, _STOPWORD_RE).cast(pa.int64()),
            "digit_chars": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def text_stats_sql() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\s+')) END AS n_tokens,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS stop_hits,
           len(regexp_extract_all(text, '[0-9]')) AS digit_chars
    FROM documents
    """


def lang_id(sf_dir: str):
    """Deterministic stopword-density language heuristic (the rule, not the
    label column — both sides of the oracle compute the same rule)."""
    stats = text_stats(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        dense = pc.greater_equal(pc.multiply(t.column("stop_hits"), 8),
                                 t.column("n_tokens"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang_pred": pc.if_else(dense, "en", "other"),
        })
    return stats.map_batches(fn, batch_format="pyarrow")


def lang_id_sql() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) * 8
                     >= CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) = '' THEN 0
                             ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\s+')) END
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """


SAMPLE_QUOTA_PER_LANG = 100
_SAMPLE_HASH_MULT = 2654435761          # Knuth multiplicative constant
_SAMPLE_HASH_MOD = 2 ** 32


def _sample_topk_per_lang(t: pa.Table, k: int) -> pa.Table:
    """k smallest (hsh, doc_id) per lang stratum — one sort + vectorized
    in-group rank (no per-key Python groups)."""
    if t.num_rows == 0:
        return t
    t = (t.combine_chunks()
         .sort_by([("lang_pred", "ascending"), ("hsh", "ascending"),
                   ("doc_id", "ascending")]))
    lang = t.column("lang_pred").to_numpy(zero_copy_only=False)
    idx = np.arange(len(lang))
    first = np.r_[True, lang[1:] != lang[:-1]]
    grp_start = np.maximum.accumulate(np.where(first, idx, 0))
    return t.filter(pa.array(idx - grp_start < k))


def sample_stratified(sf_dir: str, k: int = SAMPLE_QUOTA_PER_LANG):
    """Deterministic stratified corpus sample: per language stratum, the
    k documents with the smallest multiplicative hash of doc_id (ties by
    doc_id).

    The scale-correct shape for reproducible training-data sampling:
    membership is a pure function of the key — no RNG state, no global
    pass — so the sample is stable under re-partitioning and resumable.
    A per-batch combiner keeps the k smallest rows per stratum (at most
    strata × k rows leave any batch), then a per-stratum head finishes;
    stratum cardinality is bounded (languages), so the finishing group
    step is vocabulary-sized by construction."""
    docs = lang_id(sf_dir)

    def hashed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy()
        h = ((ids % _SAMPLE_HASH_MOD).astype(np.uint64)
             * np.uint64(_SAMPLE_HASH_MULT)) % np.uint64(_SAMPLE_HASH_MOD)
        return t.append_column("hsh", pa.array(h.astype(np.int64)))

    combined = docs.map_batches(hashed, batch_format="pyarrow") \
                   .map_batches(lambda t: _sample_topk_per_lang(t, k),
                                batch_format="pyarrow")
    final = combined.groupby("lang_pred").map_groups(
        lambda g: _sample_topk_per_lang(g, k), batch_format="pyarrow")
    return final.drop_columns(["hsh"])


def sample_stratified_sql(k: int = SAMPLE_QUOTA_PER_LANG) -> str:
    return f"""
    WITH lang AS ({lang_id_sql()}),
    h AS (
      SELECT doc_id, lang_pred,
             CAST((CAST(doc_id % {_SAMPLE_HASH_MOD} AS HUGEINT)
                   * {_SAMPLE_HASH_MULT}) % {_SAMPLE_HASH_MOD} AS BIGINT)
               AS hsh
      FROM lang)
    SELECT doc_id, lang_pred FROM (
      SELECT doc_id, lang_pred,
             row_number() OVER (PARTITION BY lang_pred
                                ORDER BY hsh, doc_id) AS rn
      FROM h) WHERE rn <= {k}
    """


SAMPLE_WEIGHTED_K = 200


def sample_weighted(sf_dir: str, k: int = SAMPLE_WEIGHTED_K):
    """Deterministic weighted sampling without replacement: the k docs
    with the smallest integer priority hash(doc_id) * 1000 // weight
    (weight = n_chars, ties by doc_id) — longer docs draw
    proportionally more often, yet membership stays a pure function of
    the key (stable under re-partitioning, resumable, no RNG state).
    The integer-priority variant of exponential-key weighted reservoir
    sampling (Efraimidis-Spirakis), shared verbatim with the SQL mirror.

    Scale shape: per-batch local top-k (k rows leave any batch) → one
    k × n_blocks head — no global sort, no full shuffle."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "n_chars"])

    def pri(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy()
        w = np.maximum(
            t.column("n_chars").cast(pa.int64()).to_numpy(), 1)
        h = ((ids % _SAMPLE_HASH_MOD).astype(np.uint64)
             * np.uint64(_SAMPLE_HASH_MULT)) % np.uint64(_SAMPLE_HASH_MOD)
        p = (h.astype(np.int64) * 1000) // w
        return t.append_column("pri", pa.array(p, pa.int64()))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return (t.sort_by([("pri", "ascending"), ("doc_id", "ascending")])
                .slice(0, k))

    def finish(g: pa.Table) -> pa.Table:
        return (local_topk(g.drop_columns(["one"]).combine_chunks())
                .drop_columns(["pri"]))

    return (ds.map_batches(pri, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(local_topk, batch_format="pyarrow")
            .map_batches(lambda t: t.append_column(
                "one", pa.array([0] * t.num_rows, pa.int64())),
                batch_format="pyarrow")
            .groupby("one").map_groups(finish, batch_format="pyarrow"))


def sample_weighted_sql(k: int = SAMPLE_WEIGHTED_K) -> str:
    return f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             CAST((CAST(doc_id % {_SAMPLE_HASH_MOD} AS HUGEINT)
                   * {_SAMPLE_HASH_MULT}) % {_SAMPLE_HASH_MOD} AS BIGINT)
               * 1000 // GREATEST(n_chars, 1) AS pri
      FROM documents)
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY pri, doc_id) AS rn
      FROM h) WHERE rn <= {k}
    """


REDACT_TOKEN = "[PERSON]"


def _person_pattern() -> str:
    """RE2 word-boundary alternation over the known-person dictionary —
    shared verbatim by the Arrow kernel and the DuckDB mirror."""
    from ..functions import rules as R
    return r"\b(" + "|".join(R.PERSONS) + r")\b"


def redact_persons(sf_dir: str):
    """Dictionary-based PII redaction (NER-lite): replace every known
    person-name token in the transcript text with [PERSON] and count the
    redactions per turn — the scrubbing stage of a training-data
    pipeline.  Map-only (no shuffle); the RE2 alternation over the
    dictionary compiles once per task.  At a real-PII dictionary scale
    (>10^5 names) swap the alternation for an Aho-Corasick automaton held
    by an actor pool — the stage contract is unchanged."""
    from .. import synth
    pat = _person_pattern()
    ds = ray.data.read_parquet(synth.transcripts_path(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t.column("text")
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "redacted": pc.replace_substring_regex(text, pat, REDACT_TOKEN),
            "n_redacted": pc.cast(pc.count_substring_regex(text, pat),
                                  pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_persons_sql(tr: str) -> str:
    pat = _person_pattern()
    return f"""
    SELECT conv_id, turn_idx,
           regexp_replace(text, '{pat}', '{REDACT_TOKEN}', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
             AS n_redacted
    FROM {tr}
    """


TOKEN_BIN_BUDGET = 256          # tokens per packed bin
_BIN_BUCKET_SPAN = 4096         # doc_ids per prefix-sum bucket


def token_bins(sf_dir: str, budget: int = TOKEN_BIN_BUDGET,
               bucket_span: int = _BIN_BUCKET_SPAN):
    """Sequence packing / chunking: assign each document (in doc_id order)
    to a token-budget bin — ``bin = (prefix_tokens_before_doc) // budget``.

    The distributed-prefix-sum shape: (1) per-batch partial sums per
    doc_id-range bucket (tiny table: one row per ``bucket_span`` docs);
    (2) driver-side exclusive cumsum over the bucket sums — bounded at
    corpus/bucket_span rows, raise ``bucket_span`` proportionally at
    scale; (3) broadcast offsets, then each bucket's rows co-locate once
    (hash groupby) and finish with one vectorized in-group cumsum.
    Partitioning assumption: one bucket's rows fit a worker's heap."""
    stats = text_stats(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_tokens": t.column("n_tokens").cast(pa.int64()),
            "bucket": pc.divide(t.column("doc_id").cast(pa.int64()),
                                bucket_span),
        })

    counts = stats.map_batches(project, batch_format="pyarrow") \
                  .materialize()

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["bucket", "n_tokens"]).group_by("bucket")
                .aggregate([("n_tokens", "sum")])
                .rename_columns(["bucket", "s"]))

    from ray.data.aggregate import Sum
    bucket_sums = (counts.map_batches(partial, batch_format="pyarrow")
                   .groupby("bucket").aggregate(Sum(on="s", alias_name="s"))
                   .to_pandas().sort_values("bucket"))
    offs = bucket_sums["s"].cumsum().shift(fill_value=0).to_numpy()
    offset_ref = ray.put(dict(zip(bucket_sums["bucket"].to_numpy(), offs)))

    def finish(g: pa.Table) -> pa.Table:
        g = g.combine_chunks().sort_by([("doc_id", "ascending")])
        base = ray.get(offset_ref)[g.column("bucket")[0].as_py()]
        n = g.column("n_tokens").to_numpy()
        prefix = base + np.cumsum(n) - n
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_tokens": g.column("n_tokens"),
            "bin": pa.array(prefix // budget, pa.int64()),
        })

    return counts.groupby("bucket").map_groups(finish,
                                               batch_format="pyarrow")


def token_bins_sql(budget: int = TOKEN_BIN_BUDGET) -> str:
    ws = "' ' || chr(9) || chr(10) || chr(12) || chr(13)"
    ntok = (f"CASE WHEN trim(text, {ws}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim(text, {ws}), '\\s+')) END")
    return f"""
    SELECT doc_id, n_tokens,
           CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                // {budget} AS BIGINT) AS bin
    FROM (SELECT doc_id, CAST({ntok} AS BIGINT) AS n_tokens
          FROM documents)
    """


def token_counts(sf_dir: str):
    """(doc_id, token, n) — exploded token counts, fully vectorized:
    split_pattern → list lengths → parent indices → flatten, then a local
    Arrow group_by per batch (no Python loop over rows)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        mask = pc.not_equal(trimmed, "")
        sub = t.filter(mask)
        trimmed = ascii_trim(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        flat = pc.list_flatten(toks)
        return (pa.table({"doc_id": pa.array(parents, pa.int64()),
                          "token": flat})
                .group_by(["doc_id", "token"])
                .aggregate([("token", "count")])
                .rename_columns(["doc_id", "token", "n"]))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_counts_sql() -> str:
    return r"""
    SELECT doc_id, token, count(*) AS n FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\s+')) AS token
      FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) <> '')
    GROUP BY 1, 2
    """


_WS_SQL = "' ' || chr(9) || chr(10) || chr(12) || chr(13)"


def repetition_stats(sf_dir: str):
    """Per-document repetition / lexical-diversity scores (the
    Gopher-style repetition filter family, integer permille so the SQL
    mirror is hash-exact): distinct-token ratio and top-token frequency.
    Fully vectorized and batch-local — one flatten + one Arrow group_by
    per batch, no shuffle (a document never spans batches)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        # NULL text scores like empty text (the SQL mirror's LEFT JOIN
        # emits zeros for it) — fill_null BOTH branches or the row would
        # silently drop from each
        mask = pc.fill_null(pc.not_equal(trimmed, ""), False)
        out_empty = pa.table({
            "doc_id": t.filter(pc.invert(mask)).column("doc_id")
                       .cast(pa.int64()),
        })
        out_empty = out_empty.append_column(
            "distinct_pm", pa.array([0] * out_empty.num_rows, pa.int64()))
        out_empty = out_empty.append_column(
            "top_tok_pm", pa.array([0] * out_empty.num_rows, pa.int64()))
        sub = t.filter(mask)
        if sub.num_rows == 0:
            return out_empty
        trimmed = ascii_trim(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        per_tok = (pa.table({"doc_id": pa.array(parents, pa.int64()),
                             "token": pc.list_flatten(toks)})
                   .group_by(["doc_id", "token"])
                   .aggregate([("token", "count")]))
        agg = (per_tok.group_by("doc_id")
               .aggregate([("token_count", "sum"), ("token_count", "count"),
                           ("token_count", "max")]))
        ntot = agg.column("token_count_sum")
        out = pa.table({
            "doc_id": agg.column("doc_id"),
            "distinct_pm": pc.cast(pc.divide(
                pc.multiply(agg.column("token_count_count")
                            .cast(pa.int64()), 1000), ntot), pa.int64()),
            "top_tok_pm": pc.cast(pc.divide(
                pc.multiply(agg.column("token_count_max"), 1000), ntot),
                pa.int64()),
        })
        return pa.concat_tables([out, out_empty])
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats_sql() -> str:
    ws = _WS_SQL
    return f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS token
      FROM documents WHERE trim(text, {ws}) <> ''),
    c AS (SELECT doc_id, token, count(*) AS n FROM tk GROUP BY 1, 2),
    a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS ntot,
                 CAST(count(*) AS BIGINT) AS ndist,
                 CAST(max(n) AS BIGINT) AS ntop
          FROM c GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(ndist * 1000 // ntot, 0) AS BIGINT) AS distinct_pm,
           CAST(coalesce(ntop * 1000 // ntot, 0) AS BIGINT) AS top_tok_pm
    FROM documents d LEFT JOIN a USING (doc_id)
    """


# broadcast bound for the global token-frequency directory (the same
# contract as materialize.BROADCAST_MAX_ENTITIES for the entity
# directory): beyond it, switch the familiarity join to a bucketed
# cogroup over (token) — the vocabulary of a deduplicated web corpus is
# ~10^7-10^8 tokens, so the directory is broadcastable far longer than
# the corpus itself is holdable
FAMILIARITY_MAX_VOCAB = 50_000_000


def familiarity(sf_dir: str):
    """Corpus-familiarity scores per document (rare-token / OOV-garbage
    detector): freq_sum = Σ global count of each token occurrence,
    freq_min = global count of the document's rarest token.  Two-phase:
    (1) global unigram counts — per-batch combine then one vocab-sized
    groupby, collected once and broadcast via ``ray.put`` (never
    re-shipped per batch); (2) per-doc vectorized ``index_in`` lookup +
    one Arrow group_by per batch.  Integer arithmetic end-to-end so the
    DuckDB mirror matches hash-exactly (a float LM surprisal would
    diverge in the last ulp)."""
    def flat_tokens(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        # NULL text == empty text (fill_null, matching the SQL mirror)
        sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
        if sub.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("token", pa.string())]).empty_table()
        trimmed = ascii_trim(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        return pa.table({"doc_id": pa.array(parents, pa.int64()),
                         "token": pc.list_flatten(toks)})

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    counts = (ds.map_batches(
        lambda t: (flat_tokens(t).group_by("token")
                   .aggregate([("token", "count")])
                   .rename_columns(["token", "n"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token").sum("n")).materialize()
    # gate on the (distributed, object-store-held) cardinality BEFORE any
    # driver-side collect — an over-bound vocabulary must never touch the
    # driver heap, and the materialized count job is reused by iter_batches
    if counts.count() > FAMILIARITY_MAX_VOCAB:
        return familiarity_cogroup(sf_dir)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    vocab = (pa.concat_tables(parts).combine_chunks() if parts
             else pa.schema([("token", pa.string()),
                             ("sum(n)", pa.int64())]).empty_table())
    tok_arr = vocab.column("token").combine_chunks()
    cnt_np = vocab.column("sum(n)").to_numpy(zero_copy_only=False)
    vocab_ref = ray.put((tok_arr, cnt_np))

    def score(t: pa.Table) -> pa.Table:
        flat = flat_tokens(t)
        empty = t.filter(pc.fill_null(
            pc.equal(ascii_trim(t.column("text")), ""), True))
        zeros = pa.table({
            "doc_id": empty.column("doc_id").cast(pa.int64()),
            "freq_sum": pa.array([0] * empty.num_rows, pa.int64()),
            "freq_min": pa.array([0] * empty.num_rows, pa.int64()),
        })
        if flat.num_rows == 0:
            return zeros
        toks, cnts = ray.get(vocab_ref)
        pos = pc.index_in(flat.column("token"), value_set=toks)                 .to_numpy(zero_copy_only=False)
        freq = cnts[pos.astype("int64")]
        agg = (pa.table({"doc_id": flat.column("doc_id"),
                         "freq": pa.array(freq, pa.int64())})
               .group_by("doc_id")
               .aggregate([("freq", "sum"), ("freq", "min")]))
        out = pa.table({
            "doc_id": agg.column("doc_id"),
            "freq_sum": agg.column("freq_sum").cast(pa.int64()),
            "freq_min": agg.column("freq_min").cast(pa.int64()),
        })
        return pa.concat_tables([out, zeros])
    return ds.map_batches(score, batch_format="pyarrow")


def familiarity_sql() -> str:
    ws = _WS_SQL
    return f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS token
      FROM documents WHERE trim(text, {ws}) <> ''),
    g AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
    a AS (SELECT tk.doc_id, CAST(sum(g.c) AS BIGINT) AS freq_sum,
                 CAST(min(g.c) AS BIGINT) AS freq_min
          FROM tk JOIN g USING (token) GROUP BY 1)
    SELECT d.doc_id, coalesce(freq_sum, 0) AS freq_sum,
           coalesce(freq_min, 0) AS freq_min
    FROM documents d LEFT JOIN a USING (doc_id)
    """


FAMILIARITY_COGROUP_BUCKETS = 256


def familiarity_cogroup(sf_dir: str):
    """Fully distributed familiarity (the beyond-broadcast-vocab path):
    the same scores as ``familiarity`` with NO driver-side vocabulary.
    Two keyed exchanges, both narrow:

    1. token-keyed: per-batch (doc_id, token, n) partials bucketed by
       hash(token); each shard computes the global per-token count with
       one vectorized groupby and attaches it to its (doc_id, token)
       rows in-shard — the cogroup join ships narrow int/token rows.
    2. doc-keyed: per-doc sum/min of the attached counts (per-batch
       pre-combined).

    Equivalence with the broadcast path is pytest-enforced."""
    from ..functions.buckets import add_bucket

    def flat_tokens(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        # NULL text == empty text (fill_null, matching the SQL mirror)
        sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
        if sub.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("token", pa.string())]).empty_table()
        trimmed = ascii_trim(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        return pa.table({"doc_id": pa.array(parents, pa.int64()),
                         "token": pc.list_flatten(toks)})

    def tok_partial(t: pa.Table) -> pa.Table:
        p = (flat_tokens(t).group_by(["doc_id", "token"])
             .aggregate([("token", "count")])
             .rename_columns(["doc_id", "token", "n"]))
        # blank/NULL docs ride the SAME pass as an (doc_id, "", n=0)
        # sentinel row (whitespace splitting never yields "" tokens, and
        # its global count sums to 0) — no second corpus scan just to
        # emit their zero scores
        empty = t.filter(pc.fill_null(
            pc.equal(ascii_trim(t.column("text")), ""), True))
        if empty.num_rows:
            p = pa.concat_tables([p, pa.table({
                "doc_id": empty.column("doc_id").cast(pa.int64()),
                "token": pa.array([""] * empty.num_rows, pa.string()),
                "n": pa.array([0] * empty.num_rows, pa.int64()),
            })])
        return add_bucket(p, "token", FAMILIARITY_COGROUP_BUCKETS)

    def tok_shard(g: pa.Table) -> pa.Table:
        """One token-hash shard: global count per token, attached back to
        each (doc_id, token) row as n (occurrences) x c (global)."""
        if g.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("wsum", pa.int64()),
                              ("wmin", pa.int64())]).empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        tot = (g.select(["token", "n"]).group_by("token")
               .aggregate([("n", "sum")]))
        pos = pc.index_in(g.column("token"), value_set=tot.column("token")
                          .combine_chunks())
        c = tot.column("n_sum").combine_chunks().take(pos)
        # per-doc partial within this shard (docs span shards → second,
        # doc-keyed exchange finishes the fold)
        p = (pa.table({"doc_id": g.column("doc_id"),
                       "wsum": pc.multiply(g.column("n"), c),
                       "wmin": c})
             .group_by("doc_id")
             .aggregate([("wsum", "sum"), ("wmin", "min")])
             .rename_columns(["doc_id", "wsum", "wmin"]))
        return p

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    partials = (ds.map_batches(tok_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("bucket").map_groups(tok_shard,
                                              batch_format="pyarrow"))

    def doc_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("wsum", pa.int64()), ("wmin", pa.int64()),
                              ("bucket", pa.int64())]).empty_table()
        return add_bucket(t, "doc_id", FAMILIARITY_COGROUP_BUCKETS)

    def doc_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("freq_sum", pa.int64()),
                              ("freq_min", pa.int64())]).empty_table()
        out = (g.drop_columns(["bucket"]).combine_chunks()
               .group_by("doc_id")
               .aggregate([("wsum", "sum"), ("wmin", "min")]))
        return pa.Table.from_arrays(
            [out.column("doc_id").cast(pa.int64()),
             out.column("wsum_sum").cast(pa.int64()),
             out.column("wmin_min").cast(pa.int64())],
            schema=pa.schema([("doc_id", pa.int64()),
                              ("freq_sum", pa.int64()),
                              ("freq_min", pa.int64())]))

    return (partials.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_shard,
                                          batch_format="pyarrow"))


# --------------------------------------------------------------------------
# Bigram LM corpus scorer — the integer-exact analog of a KenLM-style
# perplexity quality filter (CCNet, Wenzek et al. 2020): per document, the
# corpus-global frequency mass of its adjacent-token PAIRS.  Natural word
# sequences ride frequent bigrams; shuffled/garbage text scores low even
# when every unigram is common — the signal ``familiarity`` (unigram-level)
# cannot see.  Integer arithmetic end-to-end so the DuckDB mirror matches
# hash-exactly (a float log-prob would diverge in the last ulp).
# --------------------------------------------------------------------------

BIGRAM_MAX_VOCAB = 50_000_000
BIGRAM_COGROUP_BUCKETS = 256
_BIGRAM_FLAT = pa.schema([("doc_id", pa.int64()), ("bigram", pa.string())])
_BIGRAM_OUT = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                         ("bg_sum", pa.int64()), ("bg_min", pa.int64())])


def _flat_bigrams(t: pa.Table) -> pa.Table:
    """(doc_id, bigram) rows for every adjacent token pair — one shifted
    slice + mask over the flattened token array, never a per-row loop;
    pair boundaries never cross documents (parent-id shift compare)."""
    trimmed = ascii_trim(t.column("text"))
    sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
    if sub.num_rows == 0:
        return _BIGRAM_FLAT.empty_table()
    trimmed = ascii_trim(sub.column("text"))
    toks = pc.split_pattern_regex(trimmed, _WS_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) < 2:
        return _BIGRAM_FLAT.empty_table()
    same = parents[1:] == parents[:-1]
    mask = pa.array(same)
    bigram = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1).filter(mask),
        flat.slice(1).filter(mask), " ")
    return pa.table({"doc_id": pa.array(parents[1:][same], pa.int64()),
                     "bigram": bigram})


def _bigram_zeros(t: pa.Table, scored_ids) -> pa.Table:
    """(doc_id, 0, 0, 0) rows for the batch's docs with no bigrams
    (empty/blank or single-token) — the LEFT-JOIN arm of the SQL mirror."""
    done = pc.fill_null(pc.is_in(t.column("doc_id").cast(pa.int64()),
                                 value_set=scored_ids), False)
    rest = t.filter(pc.invert(done))
    z = pa.array([0] * rest.num_rows, pa.int64())
    return pa.table({"doc_id": rest.column("doc_id").cast(pa.int64()),
                     "n_bigrams": z, "bg_sum": z, "bg_min": z})


def bigram_lm(sf_dir: str):
    """Per-doc bigram-LM corpus scores: n_bigrams, bg_sum = Σ global count
    of each adjacent-token-pair occurrence, bg_min = global count of the
    rarest pair.  Two-phase like ``familiarity``: (1) global bigram counts
    (per-batch combiner → one vocab-sized groupby), cardinality-gated and
    broadcast ONCE via ``ray.put``; (2) per-doc vectorized ``index_in``
    lookup + one Arrow group_by per batch.  Beyond
    ``BIGRAM_MAX_VOCAB`` the equivalence-tested ``bigram_lm_cogroup``
    path takes over (bigram vocabularies outgrow unigram vocabularies
    roughly quadratically, so the escape matters sooner here)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    counts = (ds.map_batches(
        lambda t: (_flat_bigrams(t).group_by("bigram")
                   .aggregate([("bigram", "count")])
                   .rename_columns(["bigram", "n"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram").sum("n")).materialize()
    if counts.count() > BIGRAM_MAX_VOCAB:
        return bigram_lm_cogroup(sf_dir)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    vocab = (pa.concat_tables(parts).combine_chunks() if parts
             else pa.schema([("bigram", pa.string()),
                             ("sum(n)", pa.int64())]).empty_table())
    bg_arr = vocab.column("bigram").combine_chunks()
    cnt_np = vocab.column("sum(n)").to_numpy(zero_copy_only=False)
    vocab_ref = ray.put((bg_arr, cnt_np))

    def score(t: pa.Table) -> pa.Table:
        flat = _flat_bigrams(t)
        if flat.num_rows == 0:
            return _bigram_zeros(t, pa.array([], pa.int64()))
        bgs, cnts = ray.get(vocab_ref)
        pos = pc.index_in(flat.column("bigram"), value_set=bgs) \
                .to_numpy(zero_copy_only=False)
        freq = cnts[pos.astype("int64")]
        agg = (pa.table({"doc_id": flat.column("doc_id"),
                         "freq": pa.array(freq, pa.int64())})
               .group_by("doc_id")
               .aggregate([("freq", "count"), ("freq", "sum"),
                           ("freq", "min")]))
        out = pa.Table.from_arrays(
            [agg.column("doc_id").cast(pa.int64()),
             agg.column("freq_count").cast(pa.int64()),
             agg.column("freq_sum").cast(pa.int64()),
             agg.column("freq_min").cast(pa.int64())],
            schema=_BIGRAM_OUT)
        zeros = _bigram_zeros(t, agg.column("doc_id").combine_chunks()
                              .cast(pa.int64()))
        return pa.concat_tables([out, zeros])
    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_cogroup(sf_dir: str):
    """Fully distributed bigram LM scoring (the beyond-broadcast-vocab
    path): the same scores as ``bigram_lm`` with NO driver-side
    vocabulary — two narrow keyed exchanges (bigram-keyed count-attach,
    then doc-keyed fold), mirroring ``familiarity_cogroup``.  Docs with
    no bigrams ride the first pass as a (doc_id, "", n=0) sentinel (a
    real bigram always contains a space, so "" never collides).
    Equivalence with the broadcast path is pytest-enforced."""
    from ..functions.buckets import add_bucket

    def bg_partial(t: pa.Table) -> pa.Table:
        flat = _flat_bigrams(t)
        p = (flat.group_by(["doc_id", "bigram"])
             .aggregate([("bigram", "count")])
             .rename_columns(["doc_id", "bigram", "n"]))
        scored = p.column("doc_id").combine_chunks().cast(pa.int64())
        done = pc.fill_null(pc.is_in(t.column("doc_id").cast(pa.int64()),
                                     value_set=scored), False)
        rest = t.filter(pc.invert(done))
        if rest.num_rows:
            p = pa.concat_tables([p, pa.table({
                "doc_id": rest.column("doc_id").cast(pa.int64()),
                "bigram": pa.array([""] * rest.num_rows, pa.string()),
                "n": pa.array([0] * rest.num_rows, pa.int64()),
            })])
        return add_bucket(p, "bigram", BIGRAM_COGROUP_BUCKETS)

    def bg_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("nb", pa.int64()),
                              ("wsum", pa.int64()),
                              ("wmin", pa.int64())]).empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        tot = (g.select(["bigram", "n"]).group_by("bigram")
               .aggregate([("n", "sum")]))
        pos = pc.index_in(g.column("bigram"),
                          value_set=tot.column("bigram").combine_chunks())
        c = tot.column("n_sum").combine_chunks().take(pos)
        return (pa.table({"doc_id": g.column("doc_id"),
                          "nb": g.column("n"),
                          "wsum": pc.multiply(g.column("n"), c),
                          "wmin": c})
                .group_by("doc_id")
                .aggregate([("nb", "sum"), ("wsum", "sum"), ("wmin", "min")])
                .rename_columns(["doc_id", "nb", "wsum", "wmin"]))

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    partials = (ds.map_batches(bg_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("bucket").map_groups(bg_shard,
                                              batch_format="pyarrow"))

    def doc_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("nb", pa.int64()),
                              ("wsum", pa.int64()), ("wmin", pa.int64()),
                              ("bucket", pa.int64())]).empty_table()
        return add_bucket(t, "doc_id", BIGRAM_COGROUP_BUCKETS)

    def doc_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _BIGRAM_OUT.empty_table()
        out = (g.drop_columns(["bucket"]).combine_chunks()
               .group_by("doc_id")
               .aggregate([("nb", "sum"), ("wsum", "sum"),
                           ("wmin", "min")]))
        return pa.Table.from_arrays(
            [out.column("doc_id").cast(pa.int64()),
             out.column("nb_sum").cast(pa.int64()),
             out.column("wsum_sum").cast(pa.int64()),
             out.column("wmin_min").cast(pa.int64())],
            schema=_BIGRAM_OUT)

    return (partials.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_shard,
                                          batch_format="pyarrow"))


def bigram_lm_sql() -> str:
    ws = _WS_SQL
    return f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text, {ws}), '\\s+') AS a
      FROM documents WHERE trim(text, {ws}) <> ''),
    tk AS (SELECT doc_id, unnest(a) AS tok,
                  generate_subscripts(a, 1) AS i FROM d),
    bg AS (SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS bigram
           FROM tk t1 JOIN tk t2
             ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1),
    g AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1),
    a2 AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                  CAST(sum(g.c) AS BIGINT) AS bg_sum,
                  CAST(min(g.c) AS BIGINT) AS bg_min
           FROM bg JOIN g USING (bigram) GROUP BY 1)
    SELECT doc.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(bg_sum, 0) AS bg_sum, coalesce(bg_min, 0) AS bg_min
    FROM documents doc LEFT JOIN a2 USING (doc_id)
    """


# --------------------------------------------------------------------------
# DSIR-style importance-resampling weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score every
# document by how much more likely its features are under a TARGET-domain
# model than under the raw-corpus model, then resample by the weight.
# Features here are adjacent-token bigrams (the operator reuses the
# bigram-LM machinery); the per-occurrence importance ratio is the
# integer-milli ``(1000 * (ct + 1)) // (cr + 1)`` (add-one smoothed
# target count over raw count) — the house no-floats discipline: DSIR's
# log-ratio sum would diverge from any SQL mirror in the last ulp, the
# integer linearized ratio hash-matches exactly.  The target domain is
# the documents whose ``source`` is in ``DSIR_TARGET_SOURCES``.
# --------------------------------------------------------------------------

DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")
_DSIR_OUT = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                       ("tgt_sum", pa.int64()), ("raw_sum", pa.int64()),
                       ("dsir_milli", pa.int64())])


def _dsir_zeros(t: pa.Table, scored_ids) -> pa.Table:
    done = pc.fill_null(pc.is_in(t.column("doc_id").cast(pa.int64()),
                                 value_set=scored_ids), False)
    rest = t.filter(pc.invert(done))
    z = pa.array([0] * rest.num_rows, pa.int64())
    return pa.table({"doc_id": rest.column("doc_id").cast(pa.int64()),
                     "n_bigrams": z, "tgt_sum": z, "raw_sum": z,
                     "dsir_milli": z})


def _target_mask(t: pa.Table) -> pa.Array:
    return pc.fill_null(pc.is_in(t.column("source"),
                                 value_set=pa.array(DSIR_TARGET_SOURCES)),
                        False)


def dsir_weights(sf_dir: str):
    """(doc_id, n_bigrams, tgt_sum, raw_sum, dsir_milli) — per-doc
    importance-resampling sufficient statistics + the integer-milli
    weight ``dsir_milli = Σ_occurrences (1000*(ct+1)) // (cr+1)``.

    Two-phase: (1) raw-corpus and target-slice bigram counts (per-batch
    combiners → two vocab-sized groupbys), aligned driver-side and
    broadcast ONCE via ``ray.put``; (2) per-doc vectorized ``index_in``
    lookup + one Arrow group_by per batch.  Beyond ``BIGRAM_MAX_VOCAB``
    the equivalence-tested ``dsir_weights_cogroup`` path takes over."""
    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["doc_id", "text", "source"])
    raw = (ds.map_batches(
        lambda t: (_flat_bigrams(t).group_by("bigram")
                   .aggregate([("bigram", "count")])
                   .rename_columns(["bigram", "n"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram").sum("n")).materialize()
    if raw.count() > BIGRAM_MAX_VOCAB:
        return dsir_weights_cogroup(sf_dir)
    tgt = (ds.map_batches(
        lambda t: (_flat_bigrams(t.filter(_target_mask(t)))
                   .group_by("bigram").aggregate([("bigram", "count")])
                   .rename_columns(["bigram", "n"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram").sum("n"))

    def collect(counts) -> pa.Table:
        parts = [b for b in counts.iter_batches(batch_format="pyarrow")
                 if b.num_columns and b.num_rows]
        return (pa.concat_tables(parts).combine_chunks() if parts
                else pa.schema([("bigram", pa.string()),
                                ("sum(n)", pa.int64())]).empty_table())

    rawt, tgtt = collect(raw), collect(tgt)
    bg_arr = rawt.column("bigram").combine_chunks()
    cr_np = rawt.column("sum(n)").to_numpy(zero_copy_only=False)
    # align target counts onto the raw vocabulary (missing -> 0)
    tpos = pc.fill_null(
        pc.index_in(bg_arr,
                    value_set=tgtt.column("bigram").combine_chunks()),
        -1).to_numpy(zero_copy_only=False).astype("int64")
    tvals = tgtt.column("sum(n)").to_numpy(zero_copy_only=False)
    ct_np = np.zeros(len(bg_arr), dtype="int64")
    hit = tpos >= 0
    if len(tvals):
        ct_np[hit] = tvals[tpos[hit]]
    vocab_ref = ray.put((bg_arr, cr_np, ct_np))

    def score(t: pa.Table) -> pa.Table:
        flat = _flat_bigrams(t)
        if flat.num_rows == 0:
            return _dsir_zeros(t, pa.array([], pa.int64()))
        bgs, cr, ct = ray.get(vocab_ref)
        pos = pc.index_in(flat.column("bigram"), value_set=bgs) \
            .to_numpy(zero_copy_only=False).astype("int64")
        crv, ctv = cr[pos], ct[pos]
        ratio = (1000 * (ctv + 1)) // (crv + 1)
        agg = (pa.table({"doc_id": flat.column("doc_id"),
                         "ct": pa.array(ctv, pa.int64()),
                         "cr": pa.array(crv, pa.int64()),
                         "ratio": pa.array(ratio, pa.int64())})
               .group_by("doc_id")
               .aggregate([("ct", "count"), ("ct", "sum"),
                           ("cr", "sum"), ("ratio", "sum")]))
        out = pa.Table.from_arrays(
            [agg.column("doc_id").cast(pa.int64()),
             agg.column("ct_count").cast(pa.int64()),
             agg.column("ct_sum").cast(pa.int64()),
             agg.column("cr_sum").cast(pa.int64()),
             agg.column("ratio_sum").cast(pa.int64())],
            schema=_DSIR_OUT)
        zeros = _dsir_zeros(t, agg.column("doc_id").combine_chunks()
                            .cast(pa.int64()))
        return pa.concat_tables([out, zeros])

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights_cogroup(sf_dir: str):
    """Fully distributed DSIR scoring (the beyond-broadcast-vocab path):
    the same stats with NO driver-side vocabulary — bigram-keyed
    count-attach (raw AND target counts computed inside the shard from
    tagged per-doc partials), then a doc-keyed fold, mirroring
    ``bigram_lm_cogroup``.  Docs with no bigrams ride as a
    (doc_id, "", n=0, tn=0) sentinel — every contribution is ``n *``
    something, so the sentinel folds to zeros."""
    from ..functions.buckets import add_bucket

    def bg_partial(t: pa.Table) -> pa.Table:
        flat = _flat_bigrams(t)
        p = (flat.group_by(["doc_id", "bigram"])
             .aggregate([("bigram", "count")])
             .rename_columns(["doc_id", "bigram", "n"]))
        tgt_ids = (t.filter(_target_mask(t)).column("doc_id")
                   .combine_chunks().cast(pa.int64()))
        is_t = pc.fill_null(pc.is_in(p.column("doc_id").cast(pa.int64()),
                                     value_set=tgt_ids), False)
        p = p.append_column(
            "tn", pc.if_else(is_t, p.column("n"),
                             pa.scalar(0, pa.int64())).cast(pa.int64()))
        scored = p.column("doc_id").combine_chunks().cast(pa.int64())
        done = pc.fill_null(pc.is_in(t.column("doc_id").cast(pa.int64()),
                                     value_set=scored), False)
        rest = t.filter(pc.invert(done))
        if rest.num_rows:
            z = pa.array([0] * rest.num_rows, pa.int64())
            p = pa.concat_tables([p, pa.table({
                "doc_id": rest.column("doc_id").cast(pa.int64()),
                "bigram": pa.array([""] * rest.num_rows, pa.string()),
                "n": z, "tn": z})])
        return add_bucket(p, "bigram", BIGRAM_COGROUP_BUCKETS)

    _PART = pa.schema([("doc_id", pa.int64()), ("nb", pa.int64()),
                       ("ts", pa.int64()), ("rs", pa.int64()),
                       ("dm", pa.int64())])

    def bg_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        tot = (g.select(["bigram", "n", "tn"]).group_by("bigram")
               .aggregate([("n", "sum"), ("tn", "sum")]))
        pos = pc.index_in(g.column("bigram"),
                          value_set=tot.column("bigram").combine_chunks())
        cr = tot.column("n_sum").combine_chunks().take(pos) \
            .to_numpy(zero_copy_only=False)
        ct = tot.column("tn_sum").combine_chunks().take(pos) \
            .to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        ratio = (1000 * (ct + 1)) // (cr + 1)
        return (pa.table({"doc_id": g.column("doc_id"),
                          "nb": g.column("n"),
                          "ts": pa.array(n * ct, pa.int64()),
                          "rs": pa.array(n * cr, pa.int64()),
                          "dm": pa.array(n * ratio, pa.int64())})
                .group_by("doc_id")
                .aggregate([("nb", "sum"), ("ts", "sum"), ("rs", "sum"),
                            ("dm", "sum")])
                .rename_columns(["doc_id", "nb", "ts", "rs", "dm"]))

    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["doc_id", "text", "source"])
    partials = (ds.map_batches(bg_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("bucket").map_groups(bg_shard,
                                              batch_format="pyarrow"))

    def doc_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _PART.empty_table().append_column(
                "bucket", pa.array([], pa.int64()))
        return add_bucket(t, "doc_id", BIGRAM_COGROUP_BUCKETS)

    def doc_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _DSIR_OUT.empty_table()
        out = (g.drop_columns(["bucket"]).combine_chunks()
               .group_by("doc_id")
               .aggregate([("nb", "sum"), ("ts", "sum"), ("rs", "sum"),
                           ("dm", "sum")]))
        return pa.Table.from_arrays(
            [out.column("doc_id").cast(pa.int64()),
             out.column("nb_sum").cast(pa.int64()),
             out.column("ts_sum").cast(pa.int64()),
             out.column("rs_sum").cast(pa.int64()),
             out.column("dm_sum").cast(pa.int64())],
            schema=_DSIR_OUT)

    return (partials.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_shard,
                                          batch_format="pyarrow"))


def dsir_weights_sql() -> str:
    ws = _WS_SQL
    srcs = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    return f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text, {ws}), '\\s+') AS a
      FROM documents WHERE trim(text, {ws}) <> ''),
    tk AS (SELECT doc_id, unnest(a) AS tok,
                  generate_subscripts(a, 1) AS i FROM d),
    bg AS (SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS bigram
           FROM tk t1 JOIN tk t2
             ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1),
    raw AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cr
            FROM bg GROUP BY 1),
    tgt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS ct
            FROM bg JOIN documents USING (doc_id)
            WHERE source IN ({srcs}) GROUP BY 1),
    a2 AS (SELECT bg.doc_id,
                  CAST(count(*) AS BIGINT) AS n_bigrams,
                  CAST(sum(coalesce(tgt.ct, 0)) AS BIGINT) AS tgt_sum,
                  CAST(sum(raw.cr) AS BIGINT) AS raw_sum,
                  CAST(sum((1000 * (coalesce(tgt.ct, 0) + 1))
                           // (raw.cr + 1)) AS BIGINT) AS dsir_milli
           FROM bg JOIN raw USING (bigram)
           LEFT JOIN tgt USING (bigram) GROUP BY 1)
    SELECT doc.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(tgt_sum, 0) AS tgt_sum,
           coalesce(raw_sum, 0) AS raw_sum,
           coalesce(dsir_milli, 0) AS dsir_milli
    FROM documents doc LEFT JOIN a2 USING (doc_id)
    """


TOP_TOKENS_K = 20


def top_tokens(sf_dir: str, *, k: int = TOP_TOKENS_K):
    """Corpus heavy hitters: global top-k tokens by count with the
    deterministic (count DESC, token ASC) tie-break.

    100-TB shape: per-batch token-count combiners → ONE vocab-sized
    groupby → per-block local top-k (k rows leave each block) → a
    k x n_blocks driver fold.  The driver never sees more than
    k x n_blocks rows regardless of vocabulary size."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
        schema = pa.schema([("token", pa.string()), ("n", pa.int64())])
        if sub.num_rows == 0:
            return schema.empty_table()
        toks = pc.split_pattern_regex(ascii_trim(sub.column("text")),
                                      _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return (pa.table({"token": pc.list_flatten(toks)})
                .group_by("token").aggregate([("token", "count")])
                .rename_columns(["token", "n"]).cast(schema))

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("token").sum("n"))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("token", pa.string()),
                              ("n", pa.int64())]).empty_table()
        # select by GENERATED name, never positional (pyarrow/ray moved
        # key-column position between versions — the r3 advisory)
        s = pa.table({"token": t.column("token"),
                      "n": t.column("sum(n)")}) \
            .sort_by([("n", "descending"), ("token", "ascending")])
        return s.slice(0, k).cast(pa.schema([("token", pa.string()),
                                             ("n", pa.int64())]))

    parts = [b for b in counts.map_batches(
        local_topk, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_columns]
    if not parts:
        return pa.schema([("token", pa.string()),
                          ("n", pa.int64())]).empty_table()
    merged = pa.concat_tables(parts).combine_chunks()
    return merged.sort_by([("n", "descending"),
                           ("token", "ascending")]).slice(0, k)


def top_tokens_sql(*, k: int = TOP_TOKENS_K) -> str:
    ws = _WS_SQL
    return f"""
    WITH tk AS (
      SELECT unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS token
      FROM documents WHERE trim(text, {ws}) <> '')
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tk GROUP BY 1
    ORDER BY n DESC, token ASC LIMIT {k}
    """


QC_DIM = 256          # hashed bag-of-words feature dim (+1 bias)
QC_ITERS = 20
QC_LR = 0.5
QC_REF_MOD = 10       # doc_id % mod == 0 → positive (reference) class


def _qc_features(t: pa.Table, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Dense hashed bag-of-words features for a batch: x[h(tok) % dim]
    += 1, row-normalized by token count, bias column appended.  Fully
    vectorized (one split, one hash pass, one np.add.at scatter)."""
    import pandas as pd

    txt = pc.fill_null(ascii_trim(t.column("text")), "")
    toks = pc.split_pattern_regex(txt, _WS_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = t.num_rows
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    X = np.zeros((n, dim + 1), np.float64)
    if len(flat):
        feat = (pd.util.hash_array(flat) % dim).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
        np.add.at(X, (rows, feat), 1.0)
        denom = np.maximum(lengths, 1).astype(np.float64)
        X[:, :dim] /= denom[:, None]
    X[:, dim] = 1.0   # bias
    return X, t.column("doc_id").to_numpy()


def train_quality_classifier(sf_dir: str, *, dim: int = QC_DIM,
                             iters: int = QC_ITERS, lr: float = QC_LR,
                             ref_mod: int = QC_REF_MOD) -> np.ndarray:
    """GPT-3/WebText-style quality classifier TRAINING: full-batch
    logistic regression separating a designated high-quality reference
    slice (doc_id % ref_mod == 0 — the decontaminate discipline stands in
    for 'curated corpus') from the rest, over deterministic hashed
    bag-of-words features.

    Distribution shape (the bounded-iteration fixed-point pattern, like
    k-means): per iteration the weight vector broadcasts via ``ray.put``
    and every batch emits ONE partial row (gradient sum, n) — the driver
    folds dim+2 floats x n_blocks per round in canonical order so float
    accumulation — hence the model — is deterministic."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    w = np.zeros(dim + 1, np.float64)

    def grad_partial(t: pa.Table, wref) -> pa.Table:
        w_ = ray.get(wref)
        X, ids = _qc_features(t, dim)
        y = (ids % ref_mod == 0).astype(np.float64)
        p = 1.0 / (1.0 + np.exp(-(X @ w_)))
        g = X.T @ (p - y)
        return pa.table({"g": pa.array([g.tolist()],
                                       pa.list_(pa.float64())),
                         "n": pa.array([t.num_rows], pa.int64())})

    for _ in range(iters):
        wref = ray.put(w)
        parts = ds.map_batches(
            lambda t, _w=wref: grad_partial(t, _w),
            batch_format="pyarrow").take_all()
        parts.sort(key=lambda r: (r["n"], tuple(r["g"])))  # canonical fold
        g = np.zeros(dim + 1, np.float64)
        n_total = 0
        for r in parts:
            g += np.asarray(r["g"])
            n_total += r["n"]
        w = w - lr * g / max(n_total, 1)
    return w


def quality_classifier_scores(sf_dir: str, *, dim: int = QC_DIM,
                              iters: int = QC_ITERS,
                              ref_mod: int = QC_REF_MOD):
    """Train the quality classifier, then score every document map-side
    (weights broadcast ONCE): (doc_id, qc_score in [0,1]).  Rows-only
    (iterative model training has no SQL mirror); determinism and a
    planted-separable golden are pytest-enforced."""
    w = train_quality_classifier(sf_dir, dim=dim, iters=iters,
                                 ref_mod=ref_mod)
    wref = ray.put(w)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        w_ = ray.get(wref)
        X, ids = _qc_features(t, dim)
        p = 1.0 / (1.0 + np.exp(-(X @ w_)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "qc_score": pa.array(np.round(p, 9),
                                              pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def source_mix_weights(sf_dir: str):
    """Per-source corpus mixing table (the Pile/temperature-mixing
    bookkeeping step): doc count, token count, and proportional sampling
    weights in integer permille — ``weight_permille = (1000 * tokens_s)
    // total_tokens`` (temperature 1; a trainer applies its own
    temperature to these exact integers).

    100-TB shape: ONE map with a per-batch (source, docs, tokens)
    combiner — at most n_sources rows leave each batch — then a
    groupby(source) sum.  `source` is a categorical column (sources
    number in the hundreds, not the billions), so the aggregated table
    is driver-trivial by construction; the totals fold over it is
    integer and order-free."""
    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        seps = pc.count_substring_regex(trimmed, _WS_RE)
        n_tok = pc.fill_null(
            pc.if_else(pc.equal(trimmed, ""), 0, pc.add(seps, 1)), 0)
        return (pa.table({"source": t.column("source"),
                          "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
                          "n_tokens": n_tok.cast(pa.int64())})
                .group_by("source")
                .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
                .rename_columns(["source", "n_docs", "n_tokens"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source").sum(["n_docs", "n_tokens"]))
    parts = [b for b in agg.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    t = (pa.concat_tables(parts).combine_chunks() if parts
         else pa.schema([("source", pa.string()),
                         ("sum(n_docs)", pa.int64()),
                         ("sum(n_tokens)", pa.int64())]).empty_table())
    docs = t.column("sum(n_docs)").to_numpy(zero_copy_only=False)
    toks = t.column("sum(n_tokens)").to_numpy(zero_copy_only=False)
    tot_docs, tot_toks = max(int(docs.sum()), 1), max(int(toks.sum()), 1)
    return pa.table({
        "source": t.column("source"),
        "n_docs": pa.array(docs, pa.int64()),
        "n_tokens": pa.array(toks, pa.int64()),
        "weight_permille": pa.array(1000 * toks // tot_toks, pa.int64()),
        "doc_share_permille": pa.array(1000 * docs // tot_docs, pa.int64()),
    }).sort_by("source")


def source_mix_weights_sql() -> str:
    ws = _WS_SQL
    ntok = (f"coalesce(CASE WHEN trim(text, {ws}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim(text, {ws}), '\\s+')) "
            f"END, 0)")
    return f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({ntok}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1)
    SELECT source, n_docs, n_tokens,
           CAST(1000 * n_tokens
                // greatest(CAST((SELECT sum(n_tokens) FROM s) AS BIGINT),
                            1) AS BIGINT) AS weight_permille,
           CAST(1000 * n_docs
                // greatest(CAST((SELECT sum(n_docs) FROM s) AS BIGINT),
                            1) AS BIGINT) AS doc_share_permille
    FROM s
    """


TFIDF_K = 3
TFIDF_MAX_VOCAB = 50_000_000   # df-table broadcast bound (token + int64)


def _tfidf_flat_pairs(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, token, tf) rows for a batch.  EXACT globally:
    a document is one input row, so every (doc, token) pair lives in
    exactly one batch — per-batch tf needs no cross-batch combine and
    the pair rows double as the df combiner (one row per distinct pair)."""
    trimmed = ascii_trim(t.column("text"))
    sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
    schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                        ("tf", pa.int64())])
    if sub.num_rows == 0:
        return schema.empty_table()
    toks = pc.split_pattern_regex(ascii_trim(sub.column("text")), _WS_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
    flat = pa.table({"doc_id": pa.array(parents, pa.int64()),
                     "token": pc.list_flatten(toks)})
    return (flat.group_by(["doc_id", "token"])
            .aggregate([("token", "count")])
            .rename_columns(["doc_id", "token", "tf"]).cast(schema))


def _topk_per_doc(tbl: pa.Table, k: int) -> pa.Table:
    """Deterministic per-doc top-k: (score_milli DESC, token ASC) within
    doc — vectorized rank over the sorted table, no Python per-row work."""
    s = tbl.sort_by([("doc_id", "ascending"),
                     ("score_milli", "descending"),
                     ("token", "ascending")])
    d = s.column("doc_id").to_numpy()
    if len(d) == 0:
        return pa.table({"doc_id": d, "rank": d,
                         "token": s.column("token"),
                         "score_milli": s.column("score_milli")})
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    grp = np.repeat(starts, np.diff(np.r_[starts, len(d)]))
    rank = np.arange(len(d), dtype=np.int64) - grp + 1
    keep = rank <= k
    return pa.table({"doc_id": s.column("doc_id").filter(pa.array(keep)),
                     "rank": pa.array(rank[keep], pa.int64()),
                     "token": s.column("token").filter(pa.array(keep)),
                     "score_milli": s.column("score_milli")
                     .filter(pa.array(keep))})


def tfidf_topk(sf_dir: str, *, k: int = TFIDF_K):
    """Per-document top-k keywords by tf-idf (linear-idf variant in
    integer milli-units: ``score = tf * ((1000 * N) // df)`` — integer
    end-to-end so the DuckDB mirror matches hash-exactly; ln-idf would
    rank identically for fixed tf since N/df is monotone).

    100-TB shape: tf is map-side exact (a doc is one row); the only
    exchange is the vocab-sized token groupby building the df table,
    pre-combined per batch to distinct (doc, token) rows; df broadcasts
    ONCE via ``ray.put`` under a distributed-count gate and every batch
    scores + top-ks its own docs with one ``index_in`` and one vectorized
    rank — no doc-keyed exchange at all.  Beyond the vocab bound this
    auto-dispatches to ``tfidf_topk_cogroup`` (two narrow keyed
    exchanges, no driver vocabulary)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    n_docs = ds.count()   # parquet metadata count — no data scan

    df_ds = (ds.map_batches(
        lambda t: (_tfidf_flat_pairs(t).group_by("token")
                   .aggregate([("token", "count")])
                   .rename_columns(["token", "df"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token").sum("df")).materialize()
    if df_ds.count() > TFIDF_MAX_VOCAB:
        return tfidf_topk_cogroup(sf_dir, k=k)
    parts = [b for b in df_ds.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    dft = (pa.concat_tables(parts).combine_chunks() if parts
           else pa.schema([("token", pa.string()),
                           ("sum(df)", pa.int64())]).empty_table())
    df_ref = ray.put((dft.column("token").combine_chunks(),
                      dft.column("sum(df)").to_numpy(zero_copy_only=False)))

    def score(t: pa.Table) -> pa.Table:
        pairs = _tfidf_flat_pairs(t)
        if pairs.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("rank", pa.int64()),
                              ("token", pa.string()),
                              ("score_milli", pa.int64())]).empty_table()
        toks, dfs = ray.get(df_ref)
        pos = pc.index_in(pairs.column("token"), value_set=toks) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        idf_milli = (1000 * n_docs) // dfs[pos]
        score_milli = pairs.column("tf").to_numpy() * idf_milli
        return _topk_per_doc(
            pairs.append_column("score_milli",
                                pa.array(score_milli, pa.int64()))
            .drop_columns(["tf"]), k)

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_topk_cogroup(sf_dir: str, *, k: int = TFIDF_K):
    """Beyond-broadcast tf-idf: NO driver-held vocabulary.  Exchange 1 is
    token-keyed (all rows of a token co-locate, so df is shard-exact and
    attaches in-shard via one ``index_in``); exchange 2 is doc-keyed (all
    scored terms of a doc co-locate, so the top-k rank is shard-exact).
    Equivalence with the broadcast path is pytest-enforced."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    n_docs = ds.count()

    def tok_partial(t: pa.Table) -> pa.Table:
        return add_bucket(_tfidf_flat_pairs(t), "token",
                          FAMILIARITY_COGROUP_BUCKETS)

    def tok_shard(g: pa.Table) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                            ("score_milli", pa.int64())])
        if g.num_rows == 0:
            return schema.empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        dft = (g.select(["token", "tf"]).group_by("token")
               .aggregate([("token", "count")]))
        pos = pc.index_in(g.column("token"),
                          value_set=dft.column("token").combine_chunks())
        dfs = dft.column("token_count").combine_chunks().take(pos) \
                 .to_numpy(zero_copy_only=False)
        idf_milli = (1000 * n_docs) // dfs
        return pa.table({
            "doc_id": g.column("doc_id"),
            "token": g.column("token"),
            "score_milli": pa.array(
                g.column("tf").to_numpy() * idf_milli, pa.int64()),
        })

    scored = (ds.map_batches(tok_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bucket").map_groups(tok_shard,
                                            batch_format="pyarrow"))

    def doc_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                              ("score_milli", pa.int64()),
                              ("bucket", pa.int64())]).empty_table()
        return add_bucket(t, "doc_id", FAMILIARITY_COGROUP_BUCKETS)

    def doc_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("rank", pa.int64()),
                              ("token", pa.string()),
                              ("score_milli", pa.int64())]).empty_table()
        return _topk_per_doc(g.drop_columns(["bucket"]).combine_chunks(), k)

    return (scored.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_shard,
                                          batch_format="pyarrow"))


def tfidf_topk_sql(*, k: int = TFIDF_K) -> str:
    ws = _WS_SQL
    return f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS token
      FROM documents WHERE trim(text, {ws}) <> ''),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tk GROUP BY 1, 2),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
           FROM (SELECT DISTINCT doc_id, token FROM tk) GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    s AS (SELECT tf.doc_id, tf.token,
                 tf.tf * ((1000 * n.n) // df.df) AS score_milli
          FROM tf JOIN df USING (token) CROSS JOIN n),
    r AS (SELECT doc_id, token, CAST(score_milli AS BIGINT) AS score_milli,
                 CAST(row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_milli DESC, token ASC) AS BIGINT) AS rank
          FROM s)
    SELECT doc_id, rank, token, score_milli FROM r WHERE rank <= {k}
    """


DECONTAMINATE_REF_MOD = 10
# broadcast bound for the benchmark/reference text set (decontamination
# references — eval benchmarks, held-out test sets — are MBs, not TBs;
# if a reference ever exceeded this, the same digest-cogroup shape as
# familiarity_cogroup applies)
DECONTAMINATE_MAX_REF_DOCS = 10_000_000


def decontaminate(sf_dir: str, ref_mod: int = DECONTAMINATE_REF_MOD):
    """Benchmark decontamination: drop every training document whose text
    EXACTLY matches a reference-set document (the held-out-eval-overlap
    scrub every large-scale training pipeline runs).  The reference set
    here is the deterministic slice doc_id %% ref_mod == 0 (a stand-in
    for an external benchmark corpus); its texts are collected once and
    broadcast via ``ray.put`` — reference sets are MBs by nature, so the
    broadcast is the honest 100-TB shape (the training stream is never
    shuffled at all).  Returns the surviving training doc_ids."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def ref_part(t: pa.Table) -> pa.Table:
        mod = (t.column("doc_id").to_numpy() % ref_mod) == 0
        return t.filter(pa.array(mod)).select(["text"])

    ref_ds = ds.map_batches(ref_part, batch_format="pyarrow").materialize()
    # enforce the broadcast bound with a distributed count BEFORE any
    # driver-side collect — the bound must protect the driver, not fire
    # after it has already held the oversized set
    if ref_ds.count() > DECONTAMINATE_MAX_REF_DOCS:
        raise ValueError("reference set exceeds the broadcast bound — "
                         "use a digest cogroup (familiarity_cogroup shape)")
    parts = [b for b in ref_ds.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    # NULL reference text matches nothing (NOT EXISTS contract) — and
    # pc.is_in would otherwise match NULL-to-NULL
    ref = (pa.concat_tables(parts).column("text").combine_chunks()
           .drop_null() if parts else pa.array([], pa.string()))
    ref_ref = ray.put(ref)

    def scrub(t: pa.Table) -> pa.Table:
        train = t.filter(pa.array(
            (t.column("doc_id").to_numpy() % ref_mod) != 0))
        if train.num_rows == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        # NULL text never matches a reference doc (the NOT EXISTS
        # contract: NULL = NULL is no match) — fill_null keeps such rows
        hit = pc.fill_null(pc.is_in(train.column("text"),
                                    value_set=ray.get(ref_ref)), False)
        return (train.filter(pc.invert(hit))
                .select(["doc_id"])
                .cast(pa.schema([("doc_id", pa.int64())])))
    return ds.map_batches(scrub, batch_format="pyarrow")


def decontaminate_sql(ref_mod: int = DECONTAMINATE_REF_MOD) -> str:
    # NOT EXISTS, not NOT IN: a single NULL-text reference row would make
    # NOT IN evaluate to NULL for EVERY candidate (empty result); the
    # engine's contract is that NULL never matches anything
    return f"""
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id % {ref_mod} <> 0
      AND NOT EXISTS (SELECT 1 FROM documents r
                      WHERE r.doc_id % {ref_mod} = 0
                        AND r.text = d.text)
    """


NGRAM_DECON_N = 4       # 13 in production pipelines (GPT-3 appendix C);
#                         4 on the synthetic vocabulary so the small-SF
#                         result is non-trivial (n=13 never collides there)
DECON_NGRAM_MAX_REF_HASHES = 50_000_000   # 8 B/hash → ≤400 MB broadcast


def _ngram_hashes(text_col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat 64-bit hashes of whitespace token n-grams (tokens joined by
    one space — the SQL mirror's ``tok || ' ' || lead(tok,1)...`` string)
    plus the owning row index per hash.  Fully vectorized: ONE regex
    split, n shifted slices of the flat token array joined element-wise
    in one kernel call, a numpy doc-boundary mask, one hash pass.
    Requires n >= 2 (the empty-text sentinel token must not form a gram).
    """
    import pandas as pd

    txt = pc.fill_null(ascii_trim(text_col), "")
    toks = pc.split_pattern_regex(txt, _WS_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values
    cnt = np.maximum(offsets[1:] - offsets[:-1] - (n - 1), 0)
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    parts = [flat.slice(j, len(flat) - n + 1) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    # absolute flat-start index of every within-document n-gram
    starts = np.repeat(offsets[:-1], cnt)
    within = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(cnt) - cnt, cnt))
    sel = grams.take(pa.array(starts + within, pa.int64()))
    h = pd.util.hash_array(
        sel.to_numpy(zero_copy_only=False)).astype(np.uint64)
    doc_idx = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    return h, doc_idx


def decontaminate_ngram(sf_dir: str, ref_mod: int = DECONTAMINATE_REF_MOD,
                        n: int = NGRAM_DECON_N):
    """Fuzzy (n-gram-overlap) benchmark decontamination — the GPT-3-style
    13-gram scrub: drop every training document sharing at least one
    whitespace token n-gram with any reference-set document.  Subsumes the
    exact scrub (``decontaminate``) for n <= doc length and catches
    partial/embedded contamination exact matching misses.

    100-TB shape: the reference n-gram set is benchmark-sized by nature —
    its unique 64-bit hashes are collected once (bounded by a distributed
    count BEFORE any driver collect) and broadcast via ``ray.put`` as ONE
    sorted uint64 array; every training batch probes it with a numpy
    searchsorted — the training stream is never shuffled.  Beyond the
    broadcast bound, the escape is the digest-cogroup shape
    (``familiarity_cogroup``).  The SQL oracle compares n-gram STRINGS
    (exact semantics); results agree absent a 64-bit hash collision
    (P < 1e-9 per ~10^5-gram reference set — the dedup_exact digest
    discipline)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def ref_part(t: pa.Table) -> pa.Table:
        mod = (t.column("doc_id").to_numpy() % ref_mod) == 0
        sub = t.filter(pa.array(mod))
        h, _ = _ngram_hashes(sub.column("text"), n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    ref_ds = ds.map_batches(ref_part, batch_format="pyarrow").materialize()
    if ref_ds.count() > DECON_NGRAM_MAX_REF_HASHES:
        raise ValueError("reference n-gram set exceeds the broadcast "
                         "bound — use a digest cogroup "
                         "(familiarity_cogroup shape)")
    parts = [b.column("h").to_numpy() for b in
             ref_ds.iter_batches(batch_format="pyarrow") if b.num_columns]
    ref = (np.unique(np.concatenate(parts)) if parts
           else np.empty(0, np.uint64))
    ref_ref = ray.put(ref)

    def scrub(t: pa.Table) -> pa.Table:
        train = t.filter(pa.array(
            (t.column("doc_id").to_numpy() % ref_mod) != 0))
        out_schema = pa.schema([("doc_id", pa.int64())])
        if train.num_rows == 0:
            return out_schema.empty_table()
        refs = ray.get(ref_ref)
        hit_doc = np.zeros(train.num_rows, bool)
        h, doc_idx = _ngram_hashes(train.column("text"), n)
        if len(h) and len(refs):
            pos = np.clip(np.searchsorted(refs, h), 0, len(refs) - 1)
            hit_doc[doc_idx[refs[pos] == h]] = True
        return (train.filter(pa.array(~hit_doc))
                .select(["doc_id"]).cast(out_schema))
    return ds.map_batches(scrub, batch_format="pyarrow")


def decontaminate_ngram_sql(ref_mod: int = DECONTAMINATE_REF_MOD,
                            n: int = NGRAM_DECON_N) -> str:
    ws = "' ' || chr(9) || chr(10) || chr(12) || chr(13)"
    leads = " || ' ' || ".join(f"lead(tok, {j}) OVER w" for j in range(1, n))
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS tok,
             generate_subscripts(
               regexp_split_to_array(trim(text, {ws}), '\\s+'), 1) AS pos
      FROM documents WHERE text IS NOT NULL),
    ng AS (
      SELECT doc_id, tok || ' ' || {leads} AS ngram
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING)
      QUALIFY lead(tok, {n - 1}) OVER w IS NOT NULL),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM ng g
      JOIN (SELECT DISTINCT ngram FROM ng WHERE doc_id % {ref_mod} = 0) r
        USING (ngram)
      WHERE g.doc_id % {ref_mod} <> 0)
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id % {ref_mod} <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """


# --------------------------------------------------------------------------
# Duplicated-substring signal (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better"): per document, how many of its
# token n-gram positions are covered by an n-gram that occurs MORE THAN
# ONCE corpus-wide — the map a substring-dedup pass (their suffix-array
# ExactSubstr) would cut.  Corpus-vs-corpus, so unlike the
# decontamination scrub there is no small side to broadcast: the gram
# side shuffles 64-bit hashes (the dedup_exact digest discipline), never
# gram strings.
# --------------------------------------------------------------------------

DUPSPAN_BUCKETS = 256
_DUPSPAN_PART = pa.schema([("doc_id", pa.int64()), ("ns", pa.int64()),
                           ("dup", pa.int64()), ("bucket", pa.int64())])
_DUPSPAN_OUT = pa.schema([("doc_id", pa.int64()), ("n_spans", pa.int64()),
                          ("n_dup_spans", pa.int64())])


def dup_spans(sf_dir: str, n: int = NGRAM_DECON_N):
    """Per-doc duplicated-substring coverage: n_spans = token n-gram
    positions, n_dup_spans = positions whose n-gram occurs >= 2 times in
    the whole corpus (same-doc repeats included, matching the SQL
    mirror's global count).  Two narrow keyed exchanges: (1) gram-hash
    keyed — per-batch (h, doc_id, n) combiner rows, each shard computes
    the global per-gram count and folds per-doc partials in-shard;
    (2) doc-keyed final sum.  Zero-span docs ride pass 1 as n=0 sentinel
    rows (they contribute nothing to any sum, so even a sentinel/real
    hash collision is harmless).  Results equal the string semantics
    absent a 64-bit gram-hash collision (dedup_exact's documented
    collision math)."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        h, doc_idx = _ngram_hashes(t.column("text"), n)
        doc_ids = t.column("doc_id").to_numpy()
        p = (pa.table({"h": pa.array(h.view(np.int64), pa.int64()),
                       "doc_id": pa.array(doc_ids[doc_idx], pa.int64())})
             .group_by(["h", "doc_id"]).aggregate([("h", "count")]))
        p = pa.table({"h": p.column("h"), "doc_id": p.column("doc_id"),
                      "n": p.column("h_count").cast(pa.int64())})
        has = np.zeros(len(doc_ids), bool)
        has[doc_idx] = True
        rest = doc_ids[~has]
        if len(rest):
            z = pa.array([0] * len(rest), pa.int64())
            p = pa.concat_tables([p, pa.table({
                "h": z, "doc_id": pa.array(rest, pa.int64()), "n": z})])
        return add_bucket(p, "h", DUPSPAN_BUCKETS)

    def gram_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _DUPSPAN_PART.empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        tot = g.select(["h", "n"]).group_by("h").aggregate([("n", "sum")])
        pos = pc.index_in(g.column("h"),
                          value_set=tot.column("h").combine_chunks())
        c = tot.column("n_sum").combine_chunks().take(pos)
        dup = pc.if_else(pc.greater_equal(c, 2), g.column("n"),
                         pa.scalar(0, pa.int64()))
        out = (pa.table({"doc_id": g.column("doc_id"),
                         "ns": g.column("n"), "dup": dup})
               .group_by("doc_id")
               .aggregate([("ns", "sum"), ("dup", "sum")]))
        return add_bucket(pa.table({
            "doc_id": out.column("doc_id").cast(pa.int64()),
            "ns": out.column("ns_sum").cast(pa.int64()),
            "dup": out.column("dup_sum").cast(pa.int64())}),
            "doc_id", DUPSPAN_BUCKETS)

    def doc_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _DUPSPAN_OUT.empty_table()
        out = (g.drop_columns(["bucket"]).combine_chunks()
               .group_by("doc_id")
               .aggregate([("ns", "sum"), ("dup", "sum")]))
        return pa.Table.from_arrays(
            [out.column("doc_id").cast(pa.int64()),
             out.column("ns_sum").cast(pa.int64()),
             out.column("dup_sum").cast(pa.int64())],
            schema=_DUPSPAN_OUT)

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(gram_shard,
                                          batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_shard,
                                          batch_format="pyarrow"))


def dup_spans_sql(n: int = NGRAM_DECON_N) -> str:
    ws = _WS_SQL
    leads = " || ' ' || ".join(f"lead(tok, {j}) OVER w" for j in range(1, n))
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+')) AS tok,
             generate_subscripts(
               regexp_split_to_array(trim(text, {ws}), '\\s+'), 1) AS pos
      FROM documents WHERE text IS NOT NULL),
    ng AS (
      SELECT doc_id, tok || ' ' || {leads} AS ngram
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING)
      QUALIFY lead(tok, {n - 1}) OVER w IS NOT NULL),
    g AS (SELECT ngram, count(*) AS c FROM ng GROUP BY 1),
    a2 AS (SELECT ng.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_dup_spans
           FROM ng JOIN g USING (ngram) GROUP BY 1)
    SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
           coalesce(n_dup_spans, 0) AS n_dup_spans
    FROM documents d LEFT JOIN a2 USING (doc_id)
    """


def text_quality(sf_dir: str):
    """Composite quality signals in integer permille (deterministic under
    any execution order, unlike float ratios): digit density, stopword
    density, plus a 0-3 rule score."""
    stats = text_stats(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        n_tok = t.column("n_tokens")
        n_chars = t.column("n_chars")
        digit_pm = pc.if_else(
            pc.equal(n_chars, 0), 0,
            pc.divide(pc.multiply(t.column("digit_chars"), 1000), n_chars))
        stop_pm = pc.if_else(
            pc.equal(n_tok, 0), 0,
            pc.divide(pc.multiply(t.column("stop_hits"), 1000), n_tok))
        score = pc.add(
            pc.add(
                pc.cast(pc.and_(pc.greater_equal(n_tok, 5),
                                pc.less_equal(n_tok, 1000)), pa.int64()),
                pc.cast(pc.less(digit_pm, 300), pa.int64())),
            pc.cast(pc.greater(stop_pm, 50), pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "digit_pm": pc.cast(digit_pm, pa.int64()),
                         "stop_pm": pc.cast(stop_pm, pa.int64()),
                         "quality": score})
    return stats.map_batches(fn, batch_format="pyarrow")


def text_quality_sql() -> str:
    return r"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\s+')) END
               AS n_tokens,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS stop_hits,
             len(regexp_extract_all(text, '[0-9]')) AS digit_chars
      FROM documents)
    SELECT doc_id,
           CASE WHEN n_chars = 0 THEN 0
                ELSE digit_chars * 1000 // n_chars END AS digit_pm,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE stop_hits * 1000 // n_tokens END AS stop_pm,
           (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 1 ELSE 0 END
            + CASE WHEN (CASE WHEN n_chars = 0 THEN 0
                         ELSE digit_chars * 1000 // n_chars END) < 300
                   THEN 1 ELSE 0 END
            + CASE WHEN (CASE WHEN n_tokens = 0 THEN 0
                         ELSE stop_hits * 1000 // n_tokens END) > 50
                   THEN 1 ELSE 0 END)::BIGINT AS quality
    FROM s
    """


HASH_DIM = 256


def hashed_vectors(sf_dir: str, *, dim: int = HASH_DIM):
    """Feature-hashed bag-of-words counts per document — the
    EmbeddingGenerator analog (``joern-cli/.../JoernVectors.scala:98-120``:
    substructure counts keyed by MurmurHash), emitted sparse as
    (doc_id, bucket, n).  Hashing = deterministic pandas hash_array
    (vectorized), bucket = hash % dim."""
    import pandas as pd

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        sub = t.filter(pc.not_equal(trimmed, ""))
        trimmed = ascii_trim(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        buckets = (pd.util.hash_array(flat) % dim).astype("int64")
        return (pa.table({"doc_id": pa.array(parents, pa.int64()),
                          "bucket": pa.array(buckets, pa.int64())})
                .group_by(["doc_id", "bucket"])
                .aggregate([("bucket", "count")])
                .rename_columns(["doc_id", "bucket", "n"]))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class TextModelScorer:
    """Actor-pool batched model-inference stage — the NER/quality-model
    scoring discipline every training-data pipeline needs: the "model"
    (a deterministic logistic head over the HASH_DIM feature-hash space)
    loads ONCE per actor in ``__init__``; ``__call__`` scores a whole
    batch with one matmul.  Swap the fake weights for real model weights
    and nothing else changes (same contract as the multimodal stages).

    Use: ds.map_batches(TextModelScorer, concurrency=(2, 8),
                        batch_size=2048, num_cpus=1, batch_format="pyarrow")
    """

    def __init__(self, *, dim: int = HASH_DIM, seed: int = 23):
        self.dim = dim
        self.w = np.random.default_rng(seed).standard_normal(dim)
        self.b = -0.5

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd
        trimmed = ascii_trim(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(t.num_rows), lengths)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        buckets = (pd.util.hash_array(flat) % self.dim).astype("int64")
        feats = np.zeros((t.num_rows, self.dim))
        np.add.at(feats, (rows, buckets), 1.0)
        logits = feats @ self.w + self.b
        score = 1.0 / (1.0 + np.exp(-logits))
        return pa.table({"doc_id": t.column("doc_id"),
                         "model_score": pa.array(score, pa.float64())})


def model_scores(sf_dir: str):
    """documents → per-doc model score via the actor-pool scorer."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(TextModelScorer, concurrency=(1, 4),
                          batch_size=2048, num_cpus=1,
                          batch_format="pyarrow")


def doc_fingerprint(sf_dir: str):
    """Content fingerprint (md5 — matches DuckDB's md5() for the oracle)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})
    return ds.map_batches(fn, batch_format="pyarrow")


def doc_fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


BPE_MERGES = 48
BPE_TRAIN_DOCS = 512      # merges train on this bounded doc_id-prefix
BPE_EOW = "\x17"          # end-of-word sentinel symbol


def _bpe_merge_sym(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe_merges(sf_dir: str, *, n_merges: int = BPE_MERGES,
                     train_docs: int = BPE_TRAIN_DOCS
                     ) -> list[tuple[str, str]]:
    """BPE tokenizer TRAINING (Sennrich et al. 2016): learn merge rules
    from word frequencies of a BOUNDED deterministic sample (doc_id <
    train_docs via parquet pushdown — tokenizer training is sample-based
    by universal practice; the corpus-scale stage is APPLY).  Ties break
    lexicographically so the merge list is deterministic."""
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(_p(sf_dir), columns=["doc_id", "text"],
                      filters=[("doc_id", "<", train_docs)])
    wc: Counter = Counter()
    txt = pc.fill_null(ascii_trim(t.column("text")), "")
    for s in txt.to_pylist():
        if s:
            wc.update(s.split())
    vocab = {tuple(w) + (BPE_EOW,): c for w, c in wc.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_bpe_merge_sym(sym, best): cnt
                 for sym, cnt in vocab.items()}
    return merges


def bpe_encode_word(word: str, ranks: dict) -> int:
    """Greedy lowest-rank-first BPE encode; returns the TOKEN COUNT
    (incl. the end-of-word sentinel fused into its final token)."""
    sym = list(word) + [BPE_EOW]
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        sym = list(_bpe_merge_sym(tuple(sym), best_pair))
    return len(sym)


class BpeEncoder:
    """Actor-pool BPE APPLY stage: merge ranks load once per actor
    (``__init__``); per batch the flat word array reduces to its UNIQUE
    words (vocabulary-bounded work — the token-hash-memo discipline),
    each encoded once through a persistent cross-batch memo, and per-doc
    token counts come from one vectorized scatter-add."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def _ntok(self, w: str) -> int:
        n = self.memo.get(w)
        if n is None:
            n = bpe_encode_word(w, self.ranks)
            self.memo[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = pc.fill_null(ascii_trim(t.column("text")), "")
        toks = pc.split_pattern_regex(txt, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        out = np.zeros(t.num_rows, np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            per_uniq = np.fromiter((self._ntok(w) for w in uniq),
                                   np.int64, len(uniq))
            rows = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                             lengths)
            np.add.at(out, rows, per_uniq[inv])
        # whitespace-only/empty text yields one "" word → count it as 0
        empty = pc.equal(txt, "").to_numpy(zero_copy_only=False)
        out[empty] = 0
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "n_bpe_tokens": pa.array(out, pa.int64())})


def _sql_str(x: str) -> str:
    """SQL string expression for ``x``, control characters via chr()."""
    parts: list[str] = []
    run = ""
    for ch in x:
        if ord(ch) < 32 or ch == "'":
            if run:
                parts.append("'" + run + "'")
                run = ""
            parts.append(f"chr({ord(ch)})" if ord(ch) < 32 else "''''")
        else:
            run += ch
    if run:
        parts.append("'" + run + "'")
    return " || ".join(parts) if parts else "''"


def bpe_token_counts_sql(merges: list[tuple[str, str]],
                         rel: str = "documents") -> str:
    """DuckDB mirror of the BPE APPLY stage (r5).  The merge list comes
    from the shared training implementation (``train_bpe_merges`` — one
    source of truth, the rule-pack discipline); the APPLY is implemented
    independently: each word becomes a delimiter-wrapped symbol string
    (chr(2) sym chr(3) per symbol, so adjacent matches cannot share
    delimiters), each merge is one non-overlapping left-to-right
    ``replace`` — valid because BPE merges applied in rank order equal
    the greedy lowest-rank-first encode (any pair containing a merged
    token necessarily ranks after the merge that created the token) and
    ``replace``'s left-to-right scan equals ``_bpe_merge_sym``'s — and
    the token count is the surviving chr(2) count.  Unique words encode
    once (the engine's unique-word memo, mirrored relationally)."""
    def rep(x: str) -> str:
        return f"chr(2) || {_sql_str(x)} || chr(3)"

    expr = "s0"
    for a, b in merges:
        expr = f"replace({expr}, {rep(a)} || {rep(b)}, {rep(a + b)})"
    eow = rep(BPE_EOW)
    return f"""
    WITH d AS (SELECT doc_id,
                      trim(text, ' ' || chr(9) || chr(10) || chr(12)
                           || chr(13)) AS txt
               FROM {rel}),
    w AS (SELECT doc_id, unnest(regexp_split_to_array(txt, '\\s+')) AS word
          FROM d WHERE txt <> '' AND txt IS NOT NULL),
    uw AS (SELECT DISTINCT word FROM w),
    ue AS (SELECT word,
                  CAST(len(s) - len(replace(s, chr(2), '')) AS BIGINT)
                    AS ntok
           FROM (SELECT word, {expr} AS s
                 FROM (SELECT word,
                              regexp_replace(word, '(.)',
                                             chr(2) || '\\1' || chr(3),
                                             'g') || {eow} AS s0
                       FROM uw))),
    per_doc AS (SELECT w.doc_id, CAST(sum(ue.ntok) AS BIGINT) AS n
                FROM w JOIN ue USING (word) GROUP BY 1)
    SELECT d.doc_id, coalesce(per_doc.n, 0) AS n_bpe_tokens
    FROM d LEFT JOIN per_doc USING (doc_id)
    """


def bpe_token_counts(sf_dir: str, *, n_merges: int = BPE_MERGES,
                     train_docs: int = BPE_TRAIN_DOCS):
    """Tokenizer train + corpus-scale apply: per-doc BPE token counts.
    Oracle-backed since r5 (``bpe_token_counts_sql`` — shared training,
    independent SQL apply); determinism, a merge-training golden and
    serial-encoder equivalence are pytest-enforced."""
    merges = train_bpe_merges(sf_dir, n_merges=n_merges,
                              train_docs=train_docs)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(BpeEncoder, fn_constructor_kwargs={
        "merges": merges}, concurrency=(1, 4), batch_size=2048,
        num_cpus=1, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

_DEDUP_BUCKETS = 256
_DEDUP_OUT = pa.schema([("doc_id", pa.int64()), ("n_copies", pa.int64())])


def _digest_partial(t: pa.Table) -> pa.Table:
    """Per-batch exact-dedup combiner keyed on a 128-bit text DIGEST
    (two independent 64-bit hashes): the shuffle carries 32-byte key rows
    instead of whole documents — at 100 TB the text column never enters
    the exchange.  Collision bound: for n docs the expected number of
    128-bit collisions is n^2 / 2^129 (≈ 3e-19 at n = 10^10), i.e. the
    digest groups equal the text groups."""
    import pandas as pd

    tnp = t.column("text").to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(tnp).view("int64")
    h2 = pd.util.hash_array(tnp, hash_key="joernraydedup2nd").view("int64")
    p = (pa.table({"h1": pa.array(h1, pa.int64()),
                   "h2": pa.array(h2, pa.int64()),
                   "doc_id": t.column("doc_id").cast(pa.int64())})
         .group_by(["h1", "h2"])
         .aggregate([("doc_id", "min"), ("doc_id", "count")]))
    return p.append_column(
        "bucket", pc.bit_wise_and(p.column("h1"),
                                  _DEDUP_BUCKETS - 1).cast(pa.int64()))


def _digest_shard(g: pa.Table) -> pa.Table:
    if g.num_rows == 0:
        return _DEDUP_OUT.empty_table()
    out = (g.drop_columns(["bucket"]).combine_chunks()
           .group_by(["h1", "h2"])
           .aggregate([("doc_id_min", "min"), ("doc_id_count", "sum")]))
    return pa.Table.from_arrays(
        [out.column("doc_id_min_min").cast(pa.int64()),
         out.column("doc_id_count_sum").cast(pa.int64())],
        schema=_DEDUP_OUT)


def dedup_exact(sf_dir: str):
    """Exact dedup: keep min doc_id + copy count per distinct text
    (groupby.first discipline, ``FileCreationPass`` get-or-create analog).
    Two-phase: per-batch digest combiner (``_digest_partial``) then one
    bucketed exchange resolved with a vectorized in-shard groupby — no
    full-text shuffle, no per-key Python groups."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return _tidy(ds.map_batches(_digest_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("bucket")
                 .map_groups(_digest_shard, batch_format="pyarrow"))


def dedup_exact_sql() -> str:
    return """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """


# ---------------------------------------------------------------------------
# cross-source token-overlap matrix (contamination between sources)
# ---------------------------------------------------------------------------

def source_overlap(sf_dir: str, *, n_buckets: int = 64):
    """Exact pairwise Jaccard between sources over their DISTINCT token
    sets — the cross-source contamination matrix a corpus curator reads
    before mixing sources.  Output: (source_a, source_b, n_common,
    n_union, jaccard_ppm) for every source pair sharing ≥1 token,
    source_a < source_b, integer parts-per-million (no float hashing).

    100-TB shape: the corpus reduces map-side to per-batch DISTINCT
    (source, token) pairs — vocabulary-bounded, not corpus-bounded — and
    ONE token-bucketed exchange computes per-bucket source set sizes and
    pairwise co-occurrence counts (an in-shard Acero self-join on token).
    Because Jaccard components are additive over disjoint token buckets,
    the global reduce is a (k² + k)-row sum for k sources, finalized in
    a single tiny group."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["source", "text"])
    schema = pa.schema([("source_a", pa.string()),
                        ("source_b", pa.string()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = ascii_trim(t.column("text"))
        sub = t.filter(pc.fill_null(pc.not_equal(trimmed, ""), False))
        out_schema = pa.schema([("source", pa.string()),
                                ("token", pa.string()),
                                ("bucket", pa.int64())])
        if sub.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern_regex(ascii_trim(sub.column("text")),
                                      _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(np.repeat(
            sub.column("source").to_numpy(zero_copy_only=False), n_per),
            pa.string())
        pairs = (pa.table({"source": src, "token": pc.list_flatten(toks)})
                 .group_by(["source", "token"]).aggregate([]))
        import pandas as pd
        h = pd.util.hash_array(
            pairs.column("token").to_numpy(zero_copy_only=False))
        return pairs.append_column(
            "bucket", pa.array((h & (n_buckets - 1)).astype("int64"),
                               pa.int64())).cast(out_schema)

    def shard(g: pa.Table) -> pa.Table:
        g = (g.drop_columns(["bucket"]).combine_chunks()
             .group_by(["source", "token"]).aggregate([]))
        if g.num_rows == 0:
            return schema.empty_table()
        sizes = (g.group_by("source").aggregate([([], "count_all")])
                 .select(["source", "count_all"]))
        size_t = pa.table({
            "source_a": sizes.column("source").cast(pa.string()),
            "source_b": pa.array([""] * sizes.num_rows, pa.string()),
            "n": sizes.column("count_all").cast(pa.int64())})
        right = pa.table({"token": g.column("token"),
                          "source_b": g.column("source")})
        j = g.join(right, keys=["token"], join_type="inner")
        j = j.filter(pc.less(j.column("source"), j.column("source_b")))
        if j.num_rows == 0:
            return size_t.cast(schema)
        inter = (j.group_by(["source", "source_b"])
                 .aggregate([([], "count_all")])
                 .select(["source", "source_b", "count_all"])
                 .rename_columns(["source_a", "source_b", "n"]))
        return pa.concat_tables([size_t.cast(schema), inter.cast(schema)])

    def finalize(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["one"])
        out_schema = pa.schema([
            ("source_a", pa.string()), ("source_b", pa.string()),
            ("n_common", pa.int64()), ("n_union", pa.int64()),
            ("jaccard_ppm", pa.int64())])
        is_size = pc.equal(t.column("source_b"), "")
        sz = dict(zip(t.filter(is_size).column("source_a").to_pylist(),
                      t.filter(is_size).column("n").to_pylist()))
        pt = t.filter(pc.invert(is_size))
        sa = pt.column("source_a").to_pylist()
        sb = pt.column("source_b").to_pylist()
        i = np.asarray(pt.column("n").to_pylist(), dtype=np.int64)
        u = np.asarray([sz[a] + sz[b] for a, b in zip(sa, sb)],
                       dtype=np.int64) - i
        return pa.table({
            "source_a": pa.array(sa, pa.string()),
            "source_b": pa.array(sb, pa.string()),
            "n_common": pa.array(i, pa.int64()),
            "n_union": pa.array(u, pa.int64()),
            "jaccard_ppm": pa.array(1_000_000 * i // u, pa.int64())})

    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bucket").map_groups(shard, batch_format="pyarrow")
              .groupby(["source_a", "source_b"])
              .aggregate(Sum(on="n", alias_name="n")))
    return (summed.map_batches(
        lambda t: t.append_column("one", pa.array([0] * t.num_rows,
                                                  pa.int64()))
        if t.num_columns else pa.schema(
            [("source_a", pa.string()), ("source_b", pa.string()),
             ("n", pa.int64()), ("one", pa.int64())]).empty_table(),
        batch_format="pyarrow")
        .groupby("one").map_groups(finalize, batch_format="pyarrow"))


def source_overlap_sql() -> str:
    ws = _WS_SQL
    return f"""
    WITH tok AS (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(trim(text, {ws}), '\\s+'))
               AS token
      FROM documents WHERE trim(text, {ws}) <> ''),
    sz AS (SELECT source, count(*) AS n FROM tok GROUP BY 1),
    iv AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS i
      FROM tok a JOIN tok b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(i AS BIGINT) AS n_common,
           CAST(sa.n + sb.n - i AS BIGINT) AS n_union,
           CAST((1000000 * i) // (sa.n + sb.n - i) AS BIGINT)
             AS jaccard_ppm
    FROM iv JOIN sz sa ON sa.source = iv.source_a
            JOIN sz sb ON sb.source = iv.source_b
    """


# ---------------------------------------------------------------------------
# snapshot (incremental) dedup: new docs vs a prior corpus snapshot
# ---------------------------------------------------------------------------

SNAPSHOT_MOD = 5          # prior snapshot = doc_id % SNAPSHOT_MOD == 0
BLOOM_BITS = 1 << 23      # 1 MiB bit array; ~1% FP at ~10^6 prior keys
_BLOOM_K = 4              # Kirsch-Mitzenmacher double-hash probes


def _bloom_positions(h1: "np.ndarray", h2: "np.ndarray",
                     m_bits: int) -> "np.ndarray":
    """(n, k) probe positions from two 64-bit digests (h + i*h2 mod m)."""
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1.astype(np.uint64)[:, None]
             + i[None, :] * h2.astype(np.uint64)[:, None])
            % np.uint64(m_bits))


def _doc_digest_np(text_col: pa.ChunkedArray):
    import pandas as pd
    tnp = text_col.to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(tnp).view("int64")
    h2 = pd.util.hash_array(tnp, hash_key="joernraydedup2nd").view("int64")
    return h1, h2


BLOOM_BITS_CAP = 1 << 33   # 1 GiB bit-array ceiling (broadcast once)


def snapshot_dedup(sf_dir: str, *, bloom_bits: int | None = None,
                   n_buckets: int = _DEDUP_BUCKETS):
    """Incremental (cross-snapshot) dedup — the continuous-crawl shape:
    keep NEW docs (doc_id % SNAPSHOT_MOD != 0) whose text does not appear
    in the PRIOR snapshot (doc_id % SNAPSHOT_MOD == 0).  New-vs-new
    duplicates are kept (only the snapshot dedups them next round).

    Scale shape (100 TB): both sides reduce to 128-bit text digests
    map-side (text never shuffles — the ``_digest_partial`` discipline).
    The prior side folds into a FIXED-SIZE Bloom filter (per-block
    partial bit arrays ORed on the driver one at a time — driver state
    is one ``bloom_bits``-bit array, never corpus-proportional) and the
    filter broadcasts once via ``ray.put``.  New docs probe it map-side:
    definite negatives (the overwhelming majority) are kept WITHOUT any
    exchange; only Bloom-positive candidates (true dups + ~1% FPs) enter
    the bucketed exact anti-join against the prior digests.  Correctness
    never depends on the Bloom: FPs are re-checked exactly, and the
    equivalence test runs the same input with a 64-bit Bloom (≈all-FP)
    and asserts identical output.

    Sizing: unless ``bloom_bits`` is forced, the filter is count-gated
    AFTER the prior digests materialize — ~10 bits/key (≈1% FP with 4
    probes), floored at BLOOM_BITS and capped at BLOOM_BITS_CAP (1 GiB);
    beyond the cap the FP rate degrades gracefully and the exact
    anti-join absorbs the excess candidates."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def _mod_col(doc_id):
        return pc.subtract(
            doc_id.cast(pa.int64()),
            pc.multiply(pc.divide(doc_id.cast(pa.int64()), SNAPSHOT_MOD),
                        SNAPSHOT_MOD))

    def prior_digests(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_mod_col(t.column("doc_id")), 0))
        h1, h2 = _doc_digest_np(t.column("text"))
        p = (pa.table({"h1": pa.array(h1, pa.int64()),
                       "h2": pa.array(h2, pa.int64())})
             .group_by(["h1", "h2"]).aggregate([]))
        return p.append_column(
            "bucket", pc.bit_wise_and(p.column("h1"),
                                      n_buckets - 1).cast(pa.int64()))

    prior = ds.map_batches(prior_digests, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    if bloom_bits is None:
        bloom_bits = int(min(max(10 * prior.count(), BLOOM_BITS),
                             BLOOM_BITS_CAP))
    m_words = max(1, bloom_bits // 64)
    m_bits = m_words * 64

    def bloom_partial(t: pa.Table) -> pa.Table:
        words = np.zeros(m_words, dtype=np.uint64)
        if t.num_rows:
            h1 = t.column("h1").to_numpy().view("uint64")
            h2 = t.column("h2").to_numpy().view("uint64")
            pos = _bloom_positions(h1, h2, m_bits).ravel()
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           pa.large_binary())})

    def bloom_or(t: pa.Table) -> pa.Table:
        words = np.zeros(m_words, dtype=np.uint64)
        for buf in t.column("bloom").to_pylist():
            words |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           pa.large_binary())})

    # tree fold: per-block partials → one OR row per 128 blocks (a
    # distributed reduction level) → driver ORs the ≤ n_blocks/128
    # survivors one at a time — driver state stays one bit array
    bloom = np.zeros(m_words, dtype=np.uint64)
    for b in (prior.map_batches(bloom_partial, batch_format="pyarrow")
              .map_batches(bloom_or, batch_format="pyarrow",
                           batch_size=128)
              .iter_batches(batch_format="pyarrow")):
        for buf in b.column("bloom").to_pylist():
            bloom |= np.frombuffer(buf, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(_mod_col(t.column("doc_id")), 0))
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()), ("h1", pa.int64()),
                              ("h2", pa.int64()), ("candidate", pa.bool_()),
                              ("bucket", pa.int64())]).empty_table()
        h1, h2 = _doc_digest_np(t.column("text"))
        words = ray.get(bloom_ref)
        pos = _bloom_positions(h1.view("uint64"), h2.view("uint64"), m_bits)
        hit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        member = hit.all(axis=1)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "candidate": pa.array(member, pa.bool_()),
            "bucket": pa.array(
                (h1 & (n_buckets - 1)).astype(np.int64), pa.int64())})

    # narrow tagged store (25 B/row, no text): both consumers — the
    # exchange-free definite keeps and the candidate anti-join — replay
    # from it instead of re-reading + re-hashing the corpus
    tagged = ds.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    kept_definite = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("candidate")))
        .select(["doc_id"]), batch_format="pyarrow")

    cands = tagged.map_batches(
        lambda t: t.filter(t.column("candidate"))
        .select(["doc_id", "h1", "h2", "bucket"]), batch_format="pyarrow")

    def anti_shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).combine_chunks()
        cand = g.filter(pc.is_valid(g.column("doc_id")))
        pri = (g.filter(pc.is_null(g.column("doc_id")))
               .select(["h1", "h2"]))
        if cand.num_rows == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        out = cand.join(pri.group_by(["h1", "h2"]).aggregate([]),
                        keys=["h1", "h2"], join_type="left anti")
        return out.select(["doc_id"]).cast(
            pa.schema([("doc_id", pa.int64())]))

    prior_tag = prior.map_batches(
        lambda t: pa.table({
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "h1": t.column("h1"), "h2": t.column("h2"),
            "bucket": t.column("bucket")}), batch_format="pyarrow")
    kept_cands = (cands.union(prior_tag)
                  .groupby("bucket")
                  .map_groups(anti_shard, batch_format="pyarrow"))
    return _tidy(kept_definite.union(kept_cands))


def snapshot_dedup_sql() -> str:
    return f"""
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id % {SNAPSHOT_MOD} <> 0
      AND NOT EXISTS (
        SELECT 1 FROM documents p
        WHERE p.doc_id % {SNAPSHOT_MOD} = 0 AND p.text = d.text)
    """


QUALITY_KEEP_MIN = 2


def clean_corpus(sf_dir: str):
    """End-to-end curation composition (the pipeline a training-data user
    actually runs): per-doc quality scoring → filter (quality ≥ 2) → exact
    dedup keeping the min doc_id — one streaming pass plus the dedup
    groupby; the quality kernel fuses into the read-side map so rejected
    docs never reach the shuffle."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def score_and_filter(t: pa.Table) -> pa.Table:
        text = t.column("text")
        trimmed = ascii_trim(text)
        seps = pc.count_substring_regex(trimmed, _WS_RE)
        n_tok = pc.if_else(pc.equal(trimmed, ""), 0, pc.add(seps, 1))
        n_chars = pc.utf8_length(text)
        stop_hits = pc.count_substring_regex(text, _STOPWORD_RE)
        digit_chars = pc.count_substring_regex(text, r"[0-9]")
        digit_pm = pc.if_else(pc.equal(n_chars, 0), 0,
                              pc.divide(pc.multiply(digit_chars, 1000),
                                        n_chars))
        stop_pm = pc.if_else(pc.equal(n_tok, 0), 0,
                             pc.divide(pc.multiply(stop_hits, 1000), n_tok))
        score = pc.add(
            pc.add(pc.cast(pc.and_(pc.greater_equal(n_tok, 5),
                                   pc.less_equal(n_tok, 1000)), pa.int64()),
                   pc.cast(pc.less(digit_pm, 300), pa.int64())),
            pc.cast(pc.greater(stop_pm, 50), pa.int64()))
        return t.filter(pc.greater_equal(score, QUALITY_KEEP_MIN))

    def filtered_partial(t: pa.Table) -> pa.Table:
        return _digest_partial(score_and_filter(t))

    return _tidy(ds.map_batches(filtered_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("bucket")
                 .map_groups(_digest_shard, batch_format="pyarrow"))


def clean_corpus_sql() -> str:
    return f"""
    WITH q AS ({text_quality_sql()}),
    kept AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN q ON d.doc_id = q.doc_id WHERE q.quality >= {QUALITY_KEEP_MIN})
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM kept GROUP BY text
    """


# --------------------------------------------------------------------------
# C4-style corpus-wide LINE-level dedup (conversation = document,
# turn = line): every duplicate line keeps only its single first
# occurrence in global (conv_id, turn_idx) order — the C4 "three-sentence
# span" rule's line-granular ancestor (Raffel et al. 2020 §2.2) — and the
# per-conversation survival counts come back out so a downstream filter
# can drop hollowed-out documents.
# --------------------------------------------------------------------------

_LINE_CONV_BUCKETS = 64
_LINE_PARTIAL = pa.schema([("conv_id", pa.string()),
                           ("n_lines", pa.int64()),
                           ("kept", pa.int64()),
                           ("cbucket", pa.int64())])
_LINE_DEDUP_OUT = pa.schema([("conv_id", pa.string()),
                             ("n_lines", pa.int64()),
                             ("n_kept", pa.int64())])


def _line_partial(t: pa.Table) -> pa.Table:
    """Per-batch combiner: 128-bit line digests + within-(digest, conv)
    collapse.  Only the min turn_idx of a (line, conv) pair can be the
    global keeper — the later same-conv occurrences are duplicates by
    construction, so they travel as a count, never as rows."""
    import pandas as pd

    tnp = t.column("text").to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(tnp).view("int64")
    h2 = pd.util.hash_array(tnp, hash_key="joernraydedup2nd").view("int64")
    p = (pa.table({"h1": pa.array(h1, pa.int64()),
                   "h2": pa.array(h2, pa.int64()),
                   "conv_id": t.column("conv_id").cast(pa.string()),
                   "turn_idx": t.column("turn_idx").cast(pa.int64())})
         .group_by(["h1", "h2", "conv_id"])
         .aggregate([("turn_idx", "min"), ("turn_idx", "count")]))
    return p.append_column(
        "bucket", pc.bit_wise_and(p.column("h1"),
                                  _DEDUP_BUCKETS - 1).cast(pa.int64()))


def _line_digest_shard(g: pa.Table) -> pa.Table:
    """Digest-bucket shard: resolve the global keeper of every line (min
    (conv_id, turn_idx) — one vectorized sort + shifted digest compare),
    then pre-aggregate per conversation so the second exchange carries
    conversation-cardinality rows."""
    import pandas as pd

    if g.num_rows == 0:
        return _LINE_PARTIAL.empty_table()
    t = (g.drop_columns(["bucket"]).combine_chunks()
         .sort_by([("h1", "ascending"), ("h2", "ascending"),
                   ("conv_id", "ascending"), ("turn_idx_min", "ascending")]))
    h1 = t.column("h1").to_numpy()
    h2 = t.column("h2").to_numpy()
    first = np.ones(len(h1), dtype=bool)
    first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    agg = (pa.table({"conv_id": t.column("conv_id"),
                     "n_lines": t.column("turn_idx_count").cast(pa.int64()),
                     "kept": pa.array(first.astype("int64"))})
           .group_by("conv_id")
           .aggregate([("n_lines", "sum"), ("kept", "sum")]))
    conv = agg.column("conv_id").combine_chunks()
    cb = pd.util.hash_array(conv.to_numpy(zero_copy_only=False))
    return pa.Table.from_arrays(
        [conv, agg.column("n_lines_sum").cast(pa.int64()),
         agg.column("kept_sum").cast(pa.int64()),
         pa.array((cb % _LINE_CONV_BUCKETS).astype("int64"))],
        schema=_LINE_PARTIAL)


def _line_conv_shard(g: pa.Table) -> pa.Table:
    if g.num_rows == 0:
        return _LINE_DEDUP_OUT.empty_table()
    out = (g.drop_columns(["cbucket"]).combine_chunks()
           .group_by("conv_id")
           .aggregate([("n_lines", "sum"), ("kept", "sum")]))
    return pa.Table.from_arrays(
        [out.column("conv_id").combine_chunks(),
         out.column("n_lines_sum").cast(pa.int64()),
         out.column("kept_sum").cast(pa.int64())],
        schema=_LINE_DEDUP_OUT)


def line_dedup(ds: "ray.data.Dataset"):
    """C4-style corpus-wide line-level dedup over a transcript corpus:
    per conversation, how many of its lines (turns) survive when every
    line text keeps only its single first global occurrence.

    Scale shape (the 100-TB contract): the first exchange carries
    (h1, h2, conv_id, min_turn_idx, n) rows — 128-bit digests, line text
    NEVER enters a shuffle; within-conv duplicates collapse in the
    per-batch combiner; the digest shard resolves keepers with one
    vectorized sort and pre-aggregates to conversation cardinality before
    the (much smaller) second exchange.  Reference analog: the
    get-or-create first-writer-wins discipline of ``FileCreationPass``
    (x2cpg/passes/base/FileCreationPass.scala) applied corpus-wide."""
    return _tidy(ds.map_batches(_line_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby("bucket")
                 .map_groups(_line_digest_shard, batch_format="pyarrow")
                 .groupby("cbucket")
                 .map_groups(_line_conv_shard, batch_format="pyarrow"))


def line_dedup_sql(transcripts_rel: str) -> str:
    return f"""
    WITH l AS (
      SELECT conv_id, turn_idx,
             row_number() OVER (PARTITION BY text
                                ORDER BY conv_id, turn_idx) AS rn
      FROM {transcripts_rel})
    SELECT conv_id, count(*) AS n_lines,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM l GROUP BY conv_id
    """


def _word_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


LSH_DOC_BUCKET_CAP = 64


def _shingle_hashes(text: str) -> np.ndarray:
    """Sorted unique 64-bit hashes of the word shingles — Jaccard on these
    equals Jaccard on the shingles (collisions negligible), and the narrow
    int arrays travel with the shuffle instead of the full text."""
    return np.unique(H.hash_strings(_word_shingles(text)))


def _mh_attach_hashes(pairs_ds: "ray.data.Dataset",
                      hashed_ds: "ray.data.Dataset", key: str,
                      carry: list[tuple[str, "pa.DataType"]],
                      out_col: str, *, n_buckets: int,
                      dedupe: bool,
                      val_col: str = "hashes",
                      val_type: "pa.DataType" = None) -> "ray.data.Dataset":
    """Bucketed cogroup join attaching the ``key`` side's shingle-hash
    array to each candidate pair: both sides co-locate by hash(doc_id)
    bucket, each shard runs one Acero join.  Identical (a, b) pairs from
    different bands share a bucket (same key value), so the cross-band
    dedup rides this exchange for free (``dedupe=True`` on the first
    pass)."""
    import pandas as pd

    if val_type is None:
        val_type = pa.list_(pa.int64())
    union_schema = pa.schema(carry + [("h_doc_id", pa.int64()),
                                      ("h_hashes", val_type),
                                      ("bucket", pa.int64())])
    out_schema = pa.schema(carry + [(out_col, val_type)])
    carry_names = [n for n, _ in carry]

    def _b(col) -> pa.Array:
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        return pa.array((h % n_buckets).astype("int64"))

    def pair_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return union_schema.empty_table()
        n = t.num_rows
        cols = [t.column(nm).cast(ty) for nm, ty in carry]
        cols += [pa.nulls(n, pa.int64()),
                 pa.nulls(n, val_type), _b(t.column(key))]
        return pa.Table.from_arrays(cols, schema=union_schema)

    def hash_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [pa.nulls(n, ty) for _, ty in carry]
        cols += [t.column("doc_id").cast(pa.int64()),
                 t.column(val_col).cast(val_type),
                 _b(t.column("doc_id"))]
        return pa.Table.from_arrays(cols, schema=union_schema)

    def join_shard(g: pa.Table) -> pa.Table:
        # Acero joins reject list-typed payload columns, so the lookup is
        # index_in + take (equally vectorized; right side unique per doc)
        g = g.drop_columns(["bucket"]).combine_chunks()
        is_hash = pc.is_valid(g.column("h_doc_id"))
        right = g.filter(is_hash)
        left = g.filter(pc.invert(is_hash)).select(carry_names)
        if dedupe and left.num_rows:
            # list-typed carries can't be group_by keys either, but the
            # dedupe pass carries plain ints only
            left = left.group_by(carry_names).aggregate([])
        if left.num_rows == 0 or right.num_rows == 0:
            return out_schema.empty_table()
        pos = pc.index_in(left.column(key),
                          value_set=right.column("h_doc_id").combine_chunks())
        valid = pc.is_valid(pos)
        left = left.filter(valid)
        hs = right.column("h_hashes").take(pos.filter(valid))
        return pa.Table.from_arrays(
            [left.column(nm).cast(ty) for nm, ty in carry] + [hs],
            schema=out_schema)

    tagged = (pairs_ds.map_batches(pair_rows, batch_format="pyarrow")
              .union(hashed_ds.map_batches(hash_rows,
                                           batch_format="pyarrow")))
    return tagged.groupby("bucket").map_groups(join_shard,
                                               batch_format="pyarrow")


def minhash_clusters(docs_ds: "ray.data.Dataset", *, threshold: float = 0.8,
                     n_buckets: int = 256):
    """MinHash+LSH near-duplicate clusters over (doc_id, text).

    Scale shape: shingle-hash each doc ONCE into a narrow side dataset
    (doc_id, hashes — no text); band rows carry only (bucket, doc_id), so
    the LSH exchange ships 16 bytes per band row instead of the full hash
    array ×n_bands; candidate pairs from the bucket groupby then pick up
    each side's hash array via two bucketed cogroup joins (hashes shuffled
    ~once per pair-participation, not ×n_bands) and verify exact Jaccard
    vectorized per pair.  Verified edges feed the engine's union-find for
    min-doc-id cluster labels."""
    from ..stages.cc import connected_components

    def prep(t: pa.Table) -> pa.Table:
        ids, hashes, bands = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            hs = _shingle_hashes(text)
            ids.append(did)
            hashes.append(hs.astype(np.int64).tolist())
            bands.append(list(H.band_keys(H.minhash_from_hashes(hs))))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hashes": pa.array(hashes, pa.list_(pa.int64())),
                         "bands": pa.array(bands, pa.list_(pa.string()))})

    hashed = docs_ds.map_batches(prep, batch_format="pyarrow").materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        bands = t.column("bands")
        if isinstance(bands, pa.ChunkedArray):
            bands = bands.combine_chunks()
        parent = pc.list_parent_indices(bands)
        return pa.table({"bucket": pc.list_flatten(bands),
                         "doc_id": t.column("doc_id").take(parent)})

    _EMPTY_PAIRS = pa.schema([("a", pa.int64()),
                              ("b", pa.int64())]).empty_table()

    def cand_pairs(group: pa.Table) -> pa.Table:
        # fast path: almost every bucket is a singleton
        if group.num_rows < 2 or \
                pc.count_distinct(group.column("doc_id")).as_py() < 2:
            return _EMPTY_PAIRS
        ids = sorted(set(group.column("doc_id").to_pylist()))
        ids = ids[:LSH_DOC_BUCKET_CAP]   # deterministic bail-out cap
        a = [x for i, x in enumerate(ids) for _ in ids[i + 1:]]
        b = [y for i, x in enumerate(ids) for y in ids[i + 1:]]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    cand = (hashed.map_batches(band_rows, batch_format="pyarrow")
            .groupby("bucket").map_groups(cand_pairs,
                                          batch_format="pyarrow"))
    with_a = _mh_attach_hashes(
        cand, hashed, "a", [("a", pa.int64()), ("b", pa.int64())], "ha",
        n_buckets=n_buckets, dedupe=True)
    with_ab = _mh_attach_hashes(
        with_a, hashed, "b",
        [("a", pa.int64()), ("b", pa.int64()),
         ("ha", pa.list_(pa.int64()))], "hb",
        n_buckets=n_buckets, dedupe=False)

    def verify(t: pa.Table) -> pa.Table:
        # Vectorized exact-Jaccard verify: flatten BOTH list columns once
        # (offsets-sliced, no per-pair to_pylist), then count intersections
        # for every pair in one lexsort — per-doc hash arrays are sorted
        # UNIQUE (`_shingle_hashes`), so an intersection element is exactly
        # an adjacent (pair_idx, value) duplicate in the combined sort.
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema([("a", pa.string()),
                              ("b", pa.string())]).empty_table()
        ha = t.column("ha").combine_chunks()
        hb = t.column("hb").combine_chunks()
        flat_a = pc.list_flatten(ha).to_numpy(zero_copy_only=False)
        flat_b = pc.list_flatten(hb).to_numpy(zero_copy_only=False)
        par_a = pc.list_parent_indices(ha).to_numpy(zero_copy_only=False)
        par_b = pc.list_parent_indices(hb).to_numpy(zero_copy_only=False)
        la = pc.list_value_length(ha).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        lb = pc.list_value_length(hb).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        vals = np.concatenate([flat_a, flat_b])
        pids = np.concatenate([par_a, par_b]).astype(np.int64)
        order = np.lexsort((vals, pids))
        sv, sp = vals[order], pids[order]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        inter = np.bincount(sp[1:][dup], minlength=t.num_rows)
        denom = la + lb - inter
        keep = (denom > 0) & (inter >= threshold * denom)
        mask = pa.array(keep)
        return pa.table({
            "a": pc.cast(t.column("a").filter(mask), pa.string()),
            "b": pc.cast(t.column("b").filter(mask), pa.string())})

    edges = with_ab.map_batches(verify, batch_format="pyarrow")
    nodes = hashed.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"), pa.string())}),
        batch_format="pyarrow")
    labels = connected_components(edges, nodes)
    return labels.map_batches(
        lambda t: (pa.table({"doc_id": pc.cast(t.column("node"), pa.int64()),
                             "cluster": pc.cast(t.column("label"), pa.string())})
                   if t.num_columns else
                   pa.schema([("doc_id", pa.int64()),
                              ("cluster", pa.string())]).empty_table()),
        batch_format="pyarrow")


DRIVER_MAX_DOCS = 100_000


def _minhash_clusters_driver(table: pa.Table, threshold: float):
    """In-process mirror of the distributed minhash chain for small
    corpora (identical band/cap/threshold semantics — equivalence
    pytest-asserted): the distributed path pays ~4 exchanges of fixed
    latency that dominate at directory scale."""
    ids = table.column("doc_id").to_pylist()
    texts = table.column("text").to_pylist()
    hashes: dict[int, np.ndarray] = {}
    buckets: dict[str, set[int]] = {}
    for did, text in zip(ids, texts):
        hs = _shingle_hashes(text)
        hashes[did] = hs
        for bk in H.band_keys(H.minhash_from_hashes(hs)):
            buckets.setdefault(bk, set()).add(did)
    parent: dict[int, int] = {d: d for d in ids}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    seen_pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)[:LSH_DOC_BUCKET_CAP]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pair = (ms[i], ms[j])
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                x, y = hashes[ms[i]], hashes[ms[j]]
                inter = np.intersect1d(x, y, assume_unique=True).size
                denom = x.size + y.size - inter
                if denom and inter / denom >= threshold:
                    ra, rb = find(ms[i]), find(ms[j])
                    if ra != rb:
                        # distributed CC labels by lexicographic-min of the
                        # STRING node id — mirror that exactly for parity
                        lo, hi = (ra, rb) if str(ra) < str(rb) else (rb, ra)
                        parent[hi] = lo
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "cluster": pa.array([str(find(d)) for d in ids], pa.string()),
    }))


def dedup_minhash(sf_dir: str, *, distributed: bool | None = None):
    import pyarrow.dataset as pads
    if distributed is None:
        distributed = (pads.dataset(_p(sf_dir), format="parquet")
                       .count_rows() > DRIVER_MAX_DOCS)
    docs = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    if not distributed:
        import pyarrow.parquet as pq
        return _minhash_clusters_driver(
            pq.read_table(_p(sf_dir), columns=["doc_id", "text"]), 0.8)
    return minhash_clusters(docs)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (deterministic blake2 basis) —
    scalar reference implementation; the batch kernel (``simhash_batch``)
    must stay in lockstep (pytest-asserted)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(text.split()):
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out - (1 << 63)


# token → 64-bit blake2 hash memo (Zipfian vocab ⇒ high hit rate; lives for
# the worker process — the compiled-pattern/per-actor-state idiom)
_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hashes(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    for i, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            if len(cache) < 4_000_000:   # bound worker memory
                cache[tok] = h
        out[i] = h
    return out


def simhash_batch(t: pa.Table) -> pa.Table:
    """Vectorized SimHash: unique tokens per doc → memoized 64-bit hashes →
    one (n_tokens × 64) bit matrix → per-doc signed accumulation with
    np.add.at — no per-row Python beyond tokenization."""
    texts = t.column("text").to_pylist()
    toks: list[str] = []
    doc_of: list[int] = []
    for i, s in enumerate(texts):
        u = set(s.split())
        toks.extend(u)
        doc_of.extend([i] * len(u))
    n_docs = len(texts)
    if toks:
        h = _token_hashes(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int8)
        contrib = (bits.astype(np.int16) * 2 - 1)
        acc = np.zeros((n_docs, 64), dtype=np.int64)
        np.add.at(acc, np.asarray(doc_of), contrib)
        pos = acc > 0
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        sims = (pos * weights).sum(axis=1).astype(np.uint64)
        # scalar contract: signed value = unsigned_bits - 2^63 (wrapping
        # uint64 subtraction + int64 view reproduces it exactly)
        out = (sims - np.uint64(1 << 63)).view(np.int64)
    else:
        # tokenless batch: scalar contract gives 0 bits → 0 - 2^63 per doc
        out = np.full(n_docs, -(1 << 63), dtype=np.int64)
    return pa.table({"doc_id": t.column("doc_id"),
                     "simhash": pa.array(out, pa.int64())})


def dedup_simhash(sf_dir: str):
    """doc_id → simhash (near-dups share close hamming distance)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


SIMHASH_BANDS = 4            # 4 × 16-bit bands: hamming ≤ 3 ⇒ ≥1 band equal
SIMHASH_MAX_HAMMING = 3
SIMHASH_BUCKET_CAP = 256


def simhash_clusters(sf_dir: str):
    """SimHash near-dup clustering: band the 64-bit signature into 16-bit
    bands (pigeonhole: hamming ≤ 3 pairs share ≥1 band), bucket-groupby per
    band value, verify hamming distance within capped buckets, union-find
    to min-doc-id cluster labels."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return _simhash_clusters_core(ds)


def _simhash_clusters_core(ds):
    """Clustering core over any (doc_id, text) Dataset — shared by the
    natural-corpus entry above and the planted-oracle entry below.
    Banding recall is EXACT, not probabilistic: 4 disjoint 16-bit bands
    and a hamming-≤3 verify mean any qualifying pair has ≥1 identical
    band (pigeonhole), so the output is the exact connected components
    of the hamming-≤3 graph (subject to SIMHASH_BUCKET_CAP on
    pathological band collisions)."""
    from ..stages.cc import connected_components

    sims = ds.map_batches(simhash_batch, batch_format="pyarrow") \
             .materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy().astype(np.uint64)
        ids = t.column("doc_id").to_numpy()
        parts = []
        for b in range(SIMHASH_BANDS):
            band_val = ((sh >> np.uint64(16 * b))
                        & np.uint64(0xFFFF)).astype(np.int64)
            key = (band_val + (b << 16)).astype(np.int64)  # band-tagged
            parts.append(pa.table({
                "bucket": pa.array(key, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": t.column("simhash")}))
        return pa.concat_tables(parts)

    _EMPTY = pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return _EMPTY
        g = group.sort_by("doc_id")
        if g.num_rows > SIMHASH_BUCKET_CAP:
            g = g.slice(0, SIMHASH_BUCKET_CAP)
        ids = g.column("doc_id").to_numpy()
        sh = g.column("simhash").to_numpy().astype(np.uint64)
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        ids, sh = ids[keep], sh[keep]
        if len(ids) < 2:
            return _EMPTY
        x = sh[:, None] ^ sh[None, :]
        ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8),
                            axis=2).sum(axis=2)
        ii, jj = np.nonzero(np.triu(ham <= SIMHASH_MAX_HAMMING, k=1))
        return pa.table({
            "a": pa.array([str(v) for v in ids[ii]], pa.string()),
            "b": pa.array([str(v) for v in ids[jj]], pa.string())})

    edges = (sims.map_batches(band_rows, batch_format="pyarrow")
             .groupby("bucket").map_groups(pairs, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="nb"))
             .map_batches(lambda t: (t.select(["a", "b"]) if t.num_columns
                                     else _EMPTY.schema.empty_table()),
                          batch_format="pyarrow"))
    nodes = sims.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"), pa.string())}),
        batch_format="pyarrow")
    labels = connected_components(edges, nodes)
    return labels.map_batches(
        lambda t: (pa.table({"doc_id": pc.cast(t.column("node"), pa.int64()),
                             "cluster": pc.cast(t.column("label"), pa.string())})
                   if t.num_columns else
                   pa.schema([("doc_id", pa.int64()),
                              ("cluster", pa.string())]).empty_table()),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Planted-corpus SimHash oracle family (r5): the natural-corpus simhash
# entries stay rows-only because blake2b is not SQL-expressible over an
# unbounded vocabulary — but over a PLANTED corpus with a small FIXED
# vocabulary the whole operator becomes SQL-mirrorable: the oracle embeds
# the 256-entry token→hash dictionary as literal VALUES (computed from
# the same blake2b at SQL-generation time, a pure function of the
# constants below), regenerates each doc's token multiset with the same
# integer arithmetic, and reproduces the signature bit-for-bit in
# integer-only SQL.  Clusters are then checkable because the Ray side's
# banding recall is EXACT (pigeonhole, see _simhash_clusters_core): both
# sides compute the exact connected components of the hamming-≤3 graph.
# The single-hop min-label the SQL uses is valid because the planted
# graph has no chains (pytest-asserted exhaustively — deterministic
# corpus, so one check holds forever).
#
# Corpus shape: SIMPLANT_N_BASE arithmetic base docs; the first
# SIMPLANT_N_PAIR of them get a planted partner at doc_id + OFFSET —
# even-indexed partners are exact token-set copies (hamming 0), odd ones
# carry one appended token (hamming small but nonzero — wherever it
# lands, BOTH sides compute it, so no tuning is required).
# ---------------------------------------------------------------------------

SIMPLANT_V = 256          # fixed vocabulary size (tok000..tok255)
SIMPLANT_L = 200          # tokens per doc (with multiplicity)
SIMPLANT_N_BASE = 400
SIMPLANT_N_PAIR = 120
SIMPLANT_OFFSET = 100000
SIMPLANT_C = 7919         # appended-token index for odd pairs: (31*d+C) % V


def _simplant_vocab() -> list[str]:
    return [f"tok{i:03d}" for i in range(SIMPLANT_V)]


def _simplant_token_idx(d: int) -> np.ndarray:
    """Token indices of base doc ``d`` — a 24-bit multiply-xorshift mix
    over (d, j).  The XOR rounds are load-bearing: any PURELY additive /
    linear map makes every doc's token set a cyclic shift of one base
    set (docs then collide at hamming ≤3 by the thousands — measured);
    with this mix the planted corpus has exactly the planted near-dup
    edges, max node degree 1, and min non-edge hamming 4 (exhaustively
    asserted in tests/test_simplant.py).  All ops stay in int64 and are
    reproduced verbatim by the SQL oracle (xor()/>>/% on BIGINT)."""
    j = np.arange(SIMPLANT_L, dtype=np.int64)
    x = (d * 100003 + j * 65537 + 12345) % 16777216
    x = (x * 40503) % 16777216
    x = np.bitwise_xor(x, x >> 11)
    x = (x * 48271) % 16777216
    x = np.bitwise_xor(x, x >> 9)
    return x % SIMPLANT_V


def simplant_docs():
    """The planted (doc_id, text) corpus as a Dataset — a pure function
    of the SIMPLANT_* constants (no input tables; the oracle SQL
    regenerates the identical token multisets arithmetically).  The
    per-row loop is fine here: the corpus is a fixed few hundred rows of
    oracle scaffolding, not a data path."""
    vocab = _simplant_vocab()

    def build(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for r in t.column("id").to_pylist():
            if r < SIMPLANT_N_BASE:
                d, doc_id, extra = r, r, None
            else:
                d = r - SIMPLANT_N_BASE
                doc_id = d + SIMPLANT_OFFSET
                extra = (vocab[(31 * d + SIMPLANT_C) % SIMPLANT_V]
                         if d % 2 == 1 else None)
            toks = [vocab[i] for i in _simplant_token_idx(d)]
            if extra is not None:
                toks.append(extra)
            ids.append(doc_id)
            texts.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ray.data.range(SIMPLANT_N_BASE + SIMPLANT_N_PAIR) \
                   .map_batches(build, batch_format="pyarrow")


def dedup_simhash_planted(sf_dir: str):
    """doc_id → simhash over the planted corpus — the signature kernel
    under a driver-checkable integer-exact SQL oracle."""
    return simplant_docs().map_batches(simhash_batch,
                                       batch_format="pyarrow")


def dedup_simhash_clusters_planted(sf_dir: str):
    """Full banded clustering over the planted corpus — same code path
    as the natural-corpus entry (_simhash_clusters_core)."""
    return _simhash_clusters_core(simplant_docs())


def _simplant_tokhash_values() -> str:
    """(idx, hash) VALUES rows — blake2b-64 of each vocab token, stored
    as the signed-BIGINT two's-complement view (DuckDB bit ops work on
    the raw bit pattern, so bit extraction matches uint64 exactly)."""
    rows = []
    for i, tok in enumerate(_simplant_vocab()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        if h >= 1 << 63:
            h -= 1 << 64
        rows.append(f"({i},{h})")
    return ",".join(rows)


_I64_MIN = "(-9223372036854775807 - 1)"


def _simplant_sig_ctes() -> str:
    """Shared CTE chain ending in spl_sig(doc_id, simhash): regenerate
    token multisets arithmetically, DISTINCT to token sets (the kernel's
    set(text.split())), join the embedded hash dictionary, accumulate
    ±1 per bit lane, reassemble the signed signature (bit 63 maps to
    -(2**63), matching numpy's wrapping-subtract int64 view)."""
    nb, np_, off = SIMPLANT_N_BASE, SIMPLANT_N_PAIR, SIMPLANT_OFFSET
    c, v, ell = SIMPLANT_C, SIMPLANT_V, SIMPLANT_L
    return f"""
    spl_th(idx, h) AS (VALUES {_simplant_tokhash_values()}),
    spl_dj AS (
      SELECT d AS doc_id, d AS dd, j
        FROM generate_series(0, {nb - 1}) t(d),
             generate_series(0, {ell - 1}) s(j)
      UNION ALL
      SELECT d + {off}, d, j
        FROM generate_series(0, {np_ - 1}) t(d),
             generate_series(0, {ell - 1}) s(j)),
    spl_x1 AS (
      SELECT doc_id,
             (((dd*100003 + j*65537 + 12345) % 16777216) * 40503)
               % 16777216 AS x
      FROM spl_dj),
    spl_x2 AS (
      SELECT doc_id, (xor(x, x >> 11) * 48271) % 16777216 AS x
      FROM spl_x1),
    spl_toks AS (
      SELECT doc_id, idx FROM (
        SELECT doc_id, xor(x, x >> 9) % {v} AS idx FROM spl_x2
        UNION ALL
        SELECT d + {off}, (31*d + {c}) % {v}
          FROM generate_series(0, {np_ - 1}) t(d) WHERE d % 2 = 1
      ) GROUP BY doc_id, idx),
    spl_acc AS (
      SELECT doc_id, i,
             SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS acc
      FROM spl_toks JOIN spl_th USING (idx),
           generate_series(0, 63) bits(i)
      GROUP BY doc_id, i),
    spl_sig AS (
      SELECT doc_id, CAST(SUM(
        CASE WHEN i = 63
             THEN CASE WHEN acc > 0 THEN 0 ELSE {_I64_MIN} END
             ELSE CASE WHEN acc > 0 THEN (1::BIGINT << i) ELSE 0 END
        END) AS BIGINT) AS simhash
      FROM spl_acc GROUP BY doc_id)"""


def dedup_simhash_planted_sql() -> str:
    return f"""
    WITH {_simplant_sig_ctes()}
    SELECT doc_id, simhash FROM spl_sig
    """


def dedup_simhash_clusters_planted_sql() -> str:
    """Exact all-pairs hamming over the SQL-computed signatures (no LSH
    in the oracle — it independently verifies the banding recall AND the
    verify kernel, the dedup_ngram_pairs discipline), then single-hop
    lexicographic min-label (valid: the planted hamming-≤3 graph has no
    chains, asserted exhaustively in tests/test_simplant.py; labels are
    VARCHAR because connected_components' min-label is lexicographic
    over string node ids)."""
    return f"""
    WITH {_simplant_sig_ctes()},
    spl_pairs AS (
      SELECT s1.doc_id AS a, s2.doc_id AS b
      FROM spl_sig s1, spl_sig s2
      WHERE s1.doc_id < s2.doc_id
        AND bit_count(xor(s1.simhash, s2.simhash)) <= {SIMHASH_MAX_HAMMING}),
    spl_nb AS (
      SELECT a AS v, CAST(b AS VARCHAR) AS u FROM spl_pairs
      UNION ALL
      SELECT b AS v, CAST(a AS VARCHAR) AS u FROM spl_pairs)
    SELECT s.doc_id,
           LEAST(CAST(s.doc_id AS VARCHAR),
                 COALESCE(MIN(n.u), CAST(s.doc_id AS VARCHAR))) AS cluster
    FROM spl_sig s LEFT JOIN spl_nb n ON n.v = s.doc_id
    GROUP BY s.doc_id
    """


NGRAM_K = 3


def _char_ngram_hashes(text: str, k: int = NGRAM_K) -> np.ndarray:
    """Sorted unique 64-bit hashes of padded character k-grams (^text$
    padding so prefixes/suffixes weigh in, the ``rules.char_shingles``
    convention)."""
    p = f"^{text}$"
    if len(p) <= k:
        grams = {p}
    else:
        grams = {p[i:i + k] for i in range(len(p) - k + 1)}
    return np.unique(H.hash_strings(grams))


def ngram_jaccard_pairs(sf_dir: str, *, k: int = NGRAM_K,
                        threshold: float = 0.8, n_buckets: int = 256):
    """All (a, b, jaccard) doc pairs with EXACT character-k-gram Jaccard
    ≥ threshold — a distinct operator from ``minhash_clusters``, not an
    alias: the shingling unit is characters (robust to intra-word edits
    word shingles miss), the verification metric is the exact n-gram
    Jaccard value, and the output is scored pairs rather than cluster
    labels.

    Scale shape mirrors the minhash chain: per-doc char-gram hash arrays
    travel once (narrow ints, never text), MinHash banding over the SAME
    gram hashes blocks candidates (8 bands × 4 rows ⇒ ~0.98 recall at
    J=0.8, the default threshold; capped buckets), exact Jaccard verifies
    vectorized per pair.  threshold well below ~0.6 needs a wider banding
    — documented, not silently degraded."""
    docs_ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        ids, hashes, bands = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            hs = _char_ngram_hashes(text, k)
            ids.append(did)
            hashes.append(hs.astype(np.int64).tolist())
            bands.append(list(H.band_keys(H.minhash_from_hashes(hs))))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hashes": pa.array(hashes, pa.list_(pa.int64())),
                         "bands": pa.array(bands, pa.list_(pa.string()))})

    hashed = docs_ds.map_batches(prep, batch_format="pyarrow").materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        bands = t.column("bands")
        if isinstance(bands, pa.ChunkedArray):
            bands = bands.combine_chunks()
        parent = pc.list_parent_indices(bands)
        return pa.table({"bucket": pc.list_flatten(bands),
                         "doc_id": t.column("doc_id").take(parent)})

    empty_pairs = pa.schema([("a", pa.int64()),
                             ("b", pa.int64())]).empty_table()

    def cand_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2 or \
                pc.count_distinct(group.column("doc_id")).as_py() < 2:
            return empty_pairs
        ids = sorted(set(group.column("doc_id").to_pylist()))
        ids = ids[:LSH_DOC_BUCKET_CAP]
        a = [x for i, x in enumerate(ids) for _ in ids[i + 1:]]
        b = [y for i, x in enumerate(ids) for y in ids[i + 1:]]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    cand = (hashed.map_batches(band_rows, batch_format="pyarrow")
            .groupby("bucket").map_groups(cand_pairs,
                                          batch_format="pyarrow"))
    with_a = _mh_attach_hashes(
        cand, hashed, "a", [("a", pa.int64()), ("b", pa.int64())], "ha",
        n_buckets=n_buckets, dedupe=True)
    with_ab = _mh_attach_hashes(
        with_a, hashed, "b",
        [("a", pa.int64()), ("b", pa.int64()),
         ("ha", pa.list_(pa.int64()))], "hb",
        n_buckets=n_buckets, dedupe=False)

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("jaccard", pa.float64())])

    def verify(t: pa.Table) -> pa.Table:
        # Same lexsort exact-Jaccard kernel as minhash_clusters.verify
        # (offsets-sliced flatten, one lexsort, adjacent-dup intersection
        # counts): per-doc gram arrays are sorted UNIQUE
        # (`_char_ngram_hashes` ends in np.unique), so an intersection
        # element is exactly an adjacent (pair_idx, value) duplicate.
        # Difference vs minhash: emit the exact jaccard VALUE per kept
        # pair rather than feeding union-find.
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        ha = t.column("ha").combine_chunks()
        hb = t.column("hb").combine_chunks()
        flat_a = pc.list_flatten(ha).to_numpy(zero_copy_only=False)
        flat_b = pc.list_flatten(hb).to_numpy(zero_copy_only=False)
        par_a = pc.list_parent_indices(ha).to_numpy(zero_copy_only=False)
        par_b = pc.list_parent_indices(hb).to_numpy(zero_copy_only=False)
        la = pc.list_value_length(ha).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        lb = pc.list_value_length(hb).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        vals = np.concatenate([flat_a, flat_b])
        pids = np.concatenate([par_a, par_b]).astype(np.int64)
        order = np.lexsort((vals, pids))
        sv, sp = vals[order], pids[order]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        inter = np.bincount(sp[1:][dup], minlength=t.num_rows)
        denom = la + lb - inter
        jac = np.where(denom > 0, inter / np.maximum(denom, 1), 1.0)
        keep = jac >= threshold
        mask = pa.array(keep)
        return pa.table({
            "a": t.column("a").filter(mask),
            "b": t.column("b").filter(mask),
            "jaccard": pa.array(jac[keep], pa.float64())})

    return (with_ab.map_batches(verify, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))


def ngram_jaccard_pairs_sql(rel: str = "documents", *, k: int = NGRAM_K,
                            threshold: float = 0.8) -> str:
    """DuckDB mirror of ``ngram_jaccard_pairs`` (r5): EXACT all-pairs
    padded character-k-gram Jaccard — no LSH, no hashing — so it
    independently verifies both the banding recall AND the vectorized
    verify kernel.  Validity: on the fixed synthetic documents corpus
    every pair >= threshold is comfortably above it (no pair within
    [0.75, 0.82) at sf0.01) and the deterministic 8x4 banding catches
    all of them, so engine == oracle row-for-row; the engine's hashed
    gram sets equal the string gram sets absent 64-bit collisions
    (expected collisions ~1e-15 per corpus)."""
    km1 = k - 1
    j = "CAST(ip.i AS DOUBLE) / (sa.n + sb.n - ip.i)"
    return f"""
    WITH d AS (SELECT doc_id, '^' || text || '$' AS p FROM {rel}),
    g AS (
      SELECT DISTINCT doc_id,
             substring(p, CAST(i AS INTEGER) + 1, {k}) AS gram
      FROM (SELECT doc_id, p,
                   unnest(range(greatest(len(p) - {km1}, 1))) AS i
            FROM d)),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           FROM g GROUP BY 1),
    ip AS (SELECT x.doc_id AS a, y.doc_id AS b,
                  CAST(count(*) AS BIGINT) AS i
           FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
           GROUP BY 1, 2)
    SELECT ip.a, ip.b, {j} AS jaccard
    FROM ip JOIN sz sa ON sa.doc_id = ip.a
            JOIN sz sb ON sb.doc_id = ip.b
    WHERE {j} >= {threshold}
    """


def ngram_jaccard_exact(a: str, b: str, k: int = NGRAM_K) -> float:
    """Naive single-pair reference (tests' lockstep twin — independent of
    the hashed set path up to hash collisions, which are negligible)."""
    def grams(s: str) -> set[str]:
        p = f"^{s}$"
        return {p} if len(p) <= k else \
            {p[i:i + k] for i in range(len(p) - k + 1)}
    ga, gb = grams(a), grams(b)
    inter = len(ga & gb)
    denom = len(ga) + len(gb) - inter
    return inter / denom if denom else 1.0
