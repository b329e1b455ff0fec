"""Event-stream operators over the ``events`` table (ts is data, not a
watermark — SURVEY.md §2.11): sessionization, tumbling-window aggregation,
and an as-of join.

These are the "custom operators Ray Data lacks" (windowed aggregate /
as-of join) built per SURVEY.md guidance as compositions of
``map_batches`` + ``groupby().map_groups``: the per-user history fits one
group, so ordering-sensitive logic runs conversation-local (the same
partitioning assumption the KG enrichment passes rely on — per-key state,
never global order).

Skew note: group key is ``user_id`` (150 users/sf0.01 → millions at scale,
each with bounded history); windowed aggregation pre-aggregates per batch
before the global groupby so hot windows never funnel raw rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

SESSION_GAP_S = 1800


def _p(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


# ---------------------------------------------------------------------------
# sessionization (per-user gap-based)
# ---------------------------------------------------------------------------

def sessionize(sf_dir: str, *, n_buckets: int = 256):
    """event_id → session_id ("<user_id>:<n>"); a new session starts when the
    gap to the user's previous event exceeds SESSION_GAP_S.

    Users co-locate into hash(user_id) bucket shards (never per-user
    Python groups — 10^8 users at corpus scale); within a shard the whole
    logic is ONE vectorized pass over the (user, ts, event_id)-sorted
    rows: session boundaries = user change OR gap exceeded, session
    numbers = global cumsum rebased at each user start."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["event_id", "user_id", "ts"])

    def shard(g: pa.Table) -> pa.Table:
        import pandas as pd
        g = g.drop_columns(["bucket"]).sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")])
        if g.num_rows == 0:
            return pa.schema([("event_id", g.schema.field("event_id").type),
                              ("user_id", g.schema.field("user_id").type),
                              ("session_id", pa.string())]).empty_table()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        new_user = np.empty(len(ts), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(ts), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new = new_user | (gap > SESSION_GAP_S * 1_000_000)
        cum = np.cumsum(new)
        base = np.maximum.accumulate(np.where(new_user, cum - 1, 0))
        sess_n = cum - base
        sid = pd.Series(uid).astype(str) + ":" + pd.Series(sess_n).astype(str)
        return pa.table({"event_id": g.column("event_id"),
                         "user_id": g.column("user_id"),
                         "session_id": pa.array(sid, pa.string())})

    return (ds.map_batches(lambda t: add_bucket(t, "user_id", n_buckets),
                           batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow"))


def sessionize_sql() -> str:
    return f"""
    SELECT event_id, user_id,
           CAST(user_id AS VARCHAR) || ':' || CAST(
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS VARCHAR)
             AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    OR date_diff('microsecond',
                                 lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id),
                                 ts) > {SESSION_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events)
    """


# ---------------------------------------------------------------------------
# tumbling-window aggregation (1h windows per event_type)
# ---------------------------------------------------------------------------

def window_counts(sf_dir: str):
    """(event_type, hour window) → event count + value sum in integer cents
    (integer sum: deterministic under any reduction order, unlike float)."""
    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t.column("ts"), unit="hour")
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        local = pa.table({"event_type": t.column("event_type"),
                          "window_start": win, "cents": cents}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([("cents", "sum"), ("cents", "count")])
        return local.rename_columns(
            ["event_type", "window_start", "cents", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "window_start"])
            .aggregate(Sum(on="cents", alias_name="sum_cents"),
                       Sum(on="n", alias_name="n_events"))
            .map_batches(_window_counts_tidy, batch_format="pyarrow"))


_WINDOW_COUNTS_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("window_start", pa.timestamp("us")),
     ("n_events", pa.int64()), ("sum_cents", pa.int64())])


def _window_counts_tidy(t: pa.Table) -> pa.Table:
    # floor_temporal returns timestamp[s]; the DuckDB oracle's date_trunc
    # emits timestamp[us] — align units so the driver's value-hash matches.
    if not t.num_columns:
        return _WINDOW_COUNTS_SCHEMA.empty_table()
    t = t.select(["event_type", "window_start", "n_events", "sum_cents"])
    return t.set_column(
        1, "window_start", t.column("window_start").cast(pa.timestamp("us")))


def window_counts_sql() -> str:
    return """
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# sliding-window aggregation (1h windows advancing every 15 minutes)
# ---------------------------------------------------------------------------

SLIDE_S = 15 * 60                       # window advance
SLIDE_FACTOR = 4                        # window length / slide = 1h / 15min


def sliding_window_counts(sf_dir: str):
    """(event_type, sliding window start) → event count + integer-cents sum.

    Each event belongs to SLIDE_FACTOR overlapping windows; the explosion
    happens INSIDE the per-batch combiner (one take with tiled indices —
    rows × 4 never hit the exchange raw, only the combined
    (type, window) partials do), then the usual two-phase sum."""
    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["event_type", "ts", "value"])
    slide_us = SLIDE_S * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty-take guard (pyarrow 16 flake class)
            return pa.schema(
                [("event_type", pa.string()),
                 ("window_start", pa.timestamp("us")),
                 ("cents", pa.int64()), ("n", pa.int64())]).empty_table()
        base = pc.floor_temporal(t.column("ts"), multiple=15, unit="minute") \
            .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        n = t.num_rows
        idx = np.tile(np.arange(n, dtype=np.int64), SLIDE_FACTOR)
        starts = np.concatenate(
            [base - i * slide_us for i in range(SLIDE_FACTOR)])
        local = pa.table({
            "event_type": t.column("event_type").take(pa.array(idx)),
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "cents": cents.take(pa.array(idx)),
        }).group_by(["event_type", "window_start"]) \
          .aggregate([("cents", "sum"), ("cents", "count")])
        return local.rename_columns(
            ["event_type", "window_start", "cents", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "window_start"])
            .aggregate(Sum(on="cents", alias_name="sum_cents"),
                       Sum(on="n", alias_name="n_events"))
            .map_batches(_window_counts_tidy, batch_format="pyarrow"))


def sliding_window_counts_sql() -> str:
    return f"""
    SELECT event_type,
           time_bucket(INTERVAL '15 minutes', ts)
             - i * INTERVAL '15 minutes' AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events CROSS JOIN
         (SELECT unnest(range({SLIDE_FACTOR})) AS i)
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# as-of join (per purchase: the user's most recent strictly-prior view)
# ---------------------------------------------------------------------------

def asof_prior_view(sf_dir: str, *, n_buckets: int = 256):
    """purchase events annotated with the ts of the same user's latest view
    event strictly before them (NULL if none).

    Same shard discipline as ``sessionize``; the running view-timestamp
    maximum resets at user boundaries via cython segmented cummax/shift
    (pandas groupby on integer codes) — no per-user Python groups."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(
        _p(sf_dir), columns=["event_id", "user_id", "ts", "event_type"])

    def shard(g: pa.Table) -> pa.Table:
        import pandas as pd
        g = g.drop_columns(["bucket"]).sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")])
        if g.num_rows == 0:
            return pa.schema([("event_id", g.schema.field("event_id").type),
                              ("user_id", g.schema.field("user_id").type),
                              ("ts", g.schema.field("ts").type),
                              ("prev_view_ts", pa.timestamp("us"))
                              ]).empty_table()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        codes = np.cumsum(
            np.concatenate(([True], uid[1:] != uid[:-1])))
        is_view = pc.equal(g.column("event_type"), "view").to_numpy(
            zero_copy_only=False)
        view_ts = pd.Series(np.where(is_view, ts, np.int64(-1)))
        # strictly-prior running max within user = shift-then-cummax
        prior = (view_ts.groupby(codes).cummax()
                 .groupby(codes).shift(1, fill_value=-1)
                 .to_numpy(dtype=np.int64))
        mask = pc.equal(g.column("event_type"), "purchase")
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "prev_view_ts": pa.Array.from_pandas(
                np.where(prior >= 0, prior, None)).cast(pa.timestamp("us")),
        }).filter(mask)

    return (ds.map_batches(lambda t: add_bucket(t, "user_id", n_buckets),
                           batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow"))


def asof_prior_view_sql() -> str:
    return """
    SELECT event_id, user_id, ts, prev_view_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts
      FROM events) t
    WHERE event_type = 'purchase'
    """


# ---------------------------------------------------------------------------
# JSON property extraction (the json-assembly/parse scalar layer, SURVEY §2.9)
# ---------------------------------------------------------------------------

def props_k_stats(sf_dir: str):
    """Parse the JSON ``props`` column, extract integer field "k", aggregate
    per event_type (vectorized regex field pull — props are flat JSON, no
    Python json.loads per row — then two-phase sum/count)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"),
                              r'"k":\s*(?P<k>-?[0-9]+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        local = (pa.table({"event_type": t.column("event_type"), "k": k})
                 .filter(pc.is_valid(k))
                 .group_by("event_type")
                 .aggregate([("k", "sum"), ("k", "count")]))
        return local.rename_columns(["event_type", "sum_k", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum(on="sum_k", alias_name="sum_k"),
                       Sum(on="n", alias_name="n_with_k"))
            .map_batches(
                lambda t: t.select(["event_type", "sum_k", "n_with_k"])
                if t.num_columns else pa.schema(
                    [("event_type", pa.string()), ("sum_k", pa.int64()),
                     ("n_with_k", pa.int64())]).empty_table(),
                batch_format="pyarrow"))


def props_k_stats_sql() -> str:
    return """
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(json_extract(props, '$.k')) AS n_with_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# daily-count anomaly scores (integer-exact z² milli per event_type day)
# ---------------------------------------------------------------------------

def daily_anomaly(sf_dir: str):
    """Per-(event_type, calendar day) event-count outlier scores:
    z²·1000 computed EXACTLY in integers — z² = (n·c − s)² / (c·ss − s²)
    for day count n against the type's day-count distribution
    (c = #days, s = Σn, ss = Σn²) — so the Ray result and the SQL
    mirror agree bit-for-bit (no float stddev).

    Scale shape: raw events pre-aggregate per batch to (type, day)
    partial counts — the exchange is (types × days)-bounded, never
    corpus-bounded; the per-type finish is one vectorized pass over a
    type's day rows (types are a small set, days bounded by the corpus
    time span)."""
    day_us = 86400 * 1_000_000
    ds = ray.data.read_parquet(_p(sf_dir), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t.column("ts").cast(pa.int64()), day_us)
        p = (pa.table({"event_type": t.column("event_type"), "day": day})
             .group_by(["event_type", "day"])
             .aggregate([([], "count_all")]))
        return (p.select(["event_type", "day", "count_all"])
                .rename_columns(["event_type", "day", "n"]))

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["event_type", "day"])
              .aggregate(Sum(on="n", alias_name="n")))

    def finish(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("event_type", pa.string()), ("day", pa.string()),
            ("n_events", pa.int64()), ("z2_milli", pa.int64())])
        if g.num_rows == 0:
            return out_schema.empty_table()
        n = g.column("n").cast(pa.int64()).to_numpy()
        c = len(n)
        s = int(n.sum())
        ss = int((n.astype(object) * n.astype(object)).sum())
        den = c * ss - s * s
        if den > 0:
            # python-int vectorized via object dtype: exact at any count
            dev = n.astype(object) * c - s
            z2 = np.array([(1000 * d * d) // den for d in dev],
                          dtype=np.int64)
        else:
            z2 = np.zeros(c, dtype=np.int64)
        iso = pc.strftime(
            pc.cast(pc.multiply(g.column("day").cast(pa.int64()), day_us),
                    pa.timestamp("us")), "%Y-%m-%d")
        return pa.table({
            "event_type": g.column("event_type").cast(pa.string()),
            "day": iso,
            "n_events": pa.array(n, pa.int64()),
            "z2_milli": pa.array(z2, pa.int64())})

    return counts.groupby("event_type").map_groups(
        finish, batch_format="pyarrow")


def daily_anomaly_sql() -> str:
    return """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
    a AS (
      SELECT event_type, count(*) AS c, sum(n) AS s, sum(n * n) AS ss
      FROM d GROUP BY 1)
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n_events,
           CAST(CASE WHEN a.c * a.ss - a.s * a.s > 0
                THEN (1000 * CAST(d.n * a.c - a.s AS HUGEINT)
                           * (d.n * a.c - a.s))
                     // (a.c * a.ss - a.s * a.s)
                ELSE 0 END AS BIGINT) AS z2_milli
    FROM d JOIN a USING (event_type)
    """


# ---------------------------------------------------------------------------
# ordered funnel (view → click → purchase)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(sf_dir: str, *, n_buckets: int = 256):
    """Ordered-funnel completion counts: (step, n_users) where a user
    reaches step k iff the first step-k event STRICTLY AFTER their
    step-(k-1) completion time exists (min-ts chaining — the standard
    funnel semantics; ties on ts do not advance the funnel).

    Scale shape: users co-locate into hash(user_id) bucket shards; the
    per-shard chain is vectorized (factorize + ``np.minimum.at`` per
    step — no per-user Python groups), each shard emits at most
    len(FUNNEL_STEPS) partial rows, and the global exchange is a
    3-row-per-shard sum."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["user_id", "event_type", "ts"])

    def shard(g: pa.Table) -> pa.Table:
        import pandas as pd
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(uid, sort=False)
        if len(codes) == 0:
            return pa.schema([("step", pa.int32()),
                              ("n_users", pa.int64())]).empty_table()
        n_users = codes.max() + 1
        prev = np.full(n_users, -(2 ** 62), dtype=np.int64)  # step-0 time
        counts = []
        for step_type in FUNNEL_STEPS:
            cur = np.full(n_users, 2 ** 62, dtype=np.int64)
            m = (et == step_type) & (ts > prev[codes])
            np.minimum.at(cur, codes[m], ts[m])
            reached = cur < 2 ** 62
            counts.append(int(reached.sum()))
            prev = cur
        return pa.table({
            "step": pa.array(range(1, len(FUNNEL_STEPS) + 1), pa.int32()),
            "n_users": pa.array(counts, pa.int64())})

    return (ds.map_batches(lambda t: add_bucket(t, "user_id", n_buckets),
                           batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow")
            .groupby("step")
            .aggregate(Sum(on="n_users", alias_name="n_users"))
            .map_batches(
                lambda t: pa.table(
                    {"step": t.column("step").cast(pa.int32()),
                     "n_users": t.column("n_users").cast(pa.int64())})
                if t.num_columns else pa.schema(
                    [("step", pa.int32()),
                     ("n_users", pa.int64())]).empty_table(),
                batch_format="pyarrow"))


def funnel_sql() -> str:
    steps = FUNNEL_STEPS
    return f"""
    WITH t1 AS (
      SELECT user_id, min(ts) AS c FROM events
      WHERE event_type = '{steps[0]}' GROUP BY 1),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS c FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.c
      WHERE e.event_type = '{steps[1]}' GROUP BY 1),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS c FROM events e
      JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.c
      WHERE e.event_type = '{steps[2]}' GROUP BY 1)
    SELECT CAST(step AS INTEGER) AS step, n_users FROM (
      SELECT 1 AS step, count(*) AS n_users FROM t1
      UNION ALL SELECT 2, count(*) FROM t2
      UNION ALL SELECT 3, count(*) FROM t3)
    ORDER BY step
    """


# ---------------------------------------------------------------------------
# cohort retention (first-day cohort × day offset)
# ---------------------------------------------------------------------------

def retention(sf_dir: str, *, n_buckets: int = 256):
    """Classic cohort-retention matrix: cohort = calendar day of the
    user's FIRST event; a user counts toward (cohort_day, day_offset)
    iff they have any event exactly day_offset days after their cohort
    day.  Output: (cohort_day ISO string, day_offset, n_users).

    Scale shape: one user-bucketed shard pass — per user the first day
    and the distinct active-day set are computed vectorized (lexsort +
    boundary diff), each shard pre-aggregates to (cohort, offset)
    partial counts, and the global exchange carries only those
    (days × offsets)-bounded rows."""
    from ..functions.buckets import add_bucket

    ds = ray.data.read_parquet(_p(sf_dir), columns=["user_id", "ts"])
    day_us = 86400 * 1_000_000

    def shard(g: pa.Table) -> pa.Table:
        import pandas as pd
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = (g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // day_us).astype(np.int64)
        codes, _ = pd.factorize(uid, sort=False)
        if len(codes) == 0:
            return pa.schema([("cohort_day", pa.int64()),
                              ("day_offset", pa.int32()),
                              ("n_users", pa.int64())]).empty_table()
        n_users = codes.max() + 1
        first = np.full(n_users, 2 ** 62, dtype=np.int64)
        np.minimum.at(first, codes, day)
        # distinct (user, day) pairs via one lexsort + adjacent diff
        order = np.lexsort((day, codes))
        cc, dd = codes[order], day[order]
        keep = np.empty(len(cc), dtype=bool)
        keep[0] = True
        keep[1:] = (cc[1:] != cc[:-1]) | (dd[1:] != dd[:-1])
        cc, dd = cc[keep], dd[keep]
        cohort = first[cc]
        offset = (dd - cohort).astype(np.int32)
        part = (pa.table({"cohort_day": pa.array(cohort, pa.int64()),
                          "day_offset": pa.array(offset, pa.int32())})
                .group_by(["cohort_day", "day_offset"])
                .aggregate([([], "count_all")]))
        # select by GENERATED name (never positional rename — pyarrow
        # moved key-column position between major versions)
        return (part.select(["cohort_day", "day_offset", "count_all"])
                .rename_columns(["cohort_day", "day_offset", "n_users"]))

    def tidy(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.schema([("cohort_day", pa.string()),
                              ("day_offset", pa.int32()),
                              ("n_users", pa.int64())]).empty_table()
        iso = pc.strftime(
            pc.cast(pc.multiply(t.column("cohort_day").cast(pa.int64()),
                                day_us), pa.timestamp("us")), "%Y-%m-%d")
        return pa.table({"cohort_day": iso,
                         "day_offset": t.column("day_offset")
                         .cast(pa.int32()),
                         "n_users": t.column("n_users").cast(pa.int64())})

    return (ds.map_batches(lambda t: add_bucket(t, "user_id", n_buckets),
                           batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Sum(on="n_users", alias_name="n_users"))
            .map_batches(tidy, batch_format="pyarrow"))


def retention_sql() -> str:
    return """
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY 1),
    d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, d.day) AS INTEGER) AS day_offset,
           count(*) AS n_users
    FROM d JOIN f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
