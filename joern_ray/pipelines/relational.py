"""Relational operator pack over the TPC-H-ish testdata tables.

These exercise the engine's generic relational layer — the Ray Data
re-expression of the reference's linking/aggregation/set-op vocabulary
(SURVEY.md §2.4/§2.5/§2.8): broadcast hash joins for dimension tables,
partial-then-global aggregation, anti/semi joins for the stub-creation
patterns, sort+limit, distinct.

Numeric discipline for oracle parity: monetary sums are computed in integer
cents (`round half-away-from-zero`, matching DuckDB) so results are exact
and independent of float summation order.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.joins import broadcast_join, table_of


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _cents(col) -> pa.ChunkedArray:
    # 'half_towards_infinity' == round half away from zero == DuckDB round()
    return pc.round(pc.multiply(col, 100.0), 0,
                    round_mode="half_towards_infinity").cast(pa.int64())


def _repartition_tidy(ds):
    # hash aggregates emit schemaless empty blocks; merge them away so
    # downstream consumers (and the driver's conversion) see a clean schema
    return ds.repartition(4)


def q1_pricing(sf_dir: str):
    """TPC-H Q1 analog: per (returnflag, linestatus) pricing summary."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": t.column("l_quantity").cast(pa.int64()),
            "base_cents": _cents(t.column("l_extendedprice")),
            "disc_cents": _cents(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(1.0, t.column("l_discount")))),
        })

    return _repartition_tidy(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum(on="qty", alias_name="sum_qty"),
                   Sum(on="base_cents", alias_name="sum_base_cents"),
                   Sum(on="disc_cents", alias_name="sum_disc_cents"),
                   Count(alias_name="count_order")))


def q1_pricing_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """


def topk_orders(sf_dir: str):
    """Global top-20 by total price, deterministic key tie-break."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort([("o_totalprice"), ("o_orderkey")],
                   descending=[True, False]).limit(20)


def topk_orders_sql() -> str:
    return """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """


def orders_by_segment(sf_dir: str):
    """Broadcast dim join (orders ⋈ customer) + aggregate by segment."""
    cust = table_of(_p(sf_dir, "customer"),
                    columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, keys=["o_custkey"],
                            right_keys=["c_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": t.column("c_mktsegment"),
                         "total_cents": _cents(t.column("o_totalprice"))})

    return _repartition_tidy(
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"),
                   Sum(on="total_cents", alias_name="total_cents")))


def orders_by_segment_sql() -> str:
    return """
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """


BIG_ORDER = 300_000.0


def customers_without_orders(sf_dir: str):
    """Anti-join (the whereNot/stub-creation set-difference pattern):
    customers that never placed a high-value order."""
    orders = table_of(_p(sf_dir, "orders"),
                      columns=["o_custkey", "o_totalprice"])
    big = orders.filter(pc.greater(orders.column("o_totalprice"), BIG_ORDER))
    cust = ray.data.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return broadcast_join(cust, big.select(["o_custkey"]),
                          keys=["c_custkey"], right_keys=["o_custkey"],
                          join_type="left anti")


def customers_without_orders_sql() -> str:
    return f"""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_totalprice > {BIG_ORDER})
    """


def suppliers_with_shipments(sf_dir: str):
    """Semi-join."""
    li = table_of(_p(sf_dir, "lineitem"), columns=["l_suppkey"])
    li = li.group_by("l_suppkey").aggregate([])  # local distinct first
    sup = ray.data.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    return broadcast_join(sup, li, keys=["s_suppkey"],
                          right_keys=["l_suppkey"], join_type="left semi")


def suppliers_with_shipments_sql() -> str:
    return """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
    """


def distinct_part_types(sf_dir: str):
    """Global distinct with per-batch combiner (TypeNodePass set-union)."""
    ds = ray.data.read_parquet(_p(sf_dir, "part"), columns=["p_type"])
    return _repartition_tidy(
        ds.map_batches(lambda t: t.group_by("p_type").aggregate([]),
                       batch_format="pyarrow")
        .groupby("p_type").aggregate(Count(alias_name="nb"))
        .map_batches(lambda t: (t.select(["p_type"]) if t.num_columns
                                else pa.schema([("p_type", pa.string())]).empty_table()),
                     batch_format="pyarrow"))


def distinct_part_types_sql() -> str:
    return "SELECT DISTINCT p_type FROM part"


def revenue_by_nation(sf_dir: str):
    """Multi-hop dim join: orders ⋈ customer ⋈ nation → revenue per nation."""
    cust = table_of(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = table_of(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    # compose the two small dims driver-side (they stay tiny), broadcast once
    dim = cust.join(nation, keys=["c_nationkey"], right_keys=["n_nationkey"])
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, dim.select(["c_custkey", "n_name"]),
                            keys=["o_custkey"], right_keys=["c_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"n_name": t.column("n_name"),
                         "revenue_cents": _cents(t.column("o_totalprice"))})

    return _repartition_tidy(
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"),
                   Sum(on="revenue_cents", alias_name="revenue_cents")))


def revenue_by_nation_sql() -> str:
    return """
    SELECT n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """


def events_by_user(sf_dir: str):
    """Stream-table aggregate: per-user activity summary."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "value_cents": _cents(t.column("value"))})

    return _repartition_tidy(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"),
                   Min(on="ts", alias_name="first_ts"),
                   Max(on="ts", alias_name="last_ts"),
                   Sum(on="value_cents", alias_name="value_cents")))


def events_by_user_sql() -> str:
    return """
    SELECT user_id, count(*) AS n_events, min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """


def filter_project_parts(sf_dir: str):
    """Predicate pushdown + projection at the read."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_name", "p_type", "p_size"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("p_size"), 30)),
        batch_format="pyarrow", zero_copy_batch=True)


def filter_project_parts_sql() -> str:
    return "SELECT p_partkey, p_name, p_type, p_size FROM part WHERE p_size > 30"


def running_order_total(sf_dir: str, *, n_buckets: int = 1024):
    """Per-customer running total of order value (cents) in order-date
    order — the distributed window-function pattern: customers grouped
    into hash buckets (whole customer history per bucket), cumulative sums
    vectorized per bucket."""
    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def key(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        h = pd.util.hash_array(t.column("o_custkey").to_numpy())
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_orderdate": t.column("o_orderdate"),
            "cents": cents,
            "bucket": pa.array((h % n_buckets).astype("int64")),
        })

    def window(group: pa.Table) -> pa.Table:
        df = group.drop_columns(["bucket"]).to_pandas().sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort",
            ignore_index=True)
        run = df.groupby("o_custkey", sort=False)["cents"].cumsum()
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
            "o_custkey": pa.array(df["o_custkey"], pa.int64()),
            "running_cents": pa.array(run.to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("bucket").map_groups(window, batch_format="pyarrow"))


def order_gaps(sf_dir: str, *, n_buckets: int = 1024):
    """Per-customer consecutive-order calendar-day gaps (the LAG window
    class): for every customer with ≥2 orders, the order count, the
    integer-milli mean gap and the max gap between consecutive orders in
    (o_orderdate, o_orderkey) order.  Calendar-day semantics (epoch-day
    difference) shared exactly with the SQL mirror's
    datediff('day', CAST(.. AS DATE), ..).

    Scale shape: customers hash into buckets (whole history per bucket);
    the per-bucket pass is one lexsort + boundary diff + np.add/maximum
    scatter — no per-customer Python groups, and only (custkey, 3 ints)
    rows leave any bucket."""
    import numpy as np
    import pandas as pd

    day_us = 86400 * 1_000_000
    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    out_schema = pa.schema([
        ("custkey", pa.int64()), ("n_orders", pa.int64()),
        ("avg_gap_days_milli", pa.int64()), ("max_gap_days", pa.int64())])

    def key(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t.column("o_custkey").to_numpy())
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "day": pc.divide(t.column("o_orderdate").cast(pa.int64()),
                             day_us),
            "bucket": pa.array((h % n_buckets).astype("int64")),
        })

    def shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).combine_chunks()
        if g.num_rows == 0:
            return out_schema.empty_table()
        cust = g.column("o_custkey").to_numpy()
        day = g.column("day").to_numpy()
        okey = g.column("o_orderkey").to_numpy()
        order = np.lexsort((okey, day, cust))
        cust, day = cust[order], day[order]
        codes, uniq = pd.factorize(cust, sort=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        same = np.empty(len(cust), dtype=bool)
        same[0] = False
        same[1:] = cust[1:] == cust[:-1]
        gap = np.empty(len(cust), dtype=np.int64)
        gap[0] = 0
        gap[1:] = day[1:] - day[:-1]
        gsum = np.zeros(len(uniq), dtype=np.int64)
        gmax = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(gsum, codes[same], gap[same])
        np.maximum.at(gmax, codes[same], gap[same])
        keep = n >= 2
        return pa.table({
            "custkey": pa.array(np.asarray(uniq)[keep], pa.int64()),
            "n_orders": pa.array(n[keep], pa.int64()),
            "avg_gap_days_milli": pa.array(
                (1000 * gsum[keep]) // (n[keep] - 1), pa.int64()),
            "max_gap_days": pa.array(gmax[keep], pa.int64())})

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow"))


def order_gaps_sql() -> str:
    return """
    WITH g AS (
      SELECT o_custkey,
             datediff('day',
                      CAST(lag(o_orderdate) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DATE),
                      CAST(o_orderdate AS DATE)) AS gap
      FROM orders)
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((1000 * sum(gap)) // count(gap) AS BIGINT)
             AS avg_gap_days_milli,
           CAST(max(gap) AS BIGINT) AS max_gap_days
    FROM g GROUP BY 1 HAVING count(gap) >= 1
    """


TOPK_PER_GROUP = 3


def topk_orders_per_customer(sf_dir: str, *, n_buckets: int = 1024):
    """Top-k orders per customer (the per-group head pattern): customers
    hash into buckets (whole history per bucket), one vectorized pandas
    sort + groupby-head per bucket — never a per-customer Ray group."""
    import pandas as pd

    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def key(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t.column("o_custkey").to_numpy())
        return t.append_column(
            "bucket", pa.array((h % n_buckets).astype("int64")))

    def head(group: pa.Table) -> pa.Table:
        df = (group.drop_columns(["bucket"]).to_pandas()
              .sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                           ascending=[True, False, True], kind="mergesort"))
        out = df.groupby("o_custkey", sort=False).head(TOPK_PER_GROUP)
        r = (out.groupby("o_custkey", sort=False).cumcount() + 1)
        return pa.table({
            "o_custkey": pa.array(out["o_custkey"].to_numpy(), pa.int64()),
            "rank": pa.array(r.to_numpy(), pa.int64()),
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("bucket").map_groups(head, batch_format="pyarrow"))


def topk_orders_per_customer_sql() -> str:
    return f"""
    SELECT o_custkey, rank, o_orderkey FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders) t
    WHERE rank <= {TOPK_PER_GROUP}
    """


QUANTILES = (25, 50, 75)


def price_quantiles_by_segment(sf_dir: str):
    """Exact discrete per-segment price quantiles at 100-TB shape: the
    full order stream collapses to a (segment, cents) VALUE HISTOGRAM via
    two-phase counting (bounded by the price domain, not the row count),
    then one tiny per-segment pass selects the smallest value whose
    cumulative count ≥ q·n — byte-identical to DuckDB ``quantile_disc``
    (probed: its rule is exactly this cum≥q·n selection)."""
    import numpy as np

    cust = table_of(_p(sf_dir, "customer"),
                    columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, keys=["o_custkey"],
                            right_keys=["c_custkey"])

    def hist(t: pa.Table) -> pa.Table:
        return (pa.table({"c_mktsegment": t.column("c_mktsegment"),
                          "cents": _cents(t.column("o_totalprice"))})
                .group_by(["c_mktsegment", "cents"])
                .aggregate([("cents", "count")])
                .rename_columns(["c_mktsegment", "cents", "n"]))

    from ray.data.aggregate import Sum

    def select(group: pa.Table) -> pa.Table:
        g = group.sort_by("cents")
        seg = g.column("c_mktsegment")[0].as_py()
        cents = g.column("cents").to_numpy()
        cum = np.cumsum(g.column("n").to_numpy())
        total = cum[-1]
        out_q, out_v = [], []
        for q in QUANTILES:
            idx = int(np.searchsorted(cum, q * total / 100.0))
            out_q.append(q)
            out_v.append(int(cents[min(idx, len(cents) - 1)]))
        return pa.table({"c_mktsegment": pa.array([seg] * len(out_q)),
                         "q_pct": pa.array(out_q, pa.int64()),
                         "cents": pa.array(out_v, pa.int64())})

    return (joined.map_batches(hist, batch_format="pyarrow")
            .groupby(["c_mktsegment", "cents"])
            .aggregate(Sum(on="n", alias_name="n"))
            .groupby("c_mktsegment")
            .map_groups(select, batch_format="pyarrow"))


def price_quantiles_by_segment_sql() -> str:
    parts = [f"""
    SELECT c_mktsegment, CAST({q} AS BIGINT) AS q_pct,
           quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
                         {q / 100.0}) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment""" for q in QUANTILES]
    return " UNION ALL ".join(parts)


def running_order_total_sql() -> str:
    return """
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM orders
    """
