"""Query surface over the driver testdata tables + the synthetic KG corpus.

Every function here takes ``sf_dir`` and returns a Dataset / DataFrame /
Table; ``SQL`` holds the DuckDB oracle for each SQL-expressible query with
IDENTICAL output column names (the driver hashes values after sorting
columns by name). Float aggregate outputs are ROUNDed the same way on both
sides so summation-order ulps can't flip the value hash.

Operator coverage map (SURVEY.md §2): pricing_summary A-class partial+final
aggregation; topk_orders W1; mktsegment_revenue J-broadcast;
large_part_lineitems J4 semi-join; idle_customers J5 anti-join;
customer_min_order A1; hourly_events §2.8 window; union_sources W4;
orders_lineitem_join partitioned hash join; asof_events_orders custom as-of
operator; exact_dedup/token/fingerprint/knn = training-data ops.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.dedup import exact_dedup
from ..stages.similarity import brute_force_topk
from ..stages.textstats import fingerprint_md5, token_counts
from ..state.joins import (
    anti_join_filter,
    asof_join,
    collect_broadcast_df,
    hash_join,
    semi_join_filter,
)


def _pq(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _grouped_final(partials, keys: list[str], agg: dict, post=None,
                   num_partitions: int | None = None):
    """Vectorized final merge of per-batch partial aggregates: one pandas
    groupby.agg per hash partition (state/groupby.partition_reduce) instead
    of one Python call per key. ``agg``: out_col -> (in_col, fn);
    ``post(df) -> df`` applies rounding/casts."""
    from ..state.groupby import partition_reduce

    def reduce(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby(keys, as_index=False).agg(**agg)
        return post(out) if post else out

    return partition_reduce(partials, keys, reduce, num_partitions=num_partitions)


def _arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


# ---------------------------------------------------------------- aggregates

def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with per-batch partial combine
    before the (tiny) global groupby — the pre-aggregation pattern that
    keeps the shuffle at O(groups × batches), not O(rows)."""
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(disc_price=df["l_extendedprice"] * (1 - df["l_discount"]))
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["count_order"].sum())
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "l_linestatus": [g["l_linestatus"].iloc[0]],
            "sum_qty": [round(float(g["sum_qty"].sum()), 2)],
            "sum_base_price": [round(float(g["sum_base_price"].sum()), 2)],
            "sum_disc_price": [round(float(g["sum_disc_price"].sum()), 2)],
            "avg_disc": [round(float(g["sum_disc"].sum()) / n, 4)],
            "count_order": [np.int64(n)],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(final, batch_format="pandas")
    )


def topk_orders(sf_dir: str):
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "total": df["o_totalprice"].round(2),
        }),
        batch_format="pandas",
    )


def customer_min_order(sf_dir: str):
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(m=("o_totalprice", "min"))

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"min_totalprice": ("m", "min")},
        post=lambda df: df.assign(min_totalprice=df["min_totalprice"].round(2)),
    )


def hourly_events(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped; §2.8) — hour buckets as
    strings so both engines agree on the output dtype exactly."""
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=pd.to_datetime(df["ts"]).dt.strftime("%Y-%m-%d %H:00:00"))
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("value", "size"), s=("value", "sum")
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["hour", "event_type"],
        {"n": ("n", "sum"), "sum_value": ("s", "sum")},
        post=lambda df: df.assign(
            n=df["n"].astype("int64"), sum_value=df["sum_value"].round(2)
        ),
    )


def event_user_stats(sf_dir: str):
    ds = _pq(sf_dir, "events", ["event_type", "user_id"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": [np.int64(len(g))],
            "users": [np.int64(g["user_id"].nunique())],
        })

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


def json_props_sum(sf_dir: str):
    """Scalar JSON-field extraction (§2.7 json ops) — vectorized regex."""
    ds = _pq(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k":\s*(\d+)')[0].astype("int64")
        return (
            df.assign(k=k)
            .groupby("event_type", as_index=False)
            .agg(s=("k", "sum"))
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"sum_k": ("s", "sum")},
        post=lambda df: df.assign(sum_k=df["sum_k"].astype("int64")),
        num_partitions=4,
    )


# ------------------------------------------------------------------- joins

def mktsegment_revenue(sf_dir: str):
    """orders ⋈ customer with the dimension side broadcast (ray.put once)."""
    cust = collect_broadcast_df(
        _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        ["c_custkey", "c_mktsegment"],
    )
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        df = df.assign(c_mktsegment=df["o_custkey"].map(seg))
        return df.groupby("c_mktsegment", as_index=False).agg(
            n=("o_totalprice", "size"), s=("o_totalprice", "sum")
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["c_mktsegment"],
        {"order_count": ("n", "sum"), "revenue": ("s", "sum")},
        post=lambda df: df.assign(
            order_count=df["order_count"].astype("int64"),
            revenue=df["revenue"].round(2),
        ),
        num_partitions=4,
    )


def large_part_lineitems(sf_dir: str):
    """Semi-join via broadcast key set (J4)."""
    part = collect_broadcast_df(
        _pq(sf_dir, "part", ["p_partkey", "p_size"]), ["p_partkey", "p_size"]
    )
    keys_ref = ray.put(set(part.loc[part["p_size"] >= 40, "p_partkey"]))
    ds = _pq(sf_dir, "lineitem", ["l_partkey", "l_returnflag", "l_extendedprice"])
    ds = semi_join_filter(ds, "l_partkey", keys_ref)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_returnflag", as_index=False).agg(
            n=("l_extendedprice", "size"), s=("l_extendedprice", "sum")
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {"n": ("n", "sum"), "total": ("s", "sum")},
        post=lambda df: df.assign(
            n=df["n"].astype("int64"), total=df["total"].round(2)
        ),
        num_partitions=4,
    )


def idle_customers(sf_dir: str):
    """Anti-join via broadcast key set (J5): customers with no URGENT order."""
    import pyarrow.compute as pc

    okeys = (
        _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    keys_ref = ray.put(set(okeys))
    ds = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds = anti_join_filter(ds, "c_custkey", keys_ref)

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": [g["c_mktsegment"].iloc[0]],
            "idle_customers": [np.int64(len(g))],
        })

    return ds.groupby("c_mktsegment").map_groups(per_seg, batch_format="pandas")


def orders_lineitem_join(sf_dir: str, strategy: str = "auto"):
    """Fact-fact join (state/joins.hash_join): auto tier broadcasts the
    dimension-sized right side; ``strategy="shuffle"`` forces the
    both-sides-large partitioned path (kept oracle-checked via the
    ``orders_lineitem_join_shuffle`` query)."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def _project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.Table.from_arrays([b["l_orderkey"], rev], names=["o_orderkey", "rev"])

    li = li.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    # buckets auto-sized from input bytes (shuffle tier only)
    joined = hash_join(li, orders, on="o_orderkey", strategy=strategy)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n=("rev", "size"), s=("rev", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_lines": [np.int64(g["n"].sum())],
            "revenue": [round(float(g["s"].sum()), 2)],
        })

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pandas")
    )


def urgent_lineitem_revenue(sf_dir: str, bloom: bool = True):
    """Selective fact join on the FORCED shuffle tier with the Bloom
    prefilter (state/joins.hash_join bloom_prefilter): the right side is
    orders filtered to one priority (~20%), so ~80% of lineitem rows are
    dropped before the exchange — the runtime-row-filter pattern
    (exactness preserved: Bloom false positives still meet the merge)."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def _project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.Table.from_arrays([b["l_orderkey"], rev], names=["o_orderkey", "rev"])

    li = li.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)
    import pyarrow.dataset as pads

    # row filter pushed to the parquet read (row-group pruning at source)
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )
    joined = hash_join(
        li, orders, on="o_orderkey", strategy="shuffle", bloom_prefilter=bloom
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n=("rev", "size"), s=("rev", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_lines": [np.int64(g["n"].sum())],
            "revenue": [round(float(g["s"].sum()), 2)],
        })

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pandas")
    )


def user_event_type_sets(sf_dir: str):
    """Grouped collect-set with deterministic order (the set-union /
    provenance-collect shape, SURVEY A2, as a standalone string
    aggregation): per user, the sorted distinct event types joined with
    ','. Per-batch pair dedup defuses repetition before the exchange."""
    from ..state.groupby import partition_reduce

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["user_id", "event_type"])

    def reduce(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates(["user_id", "event_type"])
        g = part.sort_values("event_type").groupby("user_id", as_index=False).agg(
            event_types=("event_type", ",".join),
            n_types=("event_type", "size"),
        )
        return g.astype({"n_types": "int64"})

    return partition_reduce(
        ds.map_batches(local_dedup, batch_format="pandas"), ["user_id"], reduce
    )


def distinct_users_by_type(sf_dir: str):
    """Exact grouped distinct counts (stages/distinct.grouped_distinct)."""
    from ..stages.distinct import grouped_distinct

    ds = _pq(sf_dir, "events", ["event_type", "user_id"])
    return grouped_distinct(ds, "event_type", "user_id")


def top_users_by_type(sf_dir: str):
    """Exact grouped heavy hitters (stages/topfreq.grouped_topn_values)."""
    from ..stages.topfreq import grouped_topn_values

    ds = _pq(sf_dir, "events", ["event_type", "user_id"])
    return grouped_topn_values(ds, "event_type", "user_id", 3)


def curated_corpus_stats_query(sf_dir: str):
    """End-to-end curation recipe stats (pipelines/curate.py)."""
    from .curate import curated_corpus_stats

    return curated_corpus_stats(sf_dir)


def asof_events_orders(sf_dir: str, strategy: str = "auto"):
    """As-of join: each event matched to the user's latest order at or
    before the event time (custom operator; right side pre-aggregated to
    one row per (key, time) so the match is deterministic)."""
    events = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        """Per-batch PARTIAL dedup (no shuffle) — the final merge runs
        inside asof_join via right_reduce (once at broadcast build, or per
        partition in the shuffle tier), so the right side never needs its
        own all-to-all."""
        g = df.groupby(["o_custkey", "o_orderdate"], as_index=False).agg(
            best_price=("o_totalprice", "max")
        )
        return g.rename(columns={"o_custkey": "user_id"})

    def dedup_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "o_orderdate"], as_index=False).agg(
            best_price=("best_price", "max")
        )

    joined = asof_join(
        events,
        orders.map_batches(pre, batch_format="pandas"),
        by="user_id", on="ts", right_on="o_orderdate",
        right_reduce=dedup_final, strategy=strategy,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["best_price"].notna()]
        return df.groupby("event_type", as_index=False).agg(
            n=("best_price", "size"), s=("best_price", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": [np.int64(g["n"].sum())],
            "matched_total": [round(float(g["s"].sum()), 2)],
        })

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def session_stats_q(sf_dir: str):
    """Gap-based session windows (streaming-shaped, §2.8)."""
    from ..stages.windows import session_stats

    return session_stats(_pq(sf_dir, "events", ["user_id", "ts"]), gap_minutes=30)


def sliding_event_counts(sf_dir: str):
    """Sliding 2h/1h windows per event type — oracle-checked via the DuckDB
    window-explode (events × range(n_slots))."""
    from ..stages.windows import sliding_counts

    return sliding_counts(_pq(sf_dir, "events", ["ts", "event_type"]))


def top_orders_per_priority(sf_dir: str):
    """Per-group top-N whole rows with rank (ROW_NUMBER window analog,
    stages/windows.grouped_topn_rows): per-batch partial top-3 bounds the
    exchange at 3 rows per (priority, batch)."""
    from ..stages.windows import grouped_topn_rows

    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    top = grouped_topn_rows(
        ds, ["o_orderpriority"], "o_totalprice", 3,
        descending=True, tiebreak=["o_orderkey"],
    )
    return top.map_batches(
        lambda df: df.assign(o_totalprice=df["o_totalprice"].round(2),
                             rn=df["rn"].astype("int64")),
        batch_format="pandas",
    )


def customer_running_spend(sf_dir: str):
    """Running per-customer order total in order-date order (cumulative
    window-sum analog, stages/windows.running_group_agg) — row-per-order
    output, each customer co-located once."""
    from ..stages.windows import running_group_agg

    ds = _pq(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    run = running_group_agg(
        ds, ["o_custkey"], ["o_orderdate", "o_orderkey"], "o_totalprice",
        out_col="running_spend",
    )
    return run.map_batches(
        lambda df: df[["o_custkey", "o_orderkey", "running_spend"]],
        batch_format="pandas",
    )


def revenue_rollup(sf_dir: str):
    """One-pass GROUP BY ROLLUP(l_returnflag, l_linestatus) on lineitem
    revenue (stages/windows.rollup_aggregate): every level computed from
    the same per-batch partials, no second scan."""
    from ..stages.windows import rollup_aggregate

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])
    with_rev = ds.map_batches(
        lambda df: pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "rev": df["l_extendedprice"] * (1 - df["l_discount"]),
        }),
        batch_format="pandas",
    )
    return rollup_aggregate(
        with_rev, ["l_returnflag", "l_linestatus"], "rev",
        sum_col="revenue", count_col="n_lines",
    )


def followup_orders(sf_dir: str, strategy: str = "auto"):
    """Point-in-interval join (state/joins.interval_join): each order
    matched to every EARLIER order by the same customer whose 90-day
    follow-up window contains it — the many-to-many inequality-join shape
    neither hash nor as-of joins express. Aggregated per window priority."""
    from ..state.joins import interval_join

    points = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    windows_src = _pq(sf_dir, "orders",
                      ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "w_orderkey": df["o_orderkey"],
            "o_custkey": df["o_custkey"],
            "w_start": df["o_orderdate"],
            "w_end": df["o_orderdate"] + pd.Timedelta(days=90),
            "w_priority": df["o_orderpriority"],
        })

    j = interval_join(
        points,
        windows_src.map_batches(windows, batch_format="pandas"),
        on="o_orderdate", right_start="w_start", right_end="w_end",
        by=["o_custkey"], bucket_width=pd.Timedelta(days=90), strategy=strategy,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderkey"] != df["w_orderkey"]]  # drop the self-pair
        return df.groupby("w_priority", as_index=False).agg(
            n=("o_totalprice", "size"), s=("o_totalprice", "sum")
        )

    return _grouped_final(
        j.map_batches(partial, batch_format="pandas"),
        ["w_priority"],
        {"n": ("n", "sum"), "followup_total": ("s", "sum")},
        post=lambda df: df.assign(n=df["n"].astype("int64"),
                                  followup_total=df["followup_total"].round(2)),
        num_partitions=4,
    )


def event_sessions(sf_dir: str):
    """Row-level sessionization (stages/windows.sessionize): every event
    tagged with its gap-based session ordinal — oracle = LAG() + running
    SUM() windows."""
    from ..stages.windows import sessionize

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    return sessionize(ds, key_col="user_id", ts_col="ts", id_col="event_id",
                      gap_minutes=30)


def boilerplate_by_source(sf_dir: str):
    """Cross-doc duplicated-sentence (boilerplate) ratio per source
    (stages/textstats.boilerplate_stats) — sentence hashes exchange, text
    never does."""
    from ..stages.textstats import boilerplate_stats

    ds = _pq(sf_dir, "documents", ["doc_id", "source", "text"])
    return boilerplate_stats(ds, "doc_id", "text", "source")


def label_centroids_q(sf_dir: str):
    """Grouped vector aggregate (stages/similarity.label_centroids):
    per-label embedding centroid, long-form output so DuckDB can check it
    with list indexing."""
    from ..stages.similarity import label_centroids

    ds = _pq(sf_dir, "embeddings", ["label", "embedding"])
    return label_centroids(ds, "label", "embedding", 64)


def customer_order_counts(sf_dir: str):
    """LEFT OUTER hash join: every customer row survives, idle customers
    carry zero counts (null-fill after the join) — J6 lookup-with-default
    as a SQL-checked query."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("o_totalprice", "size"), s=("o_totalprice", "sum")
        )
        return g.rename(columns={"o_custkey": "c_custkey"})

    counts = _grouped_final(
        orders.map_batches(partial, batch_format="pandas"),
        ["c_custkey"],
        {"n": ("n", "sum"), "s": ("s", "sum")},
        num_partitions=8,
    )
    j = hash_join(cust, counts, on="c_custkey", how="left")
    return j.map_batches(
        lambda df: pd.DataFrame({
            "c_custkey": df["c_custkey"],
            "c_mktsegment": df["c_mktsegment"],
            "n_orders": df["n"].fillna(0).astype("int64"),
            "total_spend": df["s"].fillna(0.0).round(2),
        }),
        batch_format="pandas",
    )


_ORDER_STATUSES = ["F", "O", "P"]


def orders_status_pivot(sf_dir: str):
    """Long→wide pivot (stages/pivot.pivot_table): revenue per
    (priority, status) as one wide row per priority — one wide partial row
    per (priority, batch) crosses the exchange."""
    from ..stages.pivot import pivot_table

    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return pivot_table(
        ds, ["o_orderpriority"], "o_orderstatus", "o_totalprice",
        agg="sum", categories=_ORDER_STATUSES, col_prefix="rev_",
    )


def value_quantiles_disc(sf_dir: str):
    """PERCENTILE_DISC analog: smallest actual value covering each rank
    (stages/quantiles.grouped_quantiles_disc; bit-matches DuckDB
    quantile_disc)."""
    from ..stages.quantiles import grouped_quantiles_disc

    ds = _pq(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_disc(ds, "event_type", "value", [0.25, 0.5, 0.9])


_PROFILE_COLS = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


def value_histogram(sf_dir: str):
    """Per-event-type equi-width value histogram (stages/quantiles.
    fixed_histogram): integer bincount partials, exactly mergeable."""
    from ..stages.quantiles import fixed_histogram

    ds = _pq(sf_dir, "events", ["event_type", "value"])
    return fixed_histogram(ds, "value", 0.0, 500.0, 20, by="event_type")


def orders_profile(sf_dir: str):
    """Ingest-time data-quality profile (stages/textstats.profile_table):
    per-column rows / nulls / distincts / min / max in one pass."""
    from ..stages.textstats import profile_table

    ds = _pq(sf_dir, "orders", _PROFILE_COLS)
    return profile_table(ds, _PROFILE_COLS)


def event_customer_coverage(sf_dir: str):
    """FULL OUTER hash join (shuffle tier — a map-side full outer would
    re-emit unmatched right rows per batch): which event users have a
    customer record and which customers never produced an event."""
    events = _pq(sf_dir, "events", ["event_id", "user_id"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "user_id"}),
        batch_format="pandas",
    )
    j = hash_join(events, cust, on="user_id", how="outer")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        side = np.where(
            df["event_id"].notna() & df["c_mktsegment"].notna(), "both",
            np.where(df["event_id"].notna(), "event_only", "customer_only"),
        )
        return pd.DataFrame({"side": side}).groupby("side", as_index=False).agg(
            n=("side", "size")
        )

    return _grouped_final(
        j.map_batches(classify, batch_format="pandas"),
        ["side"], {"n": ("n", "sum")},
        post=lambda df: df.assign(n=df["n"].astype("int64")),
        num_partitions=2,
    )


def lineitem_price_corr(sf_dir: str):
    """Per-returnflag Pearson corr + OLS slope of quantity vs extended
    price, from six sufficient statistics per (group, batch)
    (stages/textstats.grouped_corr) — checked against DuckDB CORR /
    REGR_SLOPE."""
    from ..stages.textstats import grouped_corr

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")


def revenue_cube(sf_dir: str):
    """One-pass GROUP BY CUBE (stages/windows.cube_aggregate): all 2^k
    grouping subsets from the same per-batch finest partials."""
    from ..stages.windows import cube_aggregate

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])
    with_rev = ds.map_batches(
        lambda df: pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "rev": df["l_extendedprice"] * (1 - df["l_discount"]),
        }),
        batch_format="pandas",
    )
    return cube_aggregate(
        with_rev, ["l_returnflag", "l_linestatus"], "rev",
        sum_col="revenue", count_col="n_lines",
    )


def order_price_quartiles(sf_dir: str):
    """NTILE(4) per order priority (stages/windows.grouped_ntile),
    aggregated per (priority, tile) so the SQL window oracle checks every
    tile boundary exactly."""
    from ..stages.windows import grouped_ntile

    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    tiled = grouped_ntile(ds, ["o_orderpriority"], "o_totalprice", 4,
                          tiebreak=["o_orderkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "tile"], as_index=False).agg(
            n=("o_totalprice", "size"), s=("o_totalprice", "sum")
        )

    return _grouped_final(
        tiled.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority", "tile"],
        {"n": ("n", "sum"), "sum_price": ("s", "sum")},
        post=lambda df: df.assign(n=df["n"].astype("int64"),
                                  sum_price=df["sum_price"].round(2)),
        num_partitions=4,
    )


def region_customer_rollup(sf_dir: str):
    """Three-way dimension join (region ⋈ nation ⋈ customer) with both tiny
    dims broadcast — the star-schema lookup shape."""
    nation = collect_broadcast_df(
        _pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
        ["n_nationkey", "n_regionkey"],
    )
    region = collect_broadcast_df(
        _pq(sf_dir, "region", ["r_regionkey", "r_name"]),
        ["r_regionkey", "r_name"],
    )
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, r2name))
    ds = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n2r_, r2name_ = ray.get(ref)
        rname = df["c_nationkey"].map(n2r_).map(r2name_)
        return (
            df.assign(r_name=rname)
            .groupby("r_name", as_index=False)
            .agg(n=("c_acctbal", "size"), s=("c_acctbal", "sum"))
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["r_name"],
        {"customers": ("n", "sum"), "total_acctbal": ("s", "sum")},
        post=lambda df: df.assign(
            customers=df["customers"].astype("int64"),
            total_acctbal=df["total_acctbal"].round(2),
        ),
        num_partitions=4,
    )


def supplier_nation_stats(sf_dir: str):
    nation = collect_broadcast_df(
        _pq(sf_dir, "nation", ["n_nationkey", "n_name"]),
        ["n_nationkey", "n_name"],
    )
    ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))
    ds = _pq(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(ref)
        return (
            df.assign(n_name=df["s_nationkey"].map(nm))
            .groupby("n_name", as_index=False)
            .agg(n=("s_acctbal", "size"), s=("s_acctbal", "sum"))
        )

    return _grouped_final(
        ds.map_batches(partial, batch_format="pandas"),
        ["n_name"],
        {"suppliers": ("n", "sum"), "s_total": ("s", "sum")},
        post=lambda df: df.assign(
            suppliers=df["suppliers"].astype("int64"), s_total=df["s_total"].round(2)
        ),
        num_partitions=4,
    )


# ---------------------------------------------------------- set ops / union

def union_sources(sf_dir: str):
    """W4 analog: heterogeneous tables unioned on a common schema with a
    source discriminator."""
    docs = _pq(sf_dir, "documents", ["lang"])
    events = _pq(sf_dir, "events", ["event_type"])
    d = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": ["doc"] * t.num_rows, "key": t["lang"]}
        ),
        batch_format="pyarrow",
    )
    e = events.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": ["event"] * t.num_rows, "key": t["event_type"]}
        ),
        batch_format="pyarrow",
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": [g["src"].iloc[0]],
            "key": [g["key"].iloc[0]],
            "n": [np.int64(len(g))],
        })

    return d.union(e).groupby(["src", "key"]).map_groups(per_key, batch_format="pandas")


# ------------------------------------------------- documents training-data ops

def exact_dedup_docs(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, "doc_id", "text")


def token_stats_by_lang(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.assign(tok=token_counts(df["text"]))
            .groupby("lang", as_index=False)
            .agg(s=("tok", "sum"), n=("tok", "size"))
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "total_tokens": [np.int64(g["s"].sum())],
            "n_docs": [np.int64(g["n"].sum())],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def doc_fingerprints(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"], "fp": fingerprint_md5(df["text"])}),
        batch_format="pandas",
    )


def chars_by_lang_source(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "source": [g["source"].iloc[0]],
            "n_docs": [np.int64(n)],
            "avg_chars": [round(float(g["s"].sum()) / n, 4)],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .map_groups(final, batch_format="pandas")
    )


# -------------------------------------------------------------- similarity

def _query_vec(sf_dir: str) -> np.ndarray:
    """Deterministic query vector: the embedding of vec_id == 0."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    import pyarrow.compute as pc

    row = t.filter(pc.equal(t["vec_id"], 0))
    return np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)


def knn_topk_whitelist(sf_dir: str):
    """Q1-shaped search with whitelist semi-join (J4): top-5 cosine among
    labels {1,3,5} only."""
    q = _query_vec(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.not_equal(t["vec_id"], 0),
                pc.is_in(t["label"], pa.array([1, 3, 5], pa.int32())),
            )
        ),
        batch_format="pyarrow",
    )
    top = brute_force_topk(ds, q, 5, id_col="vec_id", extra_cols=("label",))
    return top.map_batches(lambda df: df[["vec_id", "label"]], batch_format="pandas")


def knn_topk_cosine(sf_dir: str):
    q = _query_vec(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    import pyarrow.compute as pc

    ds = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow"
    )
    top = brute_force_topk(ds, q, 10, id_col="vec_id", extra_cols=("label",))
    return top.map_batches(
        lambda df: df[["vec_id", "label"]], batch_format="pandas"
    )


SQL: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY 1, 2
    """,
    "topk_orders": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "customer_min_order": """
        SELECT o_custkey, ROUND(MIN(o_totalprice), 2) AS min_totalprice
        FROM orders GROUP BY 1
    """,
    "hourly_events": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "event_user_stats": """
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
        FROM events GROUP BY 1
    """,
    "json_props_sum": """
        SELECT event_type,
               CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY 1
    """,
    "mktsegment_revenue": """
        SELECT c_mktsegment, COUNT(*) AS order_count,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1
    """,
    "large_part_lineitems": """
        SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        GROUP BY 1
    """,
    "idle_customers": """
        SELECT c_mktsegment, COUNT(*) AS idle_customers
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
    "orders_lineitem_join": """
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1
    """,
    "asof_events_orders": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(o.best_price), 2) AS matched_total
        FROM events e ASOF JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        GROUP BY 1
    """,
    # same answers as the auto-tier queries — these force the partitioned
    # shuffle tier so BOTH join strategies stay oracle-checked
    "orders_lineitem_join_shuffle": """
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1
    """,
    "asof_events_orders_shuffle": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(o.best_price), 2) AS matched_total
        FROM events e ASOF JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        GROUP BY 1
    """,
    "user_event_type_sets": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
               COUNT(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id
    """,
    "urgent_lineitem_revenue_bloom": """
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    """,
    "region_customer_rollup": """
        SELECT r_name, COUNT(*) AS customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "supplier_nation_stats": """
        SELECT n_name, COUNT(*) AS suppliers, ROUND(SUM(s_acctbal), 2) AS s_total
        FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1
    """,
    "top_orders_per_priority": """
        SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "customer_running_spend": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING), 2) AS running_spend
        FROM orders
    """,
    "revenue_rollup": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "followup_orders": """
        SELECT w.o_orderpriority AS w_priority, COUNT(*) AS n,
               ROUND(SUM(p.o_totalprice), 2) AS followup_total
        FROM orders p JOIN orders w
          ON p.o_custkey = w.o_custkey
         AND p.o_orderdate >= w.o_orderdate
         AND p.o_orderdate < w.o_orderdate + INTERVAL 90 DAY
         AND p.o_orderkey <> w.o_orderkey
        GROUP BY 1
    """,
    "followup_orders_shuffle": """
        SELECT w.o_orderpriority AS w_priority, COUNT(*) AS n,
               ROUND(SUM(p.o_totalprice), 2) AS followup_total
        FROM orders p JOIN orders w
          ON p.o_custkey = w.o_custkey
         AND p.o_orderdate >= w.o_orderdate
         AND p.o_orderdate < w.o_orderdate + INTERVAL 90 DAY
         AND p.o_orderkey <> w.o_orderkey
        GROUP BY 1
    """,
    "event_customer_coverage": """
        SELECT CASE WHEN e.event_id IS NOT NULL AND c.c_mktsegment IS NOT NULL
                    THEN 'both'
                    WHEN e.event_id IS NOT NULL THEN 'event_only'
                    ELSE 'customer_only' END AS side,
               COUNT(*) AS n
        FROM events e FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
    "revenue_cube": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "order_price_quartiles": """
        WITH t AS (
            SELECT o_orderpriority, o_totalprice,
                   NTILE(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders
        )
        SELECT o_orderpriority, CAST(tile AS BIGINT) AS tile, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM t GROUP BY 1, 2
    """,
    "label_centroids": """
        SELECT label, i AS dim, ROUND(AVG(embedding[i + 1]), 6) AS avg_v
        FROM embeddings, range(64) t(i)
        GROUP BY 1, 2
    """,
    "customer_order_counts": """
        SELECT c_custkey, c_mktsegment,
               CAST(COUNT(o_custkey) AS BIGINT) AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2
    """,
    "event_sessions": """
        WITH d AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               CAST(SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM d
    """,
    "session_stats_q": """
        WITH d AS (
            SELECT user_id,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events)
        SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM d GROUP BY 1
    """,
    "sliding_event_counts": """
        SELECT strftime(date_trunc('hour', ts) - i * INTERVAL 60 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type AS key, COUNT(*) AS n
        FROM events, range(2) t(i)
        GROUP BY 1, 2
    """,
    "union_sources": """
        SELECT 'doc' AS src, lang AS key, COUNT(*) AS n FROM documents GROUP BY 2
        UNION ALL
        SELECT 'event' AS src, event_type AS key, COUNT(*) AS n FROM events GROUP BY 2
    """,
    "exact_dedup_docs": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY text
    """,
    # split class = textstats._PY_WS_SQL (Python-\s-equivalent, not RE2's
    # ASCII-only \s) so the oracle tokenizes exactly like token_counts()
    "token_stats_by_lang": r"""
        SELECT lang,
               CAST(SUM(len(list_filter(regexp_split_to_array(text, '[\t\n\x0b\f\r\x1c-\x1f\x85\p{Z}]+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "doc_fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
    "chars_by_lang_source": """
        SELECT lang, source, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents GROUP BY 1, 2
    """,
    "knn_topk_cosine": """
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
        LIMIT 10
    """,
    "knn_topk_whitelist": """
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label
        FROM embeddings e, q
        WHERE e.vec_id <> 0 AND e.label IN (1, 3, 5)
        ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
        LIMIT 5
    """,
}

QUERIES = {
    "knn_topk_whitelist": knn_topk_whitelist,
    "pricing_summary": pricing_summary,
    "topk_orders": topk_orders,
    "customer_min_order": customer_min_order,
    "hourly_events": hourly_events,
    "event_user_stats": event_user_stats,
    "json_props_sum": json_props_sum,
    "mktsegment_revenue": mktsegment_revenue,
    "large_part_lineitems": large_part_lineitems,
    "idle_customers": idle_customers,
    "orders_lineitem_join": orders_lineitem_join,
    "orders_lineitem_join_shuffle": lambda sf: orders_lineitem_join(sf, strategy="shuffle"),
    "urgent_lineitem_revenue_bloom": urgent_lineitem_revenue,
    "distinct_users_by_type": distinct_users_by_type,
    "user_event_type_sets": user_event_type_sets,
    "top_users_by_type": top_users_by_type,
    "curated_corpus_stats": curated_corpus_stats_query,
    "asof_events_orders": asof_events_orders,
    "asof_events_orders_shuffle": lambda sf: asof_events_orders(sf, strategy="shuffle"),
    "union_sources": union_sources,
    "session_stats_q": session_stats_q,
    "sliding_event_counts": sliding_event_counts,
    "top_orders_per_priority": top_orders_per_priority,
    "customer_running_spend": customer_running_spend,
    "revenue_rollup": revenue_rollup,
    "followup_orders": followup_orders,
    "followup_orders_shuffle": lambda sf: followup_orders(sf, strategy="shuffle"),
    "orders_status_pivot": orders_status_pivot,
    "value_quantiles_disc": value_quantiles_disc,
    "event_sessions": event_sessions,
    "boilerplate_by_source": boilerplate_by_source,
    "label_centroids": label_centroids_q,
    "customer_order_counts": customer_order_counts,
    "revenue_cube": revenue_cube,
    "order_price_quartiles": order_price_quartiles,
    "lineitem_price_corr": lineitem_price_corr,
    "event_customer_coverage": event_customer_coverage,
    "orders_profile": orders_profile,
    "value_histogram": value_histogram,
    "region_customer_rollup": region_customer_rollup,
    "supplier_nation_stats": supplier_nation_stats,
    "exact_dedup_docs": exact_dedup_docs,
    "token_stats_by_lang": token_stats_by_lang,
    "doc_fingerprints": doc_fingerprints,
    "chars_by_lang_source": chars_by_lang_source,
    "knn_topk_cosine": knn_topk_cosine,
}
