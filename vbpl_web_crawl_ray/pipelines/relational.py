"""Relational / analytical conformance queries (driver contract, FIXTURES.md F8).

Each function maps one operator family from SURVEY.md §2 onto the driver's
TPC-H-ish parquet tables and has a DuckDB oracle twin in ``ORACLE_SQL``.
All are Ray-Data-first: pruned-column parquet reads, vectorized
``map_batches`` bodies, partial (combiner) aggregation before every
``groupby`` shuffle, broadcast small sides instead of shuffle joins.

Column names of every computed column match the oracle SQL exactly; float
aggregates are rounded to 4 decimals on both sides so value-hash comparison
is stable across summation orders.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.numeric import round_half_away
from ..stages.shuffle import bucketed_group_apply
from ..sources.tablecache import base_dataset, base_pandas

_NUM_BUCKETS = None  # resolved per-call from the cluster (shuffle.resolve_num_buckets)


def _join_partitions() -> int:
    """Hash-join partition count sized to the session: measured locally,
    aggregator-actor count beyond ~cpus/4 inverts scaling (16 partitions was
    6x slower than 8 on 32 CPUs). On a real cluster this would be
    ~2x total cores."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(8, cpus // 4))


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Pruned-column base-table read, decode shared across the suite
    (sources/tablecache); with the cache off, only requested columns
    leave storage."""
    return base_dataset(sf_dir, table, columns=columns)


def _round4(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = round_half_away(df[c].to_numpy(), 4)
    return df


# ---------------------------------------------------------------------------
# A-family: aggregations (SURVEY.md §2.5) — partial-aggregate combiner pattern
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """Grouped numeric rollup (pattern of A7's per-key merges at scale).

    Pre-aggregates inside map_batches (one row per key per batch), then a
    small groupby — the shuffle moves O(keys x batches) rows, not O(rows).
    """
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        df = df.assign(
            disc_price=df["l_extendedprice"] * (1 - df["l_discount"]),
            charge=df["l_extendedprice"] * (1 - df["l_discount"]) * (1 + df["l_tax"]),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    out = (ds.map_batches(partial, batch_format="pandas")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("sum_base_price", alias_name="sum_base_price"),
                        Sum("sum_disc_price", alias_name="sum_disc_price"),
                        Sum("sum_charge", alias_name="sum_charge"),
                        Sum("count_order", alias_name="count_order"))
             .to_pandas())
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_price"] = out["sum_base_price"] / out["count_order"]
    return _round4(out, ["sum_qty", "sum_base_price", "sum_disc_price",
                         "sum_charge", "avg_qty", "avg_price"])


def q_count_per_source(sf_dir: str):
    """A1/A3-style counts: docs + chars per source."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby("source")
              .aggregate(Sum("n_docs", alias_name="n_docs"),
                         Sum("total_chars", alias_name="total_chars")))


def q_tumbling_window(sf_dir: str):
    """Streaming-shaped tumbling 1h window aggregate (SURVEY.md §2.8):
    events as an ordered log, window = floor(epoch/3600)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        win = (df["ts"].astype("datetime64[s]").astype("int64") // 3600).astype("int64")
        df = df.assign(window_id=win)
        return df.groupby(["user_id", "window_id"], as_index=False).agg(
            sum_value=("value", "sum"), n_events=("value", "size"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["user_id", "window_id"], as_index=False).agg(
            sum_value=("sum_value", "sum"), n_events=("n_events", "sum"))
        return _round4(out, ["sum_value"])

    return bucketed_group_apply(ds, "user_id", final,
                                num_buckets=_NUM_BUCKETS, partial_fn=partial)


# ---------------------------------------------------------------------------
# O-family: sort / limit / top-k (SURVEY.md §2.6)
# ---------------------------------------------------------------------------

def q_filter_sort_limit(sf_dir: str):
    """O1: filter -> global sort desc -> limit k (reference preview query,
    app/service/vbpl.py:1145-1147). The predicate pushes down to the
    parquet read (row-group pruning); tie-broken by key for determinism."""
    import pyarrow.compute as pc
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        filter=pc.field("o_orderstatus") == "O")
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_latest_event_per_user(sf_dir: str):
    """A6/O2: per-key argmax by (ts, event_id) — the engine form of the
    reference's order_by(updated_at.desc()).first() latest-version pick
    (app/service/vbpl.py:1091)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch winner per key — shrinks the shuffle to keys x batches
        return (df.sort_values(["ts", "event_id"])
                  .groupby("user_id", as_index=False).tail(1))

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values(["ts", "event_id"])
                .groupby("user_id", as_index=False).tail(1))
        return top[["user_id", "ts", "event_type", "value"]]

    return bucketed_group_apply(ds, "user_id", latest,
                                num_buckets=_NUM_BUCKETS, partial_fn=combiner)


def q_lww_upsert(sf_dir: str):
    """A7: last-write-wins per composite key (user_id, event_type) — the
    upsert-merge semantics of push_vbpl_to_db (app/service/vbpl.py:186-252)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # combiner: keep only the per-batch winner per key before the shuffle
        df = df.sort_values(["ts", "event_id"])
        return df.groupby(["user_id", "event_type"], as_index=False).tail(1)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values(["ts", "event_id"])
                .groupby(["user_id", "event_type"], as_index=False).tail(1))
        return pd.DataFrame({"user_id": top["user_id"].to_numpy(),
                             "event_type": top["event_type"].to_numpy(),
                             "last_value": top["value"].to_numpy()})

    return bucketed_group_apply(ds, "user_id", final,
                                num_buckets=_NUM_BUCKETS, partial_fn=partial)


def q_topk_per_group(sf_dir: str):
    """Top-2 orders per customer by price — per-group top-k via map_groups."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True])
                 .groupby("o_custkey", as_index=False).head(2))

    # top2 is also a valid per-batch combiner (top-k is mergeable)
    return bucketed_group_apply(ds, "o_custkey", top2,
                                num_buckets=_NUM_BUCKETS, partial_fn=top2)


# ---------------------------------------------------------------------------
# J-family: joins / lookups (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def q_join_revenue_by_priority(sf_dir: str):
    """J2: large-large hash join lineitem x orders, then grouped rollup.

    Stays on the native actor-pool hash join: measured against the
    bucketed-shuffle join at sf0.1 the native operator wins on this
    shape (2.4 s vs 5.4 s — two large sides, one wide output, no
    multi-stage pipeline to amortize), while the bucketed join wins
    inside the many-stage dedup verifies. Keep both tools; pick by
    measurement."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))

    out = (joined.map_batches(partial, batch_format="pandas")
                 .groupby("o_orderpriority")
                 .aggregate(Sum("revenue", alias_name="revenue"),
                            Sum("n_items", alias_name="n_items"))
                 .to_pandas())
    return _round4(out, ["revenue"])


def q_broadcast_dim_join(sf_dir: str):
    """Broadcast map-join: customer x nation x region with the dims shipped
    once via ray.put — no shuffle (the J3 lookup-join pattern)."""
    nation = base_pandas(sf_dir, "nation")
    region = base_pandas(sf_dir, "region")
    nk_to_rname = dict(zip(
        nation["n_nationkey"],
        nation["n_regionkey"].map(dict(zip(region["r_regionkey"], region["r_name"])))))
    ref = ray.put(nk_to_rname)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class BroadcastJoin:
        def __init__(self):
            self.lookup = ray.get(ref)  # fetched once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.assign(r_name=df["c_nationkey"].map(self.lookup))
            return df.groupby("r_name", as_index=False).agg(
                n_customers=("c_acctbal", "size"), total_acctbal=("c_acctbal", "sum"))

    out = (cust.map_batches(BroadcastJoin, batch_format="pandas", concurrency=(1, 2))
               .groupby("r_name")
               .aggregate(Sum("n_customers", alias_name="n_customers"),
                          Sum("total_acctbal", alias_name="total_acctbal"))
               .to_pandas())
    return _round4(out, ["total_acctbal"])


def q_anti_join(sf_dir: str):
    """J1 insert-branch: left-anti join via broadcast key set — customers
    with no 'P'-status order (the engine form of the PK-miss probe)."""
    o = base_pandas(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    keys = set(o.loc[o["o_orderstatus"] == "P", "o_custkey"].unique().tolist())
    ref = ray.put(keys)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        seen = ray.get(ref)
        return df[~df["c_custkey"].isin(seen)]

    return cust.map_batches(anti, batch_format="pandas")


def q_semi_join(sf_dir: str):
    """J1 update-branch: semi join via broadcast key set — parts that appear
    in lineitem."""
    keys = set(base_pandas(sf_dir, "lineitem", columns=["l_partkey"])["l_partkey"].unique().tolist())
    ref = ray.put(keys)
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        seen = ray.get(ref)
        return df[df["p_partkey"].isin(seen)]

    return part.map_batches(semi, batch_format="pandas")


def q_string_agg_per_nation(sf_dir: str):
    """A5: per-group ordered string concat (' - ' join of sectors,
    app/service/vbpl.py:1253) — customers per nation."""
    nation = base_pandas(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    lookup = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_name"])

    def add_nation(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(n_name=df["c_nationkey"].map(ray.get(lookup)))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = " - ".join(sorted(g["c_name"]))
        return pd.DataFrame({"n_name": [g["n_name"].iloc[0]],
                             "customers": [names], "n": [len(g)]})

    return (cust.map_batches(add_nation, batch_format="pandas")
                .groupby("n_name").map_groups(agg, batch_format="pandas"))


# ---------------------------------------------------------------------------
# M-family: projections / extraction (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

def q_props_extract(sf_dir: str):
    """M15-style vectorized regex extraction from a semi-structured column
    ('(?<=ItemID=)\\d+' analogue, app/service/vbpl.py:140) + rollup."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k": (\d+)', expand=False).astype("int64")
        df = df.assign(k=k)
        return df.groupby("event_type", as_index=False).agg(
            sum_k=("k", "sum"), n=("k", "size"))

    out = (ds.map_batches(partial, batch_format="pandas")
             .groupby("event_type")
             .aggregate(Sum("sum_k", alias_name="sum_k"),
                        Sum("n", alias_name="n"))
             .to_pandas())
    out["avg_k"] = round_half_away((out["sum_k"] / out["n"]).to_numpy(), 4)
    return out[["event_type", "avg_k", "n"]]


def q_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the stateful
    streaming-shaped operator (SURVEY.md §2.8) as sort-within-group."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across the whole bucket: session breaks computed over
        # user-sorted rows with a per-user reset — no per-user Python loop
        g = g.sort_values(["user_id", "ts", "event_id"])
        same_user = g["user_id"].eq(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        new_sess = (~same_user) | gap
        sess_raw = new_sess.cumsum()
        g = g.assign(session_id=(sess_raw - sess_raw.groupby(g["user_id"])
                                 .transform("min") + 1).astype("int64"))
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"),
            session_start=("ts", "min"))
        out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 4)
        return out

    return bucketed_group_apply(ds, "user_id", sessions_bucket,
                                num_buckets=_NUM_BUCKETS)
