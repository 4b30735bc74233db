"""Generic relational operators over the driver testdata tables.

These exercise the engine's relational surface — scan with column pruning,
vectorized map_batches, partial pre-aggregation before groupby, hash joins,
sort/limit top-k, distinct, union, windowed per-key aggregation — each with
a DuckDB-equivalent oracle (see __ray_entry__.oracle_sql). Column names are
chosen to match the oracle SQL exactly (the driver hashes values under
sorted column names).

Scale notes: every groupby here pre-aggregates inside map_batches first
(emit one partial row per key per batch) so the shuffle moves keys, not
rows; joins broadcast the small dimension side via ray.put.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum
from .reports import bucketed_agg


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")




# ------------------------------------------------------------------ Q1-like

def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/averages/count.
    Partial aggregation per batch → tiny final groupby."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # exact integer-cents arithmetic: money columns are 2dp-exact, so
        # summing int64 cents makes the distributed sum ORDER-INDEPENDENT
        # and bit-identical to DuckDB's sequential sum (float accumulation
        # order diverges ~1e-4 at sf0.1 magnitudes and leaks through 4dp
        # rounding)
        df = batch.to_pandas()
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc_pct = (df["l_discount"] * 100).round().astype("int64")
        df["ext_cents"] = cents
        df["disc_units"] = cents * (100 - disc_pct)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            ext_cents=("ext_cents", "sum"),
            disc_units=("disc_units", "sum"),
            count_order=("l_quantity", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("ext_cents", alias_name="ext_cents"),
                      Sum("disc_units", alias_name="disc_units"),
                      Sum("count_order", alias_name="count_order"))
           .to_pandas())
    out["sum_base_price"] = out["ext_cents"] / 100.0
    out["sum_disc_price"] = out["disc_units"] / 10000.0
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        out[c] = out[c].round(4)
    return out[["l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price", "sum_disc_price", "count_order",
                "avg_qty"]] \
        .sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                          AS sum_qty,
       round(sum(round(l_extendedprice * 100)::BIGINT) / 100.0, 4)
                                                          AS sum_base_price,
       round(sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) / 10000.0, 4)
                                                          AS sum_disc_price,
       count(*)                                           AS count_order,
       round(sum(l_quantity) / count(*), 4)               AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------- join + top-k

def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """orders ⋈ customer (broadcast dimension) → total per customer →
    top-k by spend."""
    cust = pd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_mktsegment"])
    cust_ref = ray.put(cust.set_index("c_custkey"))
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            total_spent=("o_totalprice", "sum"),
            order_count=("o_totalprice", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = bucketed_agg(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", {"total_spent": ("total_spent", "sum"),
                      "order_count": ("order_count", "sum")}).to_pandas()
    cdf = ray.get(cust_ref)
    totals = totals.join(cdf, on="o_custkey")
    totals["total_spent"] = totals["total_spent"].round(4)
    out = totals.sort_values(["total_spent", "o_custkey"],
                             ascending=[False, True]).head(k)
    return out[["o_custkey", "c_name", "c_mktsegment", "total_spent",
                "order_count"]].reset_index(drop=True)


TOP_CUSTOMERS_SQL = """
SELECT o_custkey, c_name, c_mktsegment,
       round(sum(o_totalprice), 4) AS total_spent,
       count(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name, c_mktsegment
ORDER BY total_spent DESC, o_custkey LIMIT 10
"""


def region_customer_counts(sf_dir: str) -> pd.DataFrame:
    """3-way dimension join region ⋈ nation ⋈ customer, counts + balance."""
    region = pd.read_parquet(_t(sf_dir, "region"))
    nation = pd.read_parquet(_t(sf_dir, "nation"))
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    dim_ref = ray.put(dim.set_index("n_nationkey")[["r_name"]])
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_nationkey", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        d = ray.get(dim_ref)
        df = df.join(d, on="c_nationkey")
        g = df.groupby("r_name", as_index=False).agg(
            customers=("c_acctbal", "size"),
            total_balance=("c_acctbal", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (cust.map_batches(partial, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Sum("customers", alias_name="customers"),
                      Sum("total_balance", alias_name="total_balance"))
           .to_pandas())
    out["total_balance"] = out["total_balance"].round(4)
    return out.sort_values("r_name").reset_index(drop=True)


REGION_CUSTOMER_SQL = """
SELECT r_name, count(*) AS customers,
       round(sum(c_acctbal), 4) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def order_priority_counts(sf_dir: str) -> pd.DataFrame:
    out = (rd.read_parquet(_t(sf_dir, "orders"),
                           columns=["o_orderpriority"])
           .groupby("o_orderpriority").count().to_pandas())
    out = out.rename(columns={"count()": "order_count"})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- events

def events_daily(sf_dir: str) -> pd.DataFrame:
    """Tumbling daily window per event_type: count + value sum."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("value", "size"), value_sum=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        {"n_events": ("n_events", "sum"),
         "value_sum": ("value_sum", "sum")},
        bucket_on="day").to_pandas()
    out["value_sum"] = out["value_sum"].round(4)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


EVENTS_DAILY_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n_events, round(sum(value), 4) AS value_sum
FROM events GROUP BY event_type, day ORDER BY event_type, day
"""


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows per user (gap > 30 min starts a new session):
    sessions count + max session length per user.

    Users flow through a hash-bucketed shuffle (``bucketed_groups``) and
    each bucket is ONE vectorized pandas pass over all its users — sort
    by (user, ts), session starts at user boundaries or >gap gaps, then
    two groupbys (session sizes, per-user aggregates). A per-key
    map_groups costs one pandas invocation per user and collapses at
    web-scale key cardinality (this module's rolling_7d docstring shows
    the measurement)."""
    from .reports import bucketed_groups

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        gaps = df["ts"].diff().dt.total_seconds()
        new_user = df["user_id"].ne(df["user_id"].shift())
        sid = (new_user | (gaps > gap_minutes * 60)).cumsum()
        sess = pd.DataFrame({
            "user_id": df["user_id"].groupby(sid).first(),
            "size": df.groupby(sid).size()})
        out = sess.groupby("user_id")["size"] \
            .agg(n_sessions="size", max_session_events="max",
                 n_events="sum").reset_index()
        for c in ("user_id", "n_sessions", "max_session_events",
                  "n_events"):
            out[c] = out[c].astype("int64")
        return out

    out = bucketed_groups(ds, "user_id", per_bucket).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessioned AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       max(cnt) AS max_session_events,
       sum(cnt)::BIGINT AS n_events
FROM (SELECT user_id, session_id, count(*) AS cnt
      FROM sessioned GROUP BY user_id, session_id)
GROUP BY user_id ORDER BY user_id
"""


def top_users_by_value(sf_dir: str, k: int = 20) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            total_value=("value", "sum"), n_events=("value", "size"))

    out = bucketed_agg(ds.map_batches(partial, batch_format="pandas"),
                       "user_id",
                       {"total_value": ("total_value", "sum"),
                        "n_events": ("n_events", "sum")}).to_pandas()
    out["total_value"] = out["total_value"].round(4)
    return (out.sort_values(["total_value", "user_id"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


TOP_USERS_SQL = """
SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 20
"""


# ----------------------------------------------------- sort/distinct/union

def lineitem_top100(sf_dir: str) -> pd.DataFrame:
    """Global top-k via sort+limit (distributed sort exercising the
    range-partition shuffle)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = ds.sort(["l_extendedprice", "l_orderkey", "l_linenumber"],
                  descending=[True, False, False]).limit(100).to_pandas()
    out["l_extendedprice"] = out["l_extendedprice"].round(4)
    return out.reset_index(drop=True)


LINEITEM_TOP100_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
"""


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


DISTINCT_SEGMENTS_SQL = ("SELECT DISTINCT c_mktsegment FROM customer "
                         "ORDER BY c_mktsegment")


def nationkeys_union(sf_dir: str) -> pd.DataFrame:
    """Union of customer and supplier nation keys (set-op surface)."""
    c = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"nationkey": pc.cast(b.column("c_nationkey"), pa.int32())}),
            batch_format="pyarrow")
    s = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey"]) \
        .map_batches(lambda b: pa.table(
            {"nationkey": pc.cast(b.column("s_nationkey"), pa.int32())}),
            batch_format="pyarrow")
    vals = sorted(c.union(s).unique("nationkey"))
    return pd.DataFrame({"nationkey": pd.array(vals, dtype="int32")})


NATIONKEYS_UNION_SQL = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier)
ORDER BY nationkey
"""


def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_brand", "p_retailprice", "p_size"])
    out = (ds.groupby("p_brand")
           .aggregate(Count(alias_name="n_parts"),
                      Mean("p_retailprice", alias_name="avg_price"),
                      Max("p_size", alias_name="max_size"))
           .to_pandas())
    out["avg_price"] = out["avg_price"].round(4)
    return out.sort_values("p_brand").reset_index(drop=True)


PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price,
       max(p_size) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def events_asof_prev(sf_dir: str) -> pd.DataFrame:
    """As-of join shape: each event joined to the same user's most recent
    PRIOR event (value + gap). groupby(key).map_groups with an in-group
    sort + shift — the partitioned merge_asof pattern for time-ordered
    joins (sort both sides within key buckets, pandas asof/shift inside)."""
    import numpy as np

    from .reports import bucketed_groups

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over every user in the bucket: sort by
        # (user, ts, event_id), shift(1), then null the first row of
        # each user — identical to a per-user shift without the
        # one-pandas-call-per-key collapse at web-scale cardinality
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        first = df["user_id"].ne(df["user_id"].shift()).to_numpy()
        pv = df["value"].shift(1).to_numpy(dtype="float64", copy=True)
        pv[first] = np.nan
        # Exact ns-int diff / 1e9 in float64 — bitwise-identical to the
        # DuckDB oracle's (epoch_ns(a)-epoch_ns(b))/1000000000.0, no
        # rounding-mode ambiguity (half-even vs half-away at 3 dp).
        tns = df["ts"].astype("datetime64[ns]").astype("int64")
        gap = (tns.diff() / 1_000_000_000.0).to_numpy(copy=True)
        gap[first] = np.nan
        df["prev_value"] = np.round(pv, 4)
        df["gap_seconds"] = gap
        df["value"] = df["value"].round(4)
        return df[["event_id", "user_id", "ts", "value", "prev_value",
                   "gap_seconds"]]

    out = bucketed_groups(ds, "user_id", per_bucket).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_ASOF_SQL = """
SELECT event_id, user_id, ts, round(value, 4) AS value,
       round(lag(value) OVER w, 4) AS prev_value,
       (epoch_ns(ts) - epoch_ns(lag(ts) OVER w)) / 1000000000.0 AS gap_seconds
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def events_rolling_7d(sf_dir: str) -> pd.DataFrame:
    """Per-event trailing 7-day window aggregate per user (the streaming
    windowed-aggregate operator class): rolling sum of value + event count
    over [ts − 7d, ts].

    RANGE-frame semantics (all peers with equal ts included, exactly like
    the SQL window) via searchsorted bounds over per-user sorted int64-ns
    timestamps and integer ten-thousandths prefix sums — order-independent
    and bit-identical to DuckDB at any scale. Users are processed through
    a hash-bucketed shuffle (the per-key map_groups shape collapses at
    web-scale user cardinality).
    """
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "value"])
    week_ns = 7 * 24 * 3600 * 10**9

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
        tns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        v4 = np.round(df["value"].to_numpy() * 10000).astype("int64")
        prefix = np.concatenate(([0], np.cumsum(v4)))
        hi = np.searchsorted(tns, tns, side="right")
        lo = np.searchsorted(tns, tns - week_ns, side="left")
        df["rolling_value_7d"] = (prefix[hi] - prefix[lo]) / 10000.0
        df["rolling_events_7d"] = (hi - lo).astype("int64")
        return df[["event_id", "user_id", "ts", "rolling_value_7d",
                   "rolling_events_7d"]]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [per_user(g) for _, g in df.groupby("user_id", sort=False)]
        return pd.concat(outs, ignore_index=True)

    from .reports import bucketed_groups

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        import numpy as _np
        bk = ((u * _np.int64(2654435761)) % 16).astype("int32")
        return batch.append_column("__bucket", pa.array(bk))

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__bucket")
           .map_groups(lambda df: per_bucket(df.drop(columns="__bucket")),
                       batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_ROLLING_SQL = """
SELECT event_id, user_id, ts,
       (sum(round(value * 10000)::BIGINT) OVER w)::BIGINT / 10000.0
         AS rolling_value_7d,
       count(*) OVER w AS rolling_events_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ----------------------------------------------------- per-key top-N

def top_orders_per_customer(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Top-``n`` orders by value per customer — the per-key top-N shuffle
    pattern: each batch reduces itself to at most n rows per key it has
    seen (a per-batch partial top-N combiner, so the shuffle ships
    ≤ n·keys-per-block rows, not all rows), then one vectorized
    rank-and-trim pass per hash bucket makes it exact."""
    import pyarrow as pa

    from .reports import bucketed_groups

    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderkey",
                                  "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        return df.groupby("o_custkey", sort=False).head(n)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("o_custkey", sort=False).head(n).copy()
        out["rank"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out

    out = bucketed_groups(
        ds.map_batches(partial, batch_format="pandas"),
        "o_custkey", per_bucket).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(4)
    return (out.sort_values(["o_custkey", "rank"])
            .reset_index(drop=True)[["o_custkey", "rank", "o_orderkey",
                                     "o_totalprice"]])


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rank
  FROM orders)
WHERE rank <= 3 ORDER BY o_custkey, rank
"""


# ----------------------------------------------------- session funnel

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session funnel: per session (30-min-gap windows, the
    ``events_sessionize`` rule), count sessions reaching each ordered
    step — a 'view' event, then a 'click' strictly after it, then a
    'purchase' strictly after that. Per-user groups compute their own
    session funnels (groupby(user).map_groups — user event streams are
    small); the per-user partials (3 rows each) reduce through a
    Dataset-level groupby sum, so no per-event data reaches the driver."""
    from ray.data.aggregate import Sum

    steps = FUNNEL_STEPS
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every session in the bucket: sessionize all
        # users in one sort, then per step keep the min matching ts per
        # session that is strictly after the previous step's ts — a
        # groupby-min per step instead of a Python loop per session
        df = df.sort_values(["user_id", "ts"])
        gaps = df["ts"].diff().dt.total_seconds()
        new_user = df["user_id"].ne(df["user_id"].shift())
        sid = (new_user | (gaps > gap_minutes * 60)).cumsum()
        reached = []
        prev_ts = None   # Series indexed by session id
        for st in steps:
            mask = df["event_type"].eq(st)
            cand_ts = df.loc[mask, "ts"]
            cand_sid = sid[mask]
            if prev_ts is not None:
                bound = pd.to_datetime(cand_sid.map(prev_ts))
                keep = bound.notna() & (cand_ts > bound)
                cand_ts, cand_sid = cand_ts[keep], cand_sid[keep]
            prev_ts = cand_ts.groupby(cand_sid).min()
            reached.append(len(prev_ts))
        return pd.DataFrame({
            "step_idx": pd.array(range(1, len(steps) + 1), dtype="int32"),
            "step": steps,
            "n_sessions": pd.array(reached, dtype="int64")})

    from .reports import bucketed_groups
    partials = bucketed_groups(ds, "user_id", funnel_bucket)
    out = (partials.groupby("step_idx")
           .aggregate(Sum("n_sessions", alias_name="n_sessions"))
           .to_pandas().sort_values("step_idx").reset_index(drop=True))
    out["step"] = [steps[i - 1] for i in out["step_idx"]]
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out[["step_idx", "step", "n_sessions"]]


EVENTS_FUNNEL_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessioned AS (
  SELECT user_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), s1 AS (
  SELECT user_id, session_id, min(ts) AS ts1 FROM sessioned
  WHERE event_type = 'view' GROUP BY 1, 2
), s2 AS (
  SELECT s.user_id, s.session_id, min(s.ts) AS ts2
  FROM sessioned s JOIN s1 USING (user_id, session_id)
  WHERE s.event_type = 'click' AND s.ts > s1.ts1 GROUP BY 1, 2
), s3 AS (
  SELECT s.user_id, s.session_id, min(s.ts) AS ts3
  FROM sessioned s JOIN s2 USING (user_id, session_id)
  WHERE s.event_type = 'purchase' AND s.ts > s2.ts2 GROUP BY 1, 2
)
SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_sessions FROM s1
UNION ALL SELECT 2, 'click', count(*) FROM s2
UNION ALL SELECT 3, 'purchase', count(*) FROM s3
ORDER BY step_idx
"""


def events_transitions(sf_dir: str) -> pd.DataFrame:
    """Event-type transition counts (the Markov matrix a session-model or
    anomaly detector trains on): for each user's time-ordered stream,
    count (event_type → next event_type) pairs.

    Users hash-bucket through ``bucketed_groups``; each bucket is one
    vectorized pass (sort by user/ts/event_id, shift(-1), invalidate the
    last row of each user) that emits its LOCAL pair counts — the second
    shuffle ships (type, next_type, n) partials, never event rows, so the
    exchange is O(type²·buckets) whatever the stream size."""
    from ray.data.aggregate import Sum

    from .reports import bucketed_groups

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        nxt = df["event_type"].shift(-1)
        same_user = df["user_id"].eq(df["user_id"].shift(-1))
        keep = same_user.to_numpy()
        pairs = pd.DataFrame({
            "event_type": df["event_type"].to_numpy()[keep],
            "next_type": nxt.to_numpy()[keep]})
        out = (pairs.groupby(["event_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    partials = bucketed_groups(ds, "user_id", per_bucket)
    out = (partials.groupby(["event_type", "next_type"])
           .aggregate(Sum("n", alias_name="n")).to_pandas())
    return out.sort_values(["event_type", "next_type"]) \
        .reset_index(drop=True)


EVENTS_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*)::BIGINT AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
"""


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-15", k: int = 10) -> \
        pd.DataFrame:
    """TPC-H Q3 shape: customer(filtered segment) ⋈ orders(date filter) ⋈
    lineitem(date filter) → revenue per order → top-k.

    Scale shape: the segment's custkey set broadcasts once (ray.put) and
    prunes orders inside map_batches; lineitem pre-aggregates revenue per
    orderkey INSIDE each batch before anything joins (the partial
    combiner — at 100 TB this is what keeps the join input order-sized,
    not lineitem-sized); the surviving (orderkey-keyed) sides meet in a
    bucketed reduce-side hash join, then a small groupby finishes. Both
    fact filters are pushed into the projected parquet read path."""
    import ray

    from .reports import hash_join

    cutoff_ts = pd.Timestamp(cutoff)
    cust = pd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    keys = ray.put(set(cust.loc[cust["c_mktsegment"] == segment,
                                "c_custkey"].tolist()))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys)
        m = (df["o_orderdate"] < cutoff_ts) & df["o_custkey"].isin(ks)
        return df.loc[m, ["o_orderkey", "o_orderdate", "o_orderpriority"]]

    o_side = orders.map_batches(filter_orders, batch_format="pandas")

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount", "l_shipdate"])

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff_ts]
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.array([], "int64"),
                                 "rev": pd.array([], "float64")})
        rev = df["l_extendedprice"].to_numpy() \
            * (1.0 - df["l_discount"].to_numpy())
        return (pd.DataFrame({"l_orderkey": df["l_orderkey"].to_numpy(),
                              "rev": rev})
                .groupby("l_orderkey", as_index=False)["rev"].sum())

    l_side = line.map_batches(partial_rev, batch_format="pandas")

    joined = hash_join(l_side, o_side, "l_orderkey",
                       right_key="o_orderkey").to_pandas()
    if joined.empty:
        return pd.DataFrame(columns=["l_orderkey", "revenue",
                                     "o_orderdate", "o_orderpriority"])
    out = (joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                          as_index=False)["rev"].sum())
    out["revenue"] = out["rev"].round(4)
    out = out.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(k)
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    return out[["l_orderkey", "revenue", "o_orderdate",
                "o_orderpriority"]].reset_index(drop=True)


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ------------------------------------------------- Q5 / Q13 / Q18 shapes

def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01") -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer and the
    supplier sit in the SAME nation of one region, over a one-year
    order-date window.  Six-table join.

    Scale shape: region/nation/supplier are broadcast once (ray.put of a
    suppkey→nationkey dict restricted to the region); orders ⋈ customer
    goes through the adaptive hash_join (broadcast under threshold,
    bucketed reduce-side above — customer is NOT assumed driver-sized);
    lineitem pre-aggregates revenue per (orderkey, supp_nation) inside
    each batch BEFORE the join, so the orderkey shuffle moves
    order-sized, not lineitem-sized, data.  Money is summed in exact
    integer cent-units so the distributed sum is order-independent and
    bit-identical to the sequential DuckDB oracle."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nation = pd.read_parquet(_t(sf_dir, "nation"))
    rg = pd.read_parquet(_t(sf_dir, "region"))
    rkeys = set(rg.loc[rg["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nat_names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nat_keys = set(nat_names)

    supp = pd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])
    supp = supp[supp["s_nationkey"].isin(nat_keys)]
    supp_ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])

    def filter_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_nationkey"].isin(nat_keys)] \
            .rename(columns={"c_nationkey": "cust_nation"})

    c_side = cust.map_batches(filter_cust, batch_format="pandas")

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    o_side = hash_join(orders.map_batches(filter_orders,
                                          batch_format="pandas"),
                       c_side, "o_custkey", right_key="c_custkey") \
        .map_batches(lambda df: df[["o_orderkey", "cust_nation"]],
                     batch_format="pandas")

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_suppkey",
                                    "l_extendedprice", "l_discount"])

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        s2n = ray.get(supp_ref)
        nk = df["l_suppkey"].map(s2n)
        df = df.assign(supp_nation=nk)[nk.notna().to_numpy()]
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.array([], "int64"),
                                 "supp_nation": pd.array([], "int64"),
                                 "rev_units": pd.array([], "int64")})
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        df = df.assign(rev_units=cents * (100 - disc),
                       supp_nation=df["supp_nation"].astype("int64"))
        return df.groupby(["l_orderkey", "supp_nation"],
                          as_index=False)["rev_units"].sum()

    l_side = line.map_batches(partial_rev, batch_format="pandas")

    joined = hash_join(l_side, o_side, "l_orderkey",
                       right_key="o_orderkey").to_pandas()
    if joined.empty:
        return pd.DataFrame(columns=["n_name", "revenue"])
    joined = joined[joined["supp_nation"] == joined["cust_nation"]]
    g = joined.groupby("supp_nation", as_index=False)["rev_units"].sum()
    g["n_name"] = g["supp_nation"].map(nat_names)
    g["revenue"] = (g["rev_units"] / 10000.0).round(4)
    return g.sort_values(["revenue", "n_name"],
                         ascending=[False, True]) \
        [["n_name", "revenue"]].reset_index(drop=True)


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) / 10000.0, 4)
           AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def customer_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    INCLUDING zero-order customers (the left-outer-join semantics).

    Scale shape: no outer join is materialized — orders pre-counts per
    custkey inside each batch, one keyed groupby sums the partials, the
    (already tiny) count histogram forms on the driver, and the
    zero-order bucket is derived as count(customer) − count(custkeys
    with ≥1 order): two scans, one key-sized shuffle, O(distinct counts)
    driver rows."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size()
        return g.rename(columns={"size": "n"})

    per_cust = bucketed_agg(
        orders.map_batches(partial, batch_format="pandas"),
        "o_custkey", {"c_count": ("n", "sum")}).to_pandas()
    hist = (per_cust.groupby("c_count", as_index=False).size()
            .rename(columns={"size": "custdist"}))
    n_customers = rd.read_parquet(_t(sf_dir, "customer"),
                                  columns=["c_custkey"]).count()
    zero = n_customers - len(per_cust)
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    hist["c_count"] = hist["c_count"].astype("int64")
    hist["custdist"] = hist["custdist"].astype("int64")
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]) \
        .reset_index(drop=True)


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def large_orders(sf_dir: str, threshold: float = 300.0,
                 k: int = 100) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold (HAVING semi-join), joined back to orders and customer,
    top-k by order value.

    Scale shape: lineitem pre-sums quantity per orderkey inside each
    batch, one keyed groupby finishes the sum, and the HAVING filter
    shrinks the set to the rare heavy orders BEFORE any join; the
    surviving orderkey set broadcasts (ray.put) to semi-join-filter
    orders, and the resulting custkey set broadcasts to semi-join-filter
    customer — neither big table is ever gathered."""
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_quantity"])

    def partial_qty(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False)["l_quantity"] \
            .sum()

    qty = bucketed_agg(
        line.map_batches(partial_qty, batch_format="pandas"),
        "l_orderkey", {"sum_qty": ("l_quantity", "sum")}).to_pandas()
    qty = qty[qty["sum_qty"] > threshold]
    okeys = ray.put(set(qty["l_orderkey"].tolist()))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderkey"].isin(ray.get(okeys))]

    surv = orders.map_batches(filter_orders,
                              batch_format="pandas").to_pandas()
    ckeys = ray.put(set(surv["o_custkey"].tolist()))

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])

    def filter_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"].isin(ray.get(ckeys))]

    names = cust.map_batches(filter_cust,
                             batch_format="pandas").to_pandas()
    out = surv.merge(qty, left_on="o_orderkey", right_on="l_orderkey") \
        .merge(names, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["sum_qty"].round(4)
    out = out.sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]).head(k)
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]].reset_index(drop=True)


LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 4) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(event_type, day): per-(type, day) counts and
    value sums plus per-type subtotals and a grand total, with NULLs at
    the coarser levels — the standard OLAP rollup surface.

    Scale shape: ONE shuffle computes the finest level (per-batch
    partials → keyed groupby); the coarser levels derive from the
    already-aggregated (tiny) fine level on the driver.  Values are
    summed in exact integer cents so every level is order-independent
    and matches DuckDB's sequential ROLLUP bit-for-bit."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].dt.floor("D"),
                       cents=(df["value"] * 100).round().astype("int64"))
        return df.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("cents", "size"), cents=("cents", "sum"))

    fine = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"],
        {"n_events": ("n_events", "sum"), "cents": ("cents", "sum")},
        bucket_on="day").to_pandas()
    per_type = fine.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), cents=("cents", "sum"))
    per_type["day"] = pd.NaT
    total = pd.DataFrame({"event_type": [None], "day": [pd.NaT],
                          "n_events": [fine["n_events"].sum()],
                          "cents": [fine["cents"].sum()]})
    out = pd.concat([fine, per_type, total], ignore_index=True)
    out["value_sum"] = (out["cents"] / 100.0).round(4)
    out["n_events"] = out["n_events"].astype("int64")
    out = out.sort_values(["event_type", "day"],
                          na_position="last").reset_index(drop=True)
    return out[["event_type", "day", "n_events", "value_sum"]]


EVENTS_ROLLUP_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n_events,
       round(sum(round(value * 100)::BIGINT) / 100.0, 4) AS value_sum
FROM events
GROUP BY ROLLUP(event_type, day)
ORDER BY event_type NULLS LAST, day NULLS LAST
"""


# --------------------------------- semi/anti-join + decorrelated shapes

def priority_exists_returns(sf_dir: str, date_from: str = "1997-01-01",
                            date_to: str = "1997-04-01") -> pd.DataFrame:
    """TPC-H Q4 shape: order counts per priority over a quarter, keeping
    only orders WHERE EXISTS a returned lineitem (semi-join; the
    reference schema lacks commit/receipt dates, so `l_returnflag='R'`
    stands in for the late-delivery predicate).

    Scale shape: the EXISTS never materializes a join payload — lineitem
    shrinks to per-batch DISTINCT orderkeys (marker column), one keyed
    groupby dedups them to an orderkey-sized set, and the adaptive
    hash_join (broadcast under threshold, bucketed above) semi-filters
    the date-windowed orders; counts pre-aggregate per batch before the
    tiny priority groupby."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_returnflag"])

    def distinct_keys(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["l_returnflag"] == "R", "l_orderkey"].unique()
        return pd.DataFrame({"l_orderkey": keys.astype("int64"),
                             "m": np.ones(len(keys), dtype="int64")})

    markers = bucketed_agg(
        line.map_batches(distinct_keys, batch_format="pandas"),
        "l_orderkey", {"m": ("m", "sum")})

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        return df.loc[m, ["o_orderkey", "o_orderpriority"]]

    semi = hash_join(orders.map_batches(filter_orders,
                                        batch_format="pandas"),
                     markers, "o_orderkey", right_key="l_orderkey")

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = (semi.map_batches(partial_counts, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="order_count"))
           .to_pandas())
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


PRIORITY_EXISTS_RETURNS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customers_without_recent_orders(sf_dir: str,
                                    since: str = "1999-01-01") -> \
        pd.DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average
    customers with NO orders since a cutoff (anti-join + scalar
    correlated-average subquery; the schema lacks phone country codes,
    so nationkey is the grouping and the cutoff makes the anti-join
    non-empty on the synthetic data, where every customer has ordered
    at least once historically).

    Scale shape: the anti-join is the adaptive hash_join in how='left'
    with a marker right side (distinct recent-orderer custkeys — a
    key-sized set, never the orders rows) followed by an is-null filter;
    the global positive-balance average reduces per batch to (cents, n)
    partials and the comparison is the exact integer cross-multiply
    `cents*n > total_cents`, so no float threshold crosses the wire."""
    from .reports import hash_join

    cutoff = pd.Timestamp(since)
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def partial_avg(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["c_acctbal"] * 100).round().astype("int64")
        pos = cents[cents > 0]
        return pd.DataFrame({"cents": [int(pos.sum())],
                             "n": [int(len(pos))]})

    agg = cust.map_batches(partial_avg, batch_format="pandas").to_pandas()
    total_cents, n_pos = int(agg["cents"].sum()), int(agg["n"].sum())

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate"])

    def recent_keys(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["o_orderdate"] >= cutoff, "o_custkey"].unique()
        return pd.DataFrame({"o_custkey": keys.astype("int64"),
                             "m": np.ones(len(keys), dtype="int64")})

    markers = bucketed_agg(
        orders.map_batches(recent_keys, batch_format="pandas"),
        "o_custkey", {"m": ("m", "sum")})

    joined = hash_join(cust, markers, "c_custkey", how="left",
                       right_key="o_custkey")

    def partial_out(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["c_acctbal"] * 100).round().astype("int64")
        keep = df["m"].isna() & (cents * n_pos > total_cents)
        sub = pd.DataFrame({"c_nationkey": df.loc[keep, "c_nationkey"]
                            .astype("int64"),
                            "cents": cents[keep]})
        return sub.groupby("c_nationkey", as_index=False).agg(
            numcust=("cents", "size"), cents=("cents", "sum"))

    out = (joined.map_batches(partial_out, batch_format="pandas")
           .groupby("c_nationkey")
           .aggregate(Sum("numcust", alias_name="numcust"),
                      Sum("cents", alias_name="cents"))
           .to_pandas())
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = (out["cents"] / 100.0).round(2)
    return out.sort_values("c_nationkey").reset_index(drop=True) \
        [["c_nationkey", "numcust", "totacctbal"]]


CUSTOMERS_WITHOUT_RECENT_ORDERS_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       round(sum(round(c_acctbal * 100)::BIGINT) / 100.0, 2)
           AS totacctbal
FROM customer
WHERE round(c_acctbal * 100)::BIGINT
      * (SELECT count(*) FROM customer WHERE round(c_acctbal*100) > 0)
      > (SELECT sum(round(c_acctbal * 100)::BIGINT) FROM customer
         WHERE round(c_acctbal*100) > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def small_quantity_revenue(sf_dir: str,
                           brand: str = "Brand#13") -> pd.DataFrame:
    """TPC-H Q17 shape: average weekly revenue from lineitems of one
    brand whose quantity is below 20% of that part's average quantity
    (correlated aggregate subquery, decorrelated into a self-join).

    Scale shape: the per-part average never leaves aggregate form —
    lineitem emits per-batch (partkey, sum_qty, cnt) partials, one keyed
    groupby finishes them, and the part-sized stats side meets lineitem
    again in the adaptive hash_join (bucketed at scale: the stats side
    is part-cardinality, NOT driver-sized); the 20%-of-average predicate
    is the exact integer cross-multiply `10*qty*cnt < 2*sum_qty`, and
    revenue sums in integer cents, so the result is bit-identical to the
    sequential oracle."""
    from .reports import hash_join

    part = pd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_brand"])
    bkeys = ray.put(set(part.loc[part["p_brand"] == brand,
                                 "p_partkey"].tolist()))

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"])

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        qty = (df["l_quantity"] * 10).round().astype("int64")
        g = pd.DataFrame({"l_partkey": df["l_partkey"], "q10": qty})
        return g.groupby("l_partkey", as_index=False).agg(
            sum_q10=("q10", "sum"), cnt=("q10", "size"))

    stats = bucketed_agg(
        line.map_batches(partial_stats, batch_format="pandas"),
        "l_partkey", {"sum_q10": ("sum_q10", "sum"),
                      "cnt": ("cnt", "sum")})

    def filter_brand(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(bkeys)
        return df[df["l_partkey"].isin(ks)]

    branded = line.map_batches(filter_brand, batch_format="pandas")
    joined = hash_join(branded, stats, "l_partkey")

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        q10 = (df["l_quantity"] * 10).round().astype("int64")
        keep = 10 * q10 * df["cnt"] < 2 * df["sum_q10"]
        cents = (df.loc[keep, "l_extendedprice"] * 100).round() \
            .astype("int64")
        return pd.DataFrame({"cents": [int(cents.sum())]})

    agg = joined.map_batches(partial_rev, batch_format="pandas") \
        .to_pandas()
    total = int(agg["cents"].sum())
    return pd.DataFrame({"avg_weekly": [round(total / 700.0, 2)]})


SMALL_QUANTITY_REVENUE_SQL = """
SELECT round(sum(round(l_extendedprice * 100)::BIGINT) / 700.0, 2)
           AS avg_weekly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk,
             sum(round(l_quantity * 10)::BIGINT) AS sum_q10,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey) stats ON pk = l_partkey
WHERE p_brand = 'Brand#13'
  AND 10 * round(l_quantity * 10)::BIGINT * cnt < 2 * sum_q10
"""


def promo_revenue_ratio(sf_dir: str, date_from: str = "1997-06-01",
                        date_to: str = "1997-07-01") -> pd.DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue that came from
    promotional parts (conditional aggregation over a fact⋈dimension
    join).

    Scale shape: lineitem is date-pruned inside map_batches and joins
    part through the adaptive hash_join (part is fact-scale at 100 TB —
    no driver dict); both the promo and total revenue accumulate as
    exact integer cent-units in per-batch partials, and only the final
    two scalars divide on the driver."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_type"])
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def filter_month(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        return df.loc[m, ["l_partkey", "l_extendedprice", "l_discount"]]

    joined = hash_join(line.map_batches(filter_month,
                                        batch_format="pandas"),
                       part, "l_partkey", right_key="p_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        units = cents * (100 - disc)
        promo = units[(df["p_type"] == "PROMO").to_numpy()]
        return pd.DataFrame({"promo_units": [int(promo.sum())],
                             "total_units": [int(units.sum())]})

    agg = joined.map_batches(partial, batch_format="pandas").to_pandas()
    promo, total = int(agg["promo_units"].sum()), \
        int(agg["total_units"].sum())
    ratio = round(100.0 * promo / total, 4) if total else 0.0
    return pd.DataFrame({"promo_revenue_pct": [ratio]})


PROMO_REVENUE_RATIO_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN round(l_extendedprice * 100)::BIGINT
                                   * (100 - round(l_discount * 100)::BIGINT)
                              ELSE 0 END)
             / sum(round(l_extendedprice * 100)::BIGINT
                   * (100 - round(l_discount * 100)::BIGINT)), 4)
           AS promo_revenue_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
"""


def events_user_setops(sf_dir: str, type_a: str = "click",
                       type_b: str = "purchase") -> pd.DataFrame:
    """INTERSECT / EXCEPT set operations over user populations: how many
    users did both A and B, only A, only B.

    Scale shape: one keyed shuffle total — events shrink to per-batch
    distinct (user_id, saw_a, saw_b) partials, a groupby(user_id) ORs
    the flags, and the three counts reduce from per-batch partials;
    distinct user sets never materialize anywhere."""
    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([type_a, type_b])]
        g = pd.DataFrame({
            "user_id": df["user_id"],
            "saw_a": (df["event_type"] == type_a).astype("int64"),
            "saw_b": (df["event_type"] == type_b).astype("int64")})
        return g.groupby("user_id", as_index=False).max()

    per_user = bucketed_agg(
        ev.map_batches(flags, batch_format="pandas"),
        "user_id", {"saw_a": ("saw_a", "max"),
                    "saw_b": ("saw_b", "max")})

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["saw_a"].to_numpy(), df["saw_b"].to_numpy()
        return pd.DataFrame({
            "n_both": [int(((a == 1) & (b == 1)).sum())],
            "n_only_a": [int(((a == 1) & (b == 0)).sum())],
            "n_only_b": [int(((a == 0) & (b == 1)).sum())]})

    agg = per_user.map_batches(counts, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_both": [int(agg["n_both"].sum())],
        "n_only_a": [int(agg["n_only_a"].sum())],
        "n_only_b": [int(agg["n_only_b"].sum())]})


EVENTS_USER_SETOPS_SQL = """
SELECT
  (SELECT count(*) FROM
     (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
      AS n_both,
  (SELECT count(*) FROM
     (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
      AS n_only_a,
  (SELECT count(*) FROM
     (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'))
      AS n_only_b
"""


def lonely_returned_supplier(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier with a
    returned lineitem in a multi-supplier order (nested EXISTS / NOT
    EXISTS self-joins on the fact table, decorrelated into two keyed
    aggregations; `l_returnflag='R'` stands in for the late-delivery
    predicate absent from this schema).

    Scale shape: no self-join of lineitem ever happens — per-batch
    distinct (orderkey, suppkey, returned) partials collapse the fact
    table to its (order, supplier) grain in one shuffle; a second keyed
    groupby per orderkey computes n_suppliers, n_returned and
    max(suppkey*returned) (the unique culprit when n_returned==1) with
    plain vectorized aggregates; only culprit counts per supplier —
    supplier-cardinality rows — reach the name join."""
    from .reports import hash_join

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_suppkey",
                                    "l_returnflag"])

    def grain(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "l_suppkey": df["l_suppkey"],
            "r": (df["l_returnflag"] == "R").astype("int64")})
        return g.groupby(["l_orderkey", "l_suppkey"],
                         as_index=False).max()

    per_pair = bucketed_agg(
        line.map_batches(grain, batch_format="pandas"),
        ["l_orderkey", "l_suppkey"], {"r": ("r", "max")})

    def per_order_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(one=np.int64(1),
                       rsupp=df["l_suppkey"] * df["r"])
        return df.groupby("l_orderkey", as_index=False).agg(
            n_supp=("one", "sum"), n_r=("r", "sum"),
            rsupp=("rsupp", "max"))

    per_order = bucketed_agg(
        per_pair.map_batches(per_order_partial, batch_format="pandas"),
        "l_orderkey", {"n_supp": ("n_supp", "sum"),
                       "n_r": ("n_r", "sum"),
                       "rsupp": ("rsupp", "max")})

    def culprit_counts(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n_supp"] >= 2) & (df["n_r"] == 1)
        sub = pd.DataFrame({"s_suppkey": df.loc[keep, "rsupp"]
                            .astype("int64")})
        g = sub.groupby("s_suppkey", as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = bucketed_agg(
        per_order.map_batches(culprit_counts, batch_format="pandas"),
        "s_suppkey", {"numwait": ("n", "sum")})

    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_name"])
    named = hash_join(counts, supp, "s_suppkey").to_pandas()
    if named.empty:
        return pd.DataFrame(columns=["s_name", "numwait"])
    named["numwait"] = named["numwait"].astype("int64")
    out = named.sort_values(["numwait", "s_suppkey"],
                            ascending=[False, True]).head(k)
    return out[["s_name", "numwait"]].reset_index(drop=True)


LONELY_RETURNED_SUPPLIER_SQL = """
WITH per_pair AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(r) AS n_r,
         max(l_suppkey * r) AS rsupp
  FROM per_pair GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON s_suppkey = rsupp
WHERE n_supp >= 2 AND n_r = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 25
"""


# ----------------------------------- filter-agg / argmax / disjunctive shapes

def forecast_revenue(sf_dir: str, year: int = 1997) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue delta from discount-band lineitems of one
    year (pure filter + scalar aggregate, no join, no shuffle).

    Scale shape: the cheapest possible plan — projected 4-column scan,
    per-batch vectorized mask, one integer partial per batch; revenue
    accumulates as cents*disc100 ten-thousandth units so the driver sum
    is exact."""
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_shipdate", "l_discount",
                                    "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        disc = (df["l_discount"] * 100).round().astype("int64")
        q10 = (df["l_quantity"] * 10).round().astype("int64")
        m = ((df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
             & (disc >= 5) & (disc <= 7) & (q10 < 240))
        cents = (df.loc[m, "l_extendedprice"] * 100).round().astype("int64")
        units = cents * disc[m]
        return pd.DataFrame({"units": [int(units.sum())]})

    agg = line.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(agg["units"].sum())
    return pd.DataFrame({"revenue_delta": [round(total / 10000.0, 2)]})


FORECAST_REVENUE_SQL = """
SELECT round(sum(round(l_extendedprice * 100)::BIGINT
                 * round(l_discount * 100)::BIGINT) / 10000.0, 2)
           AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
  AND round(l_quantity * 10)::BIGINT < 240
"""


def returned_item_customers(sf_dir: str, date_from: str = "1997-01-01",
                            date_to: str = "1997-04-01",
                            k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items
    in one quarter, with nation names (fact⋈fact join + dimension
    enrichment + global top-k).

    Scale shape: both fact sides shrink before the join — lineitem to
    returned rows with integer revenue units, orders to the date window's
    (orderkey, custkey) — and the adaptive hash_join buckets them; revenue
    pre-aggregates per batch by custkey so the custkey groupby ships one
    row per key per batch; only customer-cardinality rows meet the
    dimension joins, and the driver sees k rows after sort/limit."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"])

    def returned(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        g = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                          "units": cents * (100 - disc)})
        return g.groupby("l_orderkey", as_index=False).sum()

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def in_window(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    joined = hash_join(line.map_batches(returned, batch_format="pandas"),
                       orders.map_batches(in_window,
                                          batch_format="pandas"),
                       "l_orderkey", right_key="o_orderkey")

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["units"].sum()

    per_customer = bucketed_agg(
        joined.map_batches(per_cust, batch_format="pandas"),
        "o_custkey", {"units": ("units", "sum")})

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_nationkey"])
    named = hash_join(per_customer, cust, "o_custkey",
                      right_key="c_custkey").to_pandas()
    if named.empty:
        return pd.DataFrame(columns=["c_custkey", "c_name", "n_name",
                                     "revenue"])
    nation = pd.read_parquet(_t(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].astype("int64"),
                    nation["n_name"]))
    named["n_name"] = named["c_nationkey"].astype("int64").map(nmap)
    named["revenue"] = (named["units"] / 10000.0).round(2)
    named["c_custkey"] = named["o_custkey"].astype("int64")
    out = named.sort_values(["units", "c_custkey"],
                            ascending=[False, True]).head(k)
    return out[["c_custkey", "c_name", "n_name",
                "revenue"]].reset_index(drop=True)


RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) / 10000.0, 2)
           AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT)) DESC, c_custkey
LIMIT 20
"""


def top_revenue_supplier(sf_dir: str, date_from: str = "1997-01-01",
                         date_to: str = "1997-04-01") -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    global maximum (aggregate → scalar max → equality filter, the
    view/CTE-with-max shape).

    Scale shape: lineitem reduces to per-batch (suppkey, units) partials
    before the one keyed groupby; the supplier-cardinality aggregate is
    materialized once (key-sized, not fact-sized) so the max pass and the
    equality filter don't recompute the scan; revenue is exact integer
    units so `== max` has no float hazard."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_suppkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        df = df[m]
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        g = pd.DataFrame({"l_suppkey": df["l_suppkey"],
                          "units": cents * (100 - disc)})
        return g.groupby("l_suppkey", as_index=False).sum()

    per_supp = bucketed_agg(
        line.map_batches(partial, batch_format="pandas"),
        "l_suppkey", {"units": ("units", "sum")}).materialize()
    top = per_supp.max("units")

    best = per_supp.filter(lambda r: r["units"] == top)
    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_name"])
    named = hash_join(best, supp, "l_suppkey",
                      right_key="s_suppkey").to_pandas()
    named["s_suppkey"] = named["l_suppkey"].astype("int64")
    named["total_revenue"] = (named["units"] / 10000.0).round(2)
    return named.sort_values("s_suppkey").reset_index(drop=True) \
        [["s_suppkey", "s_name", "total_revenue"]]


TOP_REVENUE_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey, sum(round(l_extendedprice * 100)::BIGINT
                        * (100 - round(l_discount * 100)::BIGINT)) AS units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(units / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE units = (SELECT max(units) FROM rev)
ORDER BY s_suppkey
"""


def disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    predicate groups (disjunctive multi-attribute join filter).

    Scale shape: part prunes to the three brands BEFORE the join (the
    adaptive hash_join buckets if the pruned side is still large at 100
    TB — no driver dict), the disjunction evaluates as three vectorized
    masks per batch, and revenue reduces to one integer partial per
    batch."""
    from .reports import hash_join

    groups = [("Brand#12", 1, 25, 10, 250),
              ("Brand#23", 1, 40, 100, 350),
              ("Brand#11", 1, 50, 200, 500)]
    brands = {g[0] for g in groups}

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_size"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["p_brand"].isin(brands)]

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])
    joined = hash_join(line,
                       part.map_batches(prune, batch_format="pandas"),
                       "l_partkey", right_key="p_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q10 = (df["l_quantity"] * 10).round().astype("int64")
        keep = pd.Series(False, index=df.index)
        for brand, s_lo, s_hi, q_lo, q_hi in groups:
            keep |= ((df["p_brand"] == brand)
                     & (df["p_size"] >= s_lo) & (df["p_size"] <= s_hi)
                     & (q10 >= q_lo) & (q10 <= q_hi))
        cents = (df.loc[keep, "l_extendedprice"] * 100).round() \
            .astype("int64")
        disc = (df.loc[keep, "l_discount"] * 100).round().astype("int64")
        units = cents * (100 - disc)
        return pd.DataFrame({"units": [int(units.sum())]})

    agg = joined.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(agg["units"].sum())
    return pd.DataFrame({"disj_revenue": [round(total / 10000.0, 2)]})


DISJUNCTIVE_REVENUE_SQL = """
SELECT round(coalesce(sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)), 0)
             / 10000.0, 2) AS disj_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
       AND round(l_quantity * 10)::BIGINT BETWEEN 10 AND 250)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 40
       AND round(l_quantity * 10)::BIGINT BETWEEN 100 AND 350)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 50
       AND round(l_quantity * 10)::BIGINT BETWEEN 200 AND 500)
"""


def supplier_part_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    for selected part sizes, excluding brand/type families and a NOT-IN
    supplier blocklist (count-distinct over a fact-derived association
    with an anti-set; lineitem stands in for partsupp, and the blocklist
    is low-balance suppliers since this schema has no comment column).

    Scale shape: lineitem collapses to per-batch distinct (partkey,
    suppkey) pairs (a combiner only — no full-fact dedup shuffle: the
    later quad groupby already fixes the distinct grain, and the inner
    join against size-pruned part drops ~90% of pairs first); part
    attributes arrive via the adaptive hash_join; the blocklist is a
    key-sized set broadcast once via ray.put; the one keyed groupby runs
    on (brand, type, size, suppkey) post-prune rows and counts reduce
    from per-batch partials."""
    from .reports import hash_join

    sizes = {1, 14, 23, 45}
    supp = pd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_acctbal"])
    bad = ray.put(set(
        supp.loc[(supp["s_acctbal"] * 100).round().astype("int64")
                 < 250000, "s_suppkey"].astype("int64").tolist()))

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_suppkey"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates()
        return pd.DataFrame({"l_partkey": g["l_partkey"],
                             "l_suppkey": g["l_suppkey"],
                             "m": np.ones(len(g), dtype="int64")})

    pairs = line.map_batches(distinct_pairs, batch_format="pandas")

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"])

    def prune_part(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["p_size"].isin(sizes) & (df["p_brand"] != "Brand#13")
             & (df["p_type"] != "PROMO"))
        return df[m]

    joined = hash_join(pairs,
                       part.map_batches(prune_part,
                                        batch_format="pandas"),
                       "l_partkey", right_key="p_partkey")

    def drop_blocked(df: pd.DataFrame) -> pd.DataFrame:
        blocked = ray.get(bad)
        df = df[~df["l_suppkey"].isin(blocked)]
        return df[["p_brand", "p_type", "p_size", "l_suppkey",
                   "m"]].drop_duplicates(
            ["p_brand", "p_type", "p_size", "l_suppkey"])

    quads = bucketed_agg(
        joined.map_batches(drop_blocked, batch_format="pandas"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        {"m": ("m", "max")})

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_brand", "p_type", "p_size"],
                       as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = bucketed_agg(
        quads.map_batches(partial_counts, batch_format="pandas"),
        ["p_brand", "p_type", "p_size"],
        {"supplier_cnt": ("n", "sum")}).to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int32")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True) \
        [["p_brand", "p_type", "p_size", "supplier_cnt"]]


SUPPLIER_PART_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) assoc
JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 14, 23, 45)
  AND p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE round(s_acctbal * 100)::BIGINT < 250000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def nation_market_share(sf_dir: str, region: str = "ASIA",
                        nation: str = "NATION_2",
                        ptype: str = "STANDARD") -> pd.DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's yearly revenue
    for one part type (market-share ratio over a 5-way join with
    conditional aggregation by year).

    Scale shape: the two tiny dimensions (nation, region) resolve on the
    driver to key sets; part prunes to the type before its join; orders
    semi-filters through region customers via the adaptive hash_join and
    carries only (orderkey, year); supplier contributes one int column;
    the share numerator/denominator reduce as per-batch integer partials
    grouped by the handful of years."""
    from .reports import hash_join

    nat = pd.read_parquet(_t(sf_dir, "nation"))
    reg = pd.read_parquet(_t(sf_dir, "region"))
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nkeys = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"]
                       .astype("int64").tolist())
    target_nkey = int(nat.loc[nat["n_name"] == nation,
                              "n_nationkey"].iloc[0])
    nkeys_ref = ray.put(region_nkeys)

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(nkeys_ref)
        keep = df.loc[df["c_nationkey"].astype("int64").isin(ks),
                      "c_custkey"]
        return pd.DataFrame({"c_custkey": keep.astype("int64"),
                             "cm": np.ones(len(keep), dtype="int64")})

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    orders_region = hash_join(
        orders,
        cust.map_batches(cust_markers, batch_format="pandas"),
        "o_custkey", right_key="c_custkey")

    def order_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_year": df["o_orderdate"].dt.year.astype("int64")})

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_type"])

    def prune_part(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["p_type"] == ptype, "p_partkey"]
        return pd.DataFrame({"p_partkey": keep.astype("int64"),
                             "pm": np.ones(len(keep), dtype="int64")})

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_partkey",
                                    "l_suppkey", "l_extendedprice",
                                    "l_discount"])
    typed = hash_join(line,
                      part.map_batches(prune_part,
                                       batch_format="pandas"),
                      "l_partkey", right_key="p_partkey")

    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])
    with_nat = hash_join(typed, supp, "l_suppkey", right_key="s_suppkey")

    full = hash_join(with_nat,
                     orders_region.map_batches(order_year,
                                               batch_format="pandas"),
                     "l_orderkey", right_key="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        units = cents * (100 - disc)
        is_target = (df["s_nationkey"].astype("int64")
                     == target_nkey).astype("int64")
        g = pd.DataFrame({"o_year": df["o_year"],
                          "nation_units": units * is_target,
                          "total_units": units})
        return g.groupby("o_year", as_index=False).sum()

    out = (full.map_batches(partial, batch_format="pandas")
           .groupby("o_year")
           .aggregate(Sum("nation_units", alias_name="nation_units"),
                      Sum("total_units", alias_name="total_units"))
           .to_pandas())
    out["mkt_share"] = (out["nation_units"]
                        / out["total_units"]).round(4)
    out["o_year"] = out["o_year"].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True) \
        [["o_year", "mkt_share"]]


NATION_MARKET_SHARE_SQL = """
SELECT o_year,
       round(sum(CASE WHEN s_nat = 'NATION_2' THEN units
                      ELSE 0 END)::DOUBLE / sum(units), 4) AS mkt_share
FROM (
  SELECT extract(year FROM o_orderdate)::BIGINT AS o_year,
         round(l_extendedprice * 100)::BIGINT
         * (100 - round(l_discount * 100)::BIGINT) AS units,
         ns.n_name AS s_nat
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = nc.n_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD') t
GROUP BY o_year
ORDER BY o_year
"""


def customer_cumulative_spend(sf_dir: str,
                              modulus: int = 100) -> pd.DataFrame:
    """Running-total window shape: per-customer cumulative order spend in
    order-date order (SUM OVER PARTITION BY ... ROWS UNBOUNDED PRECEDING),
    for a deterministic 1/modulus customer sample.

    Scale shape: the sample filter runs in the scan projection (no join
    — custkey is on the fact row); customers shuffle once into hash
    buckets and each bucket's cumsum is a vectorized sort + groupby
    cumsum over int64 cents, so per-key state never hits the driver and
    no per-key map_groups invocation exists (VERDICT-r3 #4's shape)."""
    from .reports import bucketed_groups  # noqa: F401  (shape reference)

    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])

    def sample(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy()
        keep = np.nonzero(ck % modulus == 0)[0]
        batch = batch.take(pa.array(keep, pa.int64()))
        bk = ((batch.column("o_custkey").to_numpy()
               * np.int64(2654435761)) % 16).astype("int32")
        return batch.append_column("__bucket", pa.array(bk))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
            .reset_index(drop=True)
        cents = (df["o_totalprice"] * 100).round().astype("int64")
        cum = cents.groupby(df["o_custkey"]).cumsum()
        return pd.DataFrame({"o_custkey": df["o_custkey"],
                             "o_orderkey": df["o_orderkey"],
                             "cum_spend": (cum / 100.0).round(2)})

    out = (ds.map_batches(sample, batch_format="pyarrow")
           .groupby("__bucket")
           .map_groups(lambda df: per_bucket(df.drop(columns="__bucket")),
                       batch_format="pandas")
           .to_pandas())
    return out.sort_values(["o_custkey", "o_orderkey"]) \
        .reset_index(drop=True)


CUSTOMER_CUMULATIVE_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       (sum(round(o_totalprice * 100)::BIGINT)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING)) / 100.0 AS cum_spend
FROM orders
WHERE o_custkey % 100 = 0
ORDER BY o_custkey, o_orderkey
"""


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction shape: parse the JSON `props` column,
    pull the numeric `k` field, and aggregate per event_type (the
    json_extract → aggregate operator class).

    Scale shape: extraction is a vectorized regex over the string column
    (per-row json.loads only for the rare rows the fast path misses), and
    the stats reduce to one (type, n, sum, min, max) partial per batch
    before the tiny event_type groupby — the JSON never leaves the
    scan tasks."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce")
        miss = k.isna()
        if miss.any():
            import json

            def slow(s):
                try:
                    return json.loads(s).get("k")
                except (TypeError, ValueError):
                    return None
            k.loc[miss] = df.loc[miss, "props"].map(slow)
        g = pd.DataFrame({"event_type": df["event_type"],
                          "k": k.astype("int64")})
        out = g.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        return out

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k"))
           .to_pandas())
    for c in ("n", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    out["avg_k"] = (out["sum_k"] / out["n"]).round(4)
    return out.sort_values("event_type").reset_index(drop=True) \
        [["event_type", "n", "sum_k", "min_k", "max_k", "avg_k"]]


EVENTS_PROPS_STATS_SQL = """
SELECT event_type, count(*) AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT) AS min_k,
       max(json_extract(props, '$.k')::BIGINT) AS max_k,
       round(sum(json_extract(props, '$.k')::BIGINT)::DOUBLE
             / count(*), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def priority_shipping_split(sf_dir: str, year: int = 1997) -> \
        pd.DataFrame:
    """TPC-H Q12 shape: per linestatus, how many of the year's lineitems
    belong to high-priority (1-URGENT/2-HIGH) vs lower-priority orders
    (fact⋈fact join + conditional CASE counts; l_linestatus stands in
    for the shipmode column absent from this schema).

    Scale shape: lineitem prunes to the year's (orderkey, linestatus)
    inside the scan tasks; orders contributes two columns through the
    adaptive hash_join; the conditional counts collapse to one
    (linestatus, high, low) partial per batch before a groupby over the
    two linestatus values."""
    from .reports import hash_join

    lo, hi = pd.Timestamp(f"{year}-01-01"), pd.Timestamp(f"{year+1}-01-01")
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_linestatus",
                                    "l_shipdate"])

    def in_year(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        return df.loc[m, ["l_orderkey", "l_linestatus"]]

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(line.map_batches(in_year, batch_format="pandas"),
                       orders, "l_orderkey", right_key="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi_m = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        g = pd.DataFrame({"l_linestatus": df["l_linestatus"],
                          "high_line_count": hi_m.astype("int64"),
                          "low_line_count": (~hi_m).astype("int64")})
        return g.groupby("l_linestatus", as_index=False).sum()

    out = (joined.map_batches(partial, batch_format="pandas")
           .groupby("l_linestatus")
           .aggregate(Sum("high_line_count",
                          alias_name="high_line_count"),
                      Sum("low_line_count", alias_name="low_line_count"))
           .to_pandas())
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True) \
        [["l_linestatus", "high_line_count", "low_line_count"]]


PRIORITY_SHIPPING_SPLIT_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 5/4 of the average
    per-part revenue (aggregate + HAVING-against-global-scalar; the
    average-relative threshold stays meaningful at any part cardinality,
    unlike Q11's fixed fraction).

    Scale shape: one keyed groupby fixes per-part revenue from per-batch
    partials; the global total and part count come from the SAME
    materialized part-cardinality aggregate (no second fact scan); the
    HAVING compares exact integer units cross-multiplied (units*n*4 >
    5*total), so no float threshold."""
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_extendedprice",
                                    "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        g = pd.DataFrame({"l_partkey": df["l_partkey"],
                          "units": cents * (100 - disc)})
        return g.groupby("l_partkey", as_index=False).sum()

    per_part = bucketed_agg(
        line.map_batches(partial, batch_format="pandas"),
        "l_partkey", {"units": ("units", "sum")}).materialize()
    total = per_part.sum("units")
    n_parts = per_part.count()

    keep = per_part.map_batches(
        lambda df: df[df["units"] * n_parts * 4 > 5 * total],
        batch_format="pandas").to_pandas()
    if keep.empty:
        return pd.DataFrame(columns=["l_partkey", "part_value"])
    # round-half-away-from-zero in integer space (float .round is
    # half-even; DuckDB round() is half-away — a .5 boundary diverges)
    keep["part_value"] = ((keep["units"] + 500) // 1000) / 100.0
    keep["l_partkey"] = keep["l_partkey"].astype("int64")
    return keep.sort_values(["units", "l_partkey"],
                            ascending=[False, True]) \
        .reset_index(drop=True)[["l_partkey", "part_value"]]


IMPORTANT_PARTS_SQL = """
WITH rev AS (
  SELECT l_partkey, sum(round(l_extendedprice * 100)::BIGINT
                        * (100 - round(l_discount * 100)::BIGINT)) AS units
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, floor((units + 500) / 1000)::BIGINT / 100.0
           AS part_value
FROM rev
WHERE units * (SELECT count(*) FROM rev) * 4
      > 5 * (SELECT sum(units) FROM rev)
ORDER BY units DESC, l_partkey
"""


# --------------------------------------------- Q2 / Q7 / Q9 / Q20 shapes

def volume_shipping(sf_dir: str, region_a: str = "ASIA",
                    region_b: str = "EUROPE",
                    date_from: str = "1996-01-01",
                    date_to: str = "1997-12-31") -> pd.DataFrame:
    """TPC-H Q7 shape: shipped revenue between two trading blocs per
    (supplier nation, customer nation, ship year) — the classic
    double-nation-join volume query. Adapted to region pairs (a single
    nation pair selects zero rows at small sf on this corpus's 25
    nations).

    Scale shape: nation/region resolve on the driver to a
    nationkey→(name, bloc) map broadcast once; supplier and customer
    collapse to key→(nation, bloc) markers inside map_batches; orders
    carries only (orderkey, cust nation/bloc) through the adaptive
    hash_join; lineitem is date-pruned and reduced to integer-cent units
    before the one fact-sized join; the final groupby sees per-batch
    partials over ≤ |nations|² × years keys."""
    from .reports import hash_join

    lo = pd.Timestamp(date_from)
    hi = pd.Timestamp(date_to)
    nat = pd.read_parquet(_t(sf_dir, "nation"))
    reg = pd.read_parquet(_t(sf_dir, "region"))
    rmap = dict(zip(reg["r_regionkey"].astype("int64"),
                    reg["r_name"]))
    nk2 = {int(k): (n, rmap[int(r)])
           for k, n, r in zip(nat["n_nationkey"], nat["n_name"],
                              nat["n_regionkey"])
           if rmap[int(r)] in (region_a, region_b)}
    nk_ref = ray.put(nk2)

    def supp_markers(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nk_ref)
        ks = df["s_nationkey"].astype("int64")
        keep = ks.isin(m.keys())
        ks = ks[keep]
        return pd.DataFrame({
            "s_suppkey": df.loc[keep, "s_suppkey"].astype("int64"),
            "supp_nation": [m[k][0] for k in ks],
            "s_bloc": [m[k][1] for k in ks]})

    def cust_markers(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nk_ref)
        ks = df["c_nationkey"].astype("int64")
        keep = ks.isin(m.keys())
        ks = ks[keep]
        return pd.DataFrame({
            "c_custkey": df.loc[keep, "c_custkey"].astype("int64"),
            "cust_nation": [m[k][0] for k in ks],
            "c_bloc": [m[k][1] for k in ks]})

    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"]) \
        .map_batches(supp_markers, batch_format="pandas")
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_markers, batch_format="pandas")
    orders = hash_join(
        rd.read_parquet(_t(sf_dir, "orders"),
                        columns=["o_orderkey", "o_custkey"]),
        cust, "o_custkey", right_key="c_custkey") \
        .map_batches(lambda df: df[["o_orderkey", "cust_nation",
                                    "c_bloc"]],
                     batch_format="pandas")

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_suppkey",
                                    "l_extendedprice", "l_discount",
                                    "l_shipdate"])

    def prune_line(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] <= hi)
        df = df[m]
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype("int64"),
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "l_year": df["l_shipdate"].dt.year.astype("int64"),
            "units": cents * (100 - disc)})

    tagged = hash_join(line.map_batches(prune_line,
                                        batch_format="pandas"),
                       supp, "l_suppkey", right_key="s_suppkey")
    full = hash_join(tagged, orders, "l_orderkey",
                     right_key="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_bloc"] != df["c_bloc"]]
        return (df.groupby(["supp_nation", "cust_nation", "l_year"],
                           as_index=False)["units"].sum())

    out = (full.map_batches(partial, batch_format="pandas")
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("units", alias_name="units"))
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["supp_nation", "cust_nation",
                                     "l_year", "revenue"])
    out["revenue"] = out["units"] / 10000.0
    out["l_year"] = out["l_year"].astype("int64")
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)[["supp_nation", "cust_nation",
                                 "l_year", "revenue"]]


VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year, sum(units) / 10000.0 AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         extract(year FROM l_shipdate)::BIGINT AS l_year,
         round(l_extendedprice * 100)::BIGINT
         * (100 - round(l_discount * 100)::BIGINT) AS units,
         rs.r_name AS s_bloc, rc.r_name AS c_bloc
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN region rs ON rs.r_regionkey = ns.n_regionkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  JOIN region rc ON rc.r_regionkey = nc.n_regionkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                       AND TIMESTAMP '1997-12-31'
    AND rs.r_name IN ('ASIA', 'EUROPE')
    AND rc.r_name IN ('ASIA', 'EUROPE')) t
WHERE s_bloc <> c_bloc
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def product_type_profit(sf_dir: str,
                        name_frag: str = "widget") -> pd.DataFrame:
    """TPC-H Q9 shape: per (supplier nation, order year) profit for parts
    whose name contains a fragment. The corpus has no partsupp table, so
    supply cost is proxied as 0.6 × p_retailprice per unit (same join
    topology — part prunes by name, lineitem joins part + supplier +
    orders — with profit = revenue − cost in exact integer 10⁻⁴-cent
    units).

    Scale shape: the name-pruned part side ships only (partkey,
    retail-cents) through the adaptive hash_join; supplier nation names
    broadcast as a key→name dict; orders carries (orderkey, year) into
    the one fact-sized join; profit reduces from per-batch integer
    partials over ≤ |nations| × years keys."""
    from .reports import hash_join

    nat = pd.read_parquet(_t(sf_dir, "nation"))
    nk2name = ray.put(dict(zip(nat["n_nationkey"].astype("int64"),
                               nat["n_name"])))

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_name",
                                    "p_retailprice"])

    def prune_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p_name"].str.contains(name_frag, regex=False)]
        return pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "retail_c": (df["p_retailprice"] * 100).round()
            .astype("int64")})

    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])

    def supp_markers(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nk2name)
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].astype("int64"),
            "nation": [m[int(k)] for k in df["s_nationkey"]]})

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate"])

    def order_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_year": df["o_orderdate"].dt.year.astype("int64")})

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_partkey",
                                    "l_suppkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])
    with_part = hash_join(
        line, part.map_batches(prune_part, batch_format="pandas"),
        "l_partkey", right_key="p_partkey")
    with_supp = hash_join(
        with_part, supp.map_batches(supp_markers,
                                    batch_format="pandas"),
        "l_suppkey", right_key="s_suppkey")
    full = hash_join(
        with_supp, orders.map_batches(order_year,
                                      batch_format="pandas"),
        "l_orderkey", right_key="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        qty = df["l_quantity"].round().astype("int64")
        profit = (cents * (100 - disc)
                  - df["retail_c"].astype("int64") * 60 * qty)
        g = pd.DataFrame({"nation": df["nation"],
                          "o_year": df["o_year"],
                          "p": profit})
        return g.groupby(["nation", "o_year"], as_index=False).sum()

    out = (full.map_batches(partial, batch_format="pandas")
           .groupby(["nation", "o_year"])
           .aggregate(Sum("p", alias_name="p"))
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["nation", "o_year", "profit"])
    out["profit"] = out["p"] / 10000.0
    out["o_year"] = out["o_year"].astype("int64")
    return out.sort_values(["nation", "o_year"]) \
        .reset_index(drop=True)[["nation", "o_year", "profit"]]


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation,
       extract(year FROM o_orderdate)::BIGINT AS o_year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT)
           - round(p_retailprice * 100)::BIGINT * 60
             * round(l_quantity)::BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                      size_max: int = 15, ptype: str = "LARGE",
                      k: int = 100) -> pd.DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region supplier(s)
    achieving the per-part MINIMUM — a correlated-min subquery joined
    back on equality. The corpus has no partsupp/ps_supplycost, so the
    part↔supplier association is the distinct (l_partkey, l_suppkey)
    fact grain and the minimized measure is s_acctbal (selection of a
    raw column — exact under float comparison on both engines).

    Scale shape: lineitem collapses to per-batch distinct pairs (a
    combiner; the part join prunes before any full dedup is needed);
    part prunes to (size, type) before shipping keys; region suppliers
    ride the adaptive hash_join as (key, name, acctbal, nation); the
    per-part min reduces via the int-bucketed aggregate and joins back
    against the candidate rows on (partkey, min) equality."""
    from .reports import hash_join

    nat = pd.read_parquet(_t(sf_dir, "nation"))
    reg = pd.read_parquet(_t(sf_dir, "region"))
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nk2name = ray.put({
        int(k_): n for k_, n, r in zip(nat["n_nationkey"],
                                       nat["n_name"],
                                       nat["n_regionkey"])
        if int(r) == rkey})

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_suppkey"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates()
        return pd.DataFrame({"l_partkey": g["l_partkey"].astype("int64"),
                             "l_suppkey": g["l_suppkey"].astype("int64")})

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_type", "p_size"])

    def prune_part(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["p_type"] == ptype) & (df["p_size"] <= size_max)
        return pd.DataFrame({"p_partkey":
                             df.loc[m, "p_partkey"].astype("int64")})

    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_name",
                                    "s_acctbal", "s_nationkey"])

    def region_supp(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nk2name)
        ks = df["s_nationkey"].astype("int64")
        keep = ks.isin(m.keys())
        return pd.DataFrame({
            "s_suppkey": df.loc[keep, "s_suppkey"].astype("int64"),
            "s_name": df.loc[keep, "s_name"],
            "s_acctbal": df.loc[keep, "s_acctbal"],
            "n_name": [m[k] for k in ks[keep]]})

    pairs = line.map_batches(distinct_pairs, batch_format="pandas")
    cand = hash_join(
        hash_join(pairs,
                  part.map_batches(prune_part, batch_format="pandas"),
                  "l_partkey", right_key="p_partkey"),
        supp.map_batches(region_supp, batch_format="pandas"),
        "l_suppkey", right_key="s_suppkey")

    # combiner-dedup the (part, supplier) grain, then per-part min
    def pair_grain(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_partkey", "l_suppkey"])

    cand = bucketed_agg(
        cand.map_batches(pair_grain, batch_format="pandas"),
        ["l_partkey", "l_suppkey"],
        {"s_acctbal": ("s_acctbal", "min"),
         "s_name": ("s_name", "min"), "n_name": ("n_name", "min")})

    mins = bucketed_agg(cand, "l_partkey",
                        {"min_bal": ("s_acctbal", "min")})
    winners = hash_join(cand, mins, "l_partkey").to_pandas()
    if winners.empty:
        return pd.DataFrame(columns=["s_acctbal", "s_name", "n_name",
                                     "p_partkey"])
    winners = winners[winners["s_acctbal"] == winners["min_bal"]]
    winners = winners.rename(columns={"l_partkey": "p_partkey"})
    winners["p_partkey"] = winners["p_partkey"].astype("int64")
    return winners.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).head(k) \
        .reset_index(drop=True)[["s_acctbal", "s_name", "n_name",
                                 "p_partkey"]]


MIN_COST_SUPPLIER_SQL = """
WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT l_partkey AS p_partkey, s_acctbal, s_name, n_name
  FROM assoc
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE p_type = 'LARGE' AND p_size <= 15 AND r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey
FROM cand
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = cand.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def potential_part_promotion(sf_dir: str, name_prefix: str = "small",
                             year: int = 1997,
                             qty_threshold: int = 40) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of any one prefix-named part in a year — the nested
    semi-join (supplier ⋉ (part-filtered, quantity-thresholded fact
    aggregate)). The corpus has no partsupp.availqty, so the canonical
    0.5×availqty bound becomes a fixed per-(supplier, part) quantity
    threshold.

    Scale shape: name-pruned part keys ride the adaptive hash_join;
    per-(suppkey, partkey) quantities reduce through the int-bucketed
    aggregate from per-batch integer partials; only the passing suppkey
    SET (dimension-sized) returns to the driver to broadcast-filter the
    supplier table."""
    from .reports import hash_join

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    nat = pd.read_parquet(_t(sf_dir, "nation"))
    nk2name = dict(zip(nat["n_nationkey"].astype("int64"),
                       nat["n_name"]))

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_name"])

    def prune_part(df: pd.DataFrame) -> pd.DataFrame:
        m = df["p_name"].str.startswith(name_prefix)
        return pd.DataFrame({"p_partkey":
                             df.loc[m, "p_partkey"].astype("int64")})

    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_partkey", "l_suppkey",
                                    "l_quantity", "l_shipdate"])

    def partial_qty(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        g = pd.DataFrame({
            "l_suppkey": df["l_suppkey"].astype("int64"),
            "l_partkey": df["l_partkey"].astype("int64"),
            "qty": df["l_quantity"].round().astype("int64")})
        return g.groupby(["l_suppkey", "l_partkey"],
                         as_index=False).sum()

    shipped = bucketed_agg(
        hash_join(line.map_batches(partial_qty, batch_format="pandas"),
                  part.map_batches(prune_part, batch_format="pandas"),
                  "l_partkey", right_key="p_partkey"),
        ["l_suppkey", "l_partkey"], {"qty": ("qty", "sum")})

    passing = shipped.map_batches(
        lambda df: df.loc[df["qty"] > qty_threshold,
                          ["l_suppkey"]].drop_duplicates(),
        batch_format="pandas").to_pandas()
    keys = set(passing["l_suppkey"].astype("int64").tolist())
    keys_ref = ray.put(keys)

    def pick_supp(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        df = df[df["s_suppkey"].astype("int64").isin(ks)]
        return pd.DataFrame({
            "s_suppkey": df["s_suppkey"].astype("int64"),
            "s_name": df["s_name"],
            "n_name": [nk2name[int(k)] for k in df["s_nationkey"]]})

    out = rd.read_parquet(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name",
                                   "s_nationkey"]) \
        .map_batches(pick_supp, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["s_suppkey", "s_name", "n_name"])
    return out.sort_values("s_suppkey").reset_index(drop=True) \
        [["s_suppkey", "s_name", "n_name"]]


POTENTIAL_PART_PROMOTION_SQL = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(round(l_quantity)::BIGINT) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT DISTINCT l_suppkey FROM shipped
                    WHERE qty > 40)
ORDER BY s_suppkey
"""


def events_retention(sf_dir: str) -> pd.DataFrame:
    """Retention-cohort matrix over the events table: users cohorted by
    their first-activity week, counted as retained in each later week
    they act — the growth-analytics staple (cohort_week, week_offset,
    n_users). Weeks are integer epoch-week indices (epoch_us // 7 days),
    calendar-free so both sides compute them with exact int64 division.

    Distributed shape: per-batch per-user min-week partials → one
    bucketed min for the first-seen table; a hash_join attaches cohorts
    back to the event stream (both sides are corpus-sized at 10^10 —
    never a broadcast); per-batch DISTINCT (cohort, offset, user)
    triples dedup globally in user_id buckets (a triple always lands in
    its user's bucket), reduce to per-bucket counts, and only the
    weeks²-bounded matrix reaches the driver."""
    from .reports import bucketed_agg, bucketed_groups, hash_join

    WEEK_US = 7 * 86400 * 1_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def weeks(df: pd.DataFrame) -> pd.DataFrame:
        # explicit [us] cast: the parquet column is timestamp[us] and
        # pandas may surface it as either datetime64[us] or [ns]
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "wk": us // WEEK_US})

    wk = ds.map_batches(weeks, batch_format="pandas")

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)["wk"].min() \
            .rename(columns={"wk": "cw"})

    first = bucketed_agg(
        wk.map_batches(min_partial, batch_format="pandas"),
        "user_id", {"cw": ("cw", "min")})

    joined = hash_join(wk, first, key="user_id")

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "cw": df["cw"].astype("int64"),
            "off": (df["wk"] - df["cw"]).astype("int64"),
            "user_id": df["user_id"].astype("int64")})
        return out.drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["cw", "off", "user_id"])
        return d.groupby(["cw", "off"], as_index=False).agg(
            n=("user_id", "size"))

    parts = bucketed_groups(
        joined.map_batches(distinct_partial, batch_format="pandas"),
        "user_id", per_bucket).to_pandas()
    out = parts.groupby(["cw", "off"], as_index=False)["n"].sum() \
        .rename(columns={"cw": "cohort_week", "off": "week_offset",
                         "n": "n_users"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)


EVENTS_RETENTION_SQL = """
WITH __w AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
__f AS (SELECT user_id, min(wk) AS cw FROM __w GROUP BY user_id),
__x AS (
  SELECT DISTINCT f.cw, w.wk - f.cw AS off, w.user_id
  FROM __w w JOIN __f f USING (user_id))
SELECT cw::BIGINT AS cohort_week, off::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM __x GROUP BY cw, off ORDER BY cohort_week, week_offset"""
