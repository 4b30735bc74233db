"""Deterministic sampling / shuffling operators for training-data curation.

A 100-TB mixture build needs three properties the usual ``ds.random_sample``
/ ``ds.random_shuffle`` pair cannot give: (1) the sample must be a pure
function of the row (re-runs, retries and resumed partitions pick the same
rows — no RNG state to checkpoint), (2) per-source rates must be exact
policy, not best-effort, and (3) an oracle must be able to reproduce the
selection bit-for-bit. All three ops key on ``md5(str(id))`` — the hex
string compares identically in Python and DuckDB, so every operator here
has an exact SQL twin.

Scale notes: ``mixture_sample`` is a stateless batch filter (no shuffle at
all — each block drops rows independently). ``deterministic_shuffle`` is a
keyed global sort; at cluster scale Ray Data's sort range-partitions on
the key, which is exactly the "write shuffled shards" step of a training
run (consume with ``write_parquet`` per key range, not ``take_all``).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

__all__ = ["mixture_sample", "deterministic_shuffle", "balance_mixture",
           "MIXTURE_RATE_SQL_CASE", "rate_to_hex"]


def _hex8(key: str) -> str:
    return hashlib.md5(key.encode()).hexdigest()[:8]


def rate_to_hex(rate: float) -> str:
    """Sampling rate → 8-hex-digit threshold: keep iff md5-prefix < it."""
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def _default_rate(source: str) -> float:
    """Default mixture policy for the synthetic corpus's ``srcN`` sources:
    even-numbered sources are majority domains (keep 1/2), odd-numbered
    are minority domains (keep 1/8)."""
    try:
        n = int(source[3:])
    except (ValueError, IndexError):
        return 0.125
    return 0.5 if n % 2 == 0 else 0.125


MIXTURE_RATE_SQL_CASE = (
    "CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0 "
    "THEN '{even}' ELSE '{odd}' END").format(
        even=rate_to_hex(0.5), odd=rate_to_hex(0.125))


def mixture_sample(ds: rd.Dataset, rates: dict[str, float] | None = None,
                   id_col: str = "doc_id",
                   source_col: str = "source") -> rd.Dataset:
    """Per-source deterministic downsampling: keep a row iff the first 8
    hex digits of ``md5(str(id))`` fall below the source's rate threshold.
    ``rates`` maps source → rate; unlisted sources use the even/odd
    default policy. Stateless per batch — no shuffle, no RNG."""
    rates = rates or {}
    thresholds = {s: rate_to_hex(r) for s, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        mask = [
            _hex8(str(i)) < thresholds.get(s, rate_to_hex(_default_rate(s)))
            for i, s in zip(ids, srcs)]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def balance_mixture(ds: rd.Dataset, token_budget: int,
                    target_weights: dict[str, float] | None = None,
                    id_col: str = "doc_id", source_col: str = "source",
                    text_col: str = "text",
                    buckets: int = 32) -> rd.Dataset:
    """DoReMi-lite mixture rebalancing: derive per-source sampling rates
    FROM the data so the expected sampled token count hits
    ``token_budget`` at the target source proportions (uniform when
    ``target_weights`` is None), then apply the same deterministic
    md5-threshold filter as ``mixture_sample``.

    Two passes, both bounded:
    1. per-source token totals — per-batch (source, Σtokens) partials →
       a |sources|-sized aggregate on the driver (sources are a mixture
       policy's unit: dozens, not millions).
       rate_s = min((budget·w_s)/T_s, 1) — computed in that exact
       float-op order so the DuckDB twin reproduces it bit-for-bit.
    2. stateless keep filter (no shuffle): md5-prefix(id) < hex(rate_s),
       emitting (id, source, n_tokens) for the survivors.

    Oversubscribed sources (T_s < budget·w_s) cap at rate 1 — the
    "epochs over minority domains" decision DoReMi-class recipes make
    explicit; the shortfall is visible by comparing the output's token
    sum per source against budget·w_s."""
    from ..functions.text import token_count
    from ..pipelines.reports import bucketed_agg

    def tok_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for s, t in zip(batch.column(source_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            c[s] += token_count(t)
        return pa.table({source_col: pa.array(list(c.keys()), pa.string()),
                         "t": pa.array(list(c.values()), pa.int64())})

    totals = bucketed_agg(
        ds.select_columns([source_col, text_col])
        .map_batches(tok_partial, batch_format="pyarrow"),
        source_col, {"t": ("t", "sum")}, buckets=buckets).to_pandas()
    srcs = sorted(totals[source_col])
    w = target_weights or {s: 1.0 / len(srcs) for s in srcs}
    tmap = dict(zip(totals[source_col], totals["t"]))
    # sources absent from explicit target_weights get weight 0 (excluded
    # from the mixture, not a KeyError); zero-token sources sample at
    # rate 0 rather than dividing by zero
    thresholds = {
        s: rate_to_hex(min((token_budget * w.get(s, 0.0)) / tmap[s], 1.0)
                       if tmap[s] > 0 else 0.0)
        for s in srcs}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sources = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        oi, os_, on = [], [], []
        for i, s, t in zip(ids, sources, texts):
            if _hex8(str(i)) < thresholds.get(s, "00000000"):
                oi.append(i)
                os_.append(s)
                on.append(token_count(t))
        return pa.table({id_col: pa.array(oi,
                                          batch.column(id_col).type),
                         source_col: pa.array(os_, pa.string()),
                         "n_tokens": pa.array(on, pa.int64())})

    return ds.select_columns([id_col, source_col, text_col]) \
        .map_batches(keep, batch_format="pyarrow")


def balance_mixture_sql(token_budget: int, table: str = "documents",
                        id_col: str = "doc_id",
                        source_col: str = "source",
                        col: str = "text") -> str:
    """DuckDB twin of the uniform-target configuration. The rate→hex
    conversion mirrors ``rate_to_hex`` exactly: LEAST(rate·2^32,
    2^32−1) then FLOOR (trunc == floor for non-negative), printf'%08x'."""
    from .text import TOKEN_COUNT_SQL
    n = TOKEN_COUNT_SQL.format(col=col)
    return f"""
WITH tok AS (SELECT {id_col}, {source_col}, {n} AS n FROM {table}),
tot AS (SELECT {source_col}, SUM(n)::BIGINT AS t FROM tok
        GROUP BY {source_col}),
k AS (SELECT COUNT(*)::DOUBLE AS k FROM tot),
thr AS (
  SELECT {source_col},
         printf('%08x', CAST(FLOOR(LEAST(
             LEAST(({token_budget} * (1.0 / k.k)) / t, 1.0)
             * 4294967296.0, 4294967295.0)) AS BIGINT)) AS th
  FROM tot CROSS JOIN k
)
SELECT tok.{id_col}, tok.{source_col}, tok.n AS n_tokens
FROM tok JOIN thr USING ({source_col})
WHERE substr(md5(CAST(tok.{id_col} AS VARCHAR)), 1, 8) < thr.th
ORDER BY tok.{id_col}
"""


def deterministic_shuffle(ds: rd.Dataset, id_col: str = "doc_id",
                          key_col: str = "shuffle_key") -> rd.Dataset:
    """Global deterministic shuffle: order by ``md5(str(id))``. The key is
    collision-free in practice (128-bit) and reproducible across runs, so
    a resumed training job reads the identical sequence. Returns the
    dataset sorted by the key (Ray Data range-partitions the sort at
    cluster scale)."""
    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return batch.append_column(key_col, pa.array(keys, pa.string()))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(key_col)


def reservoir_sample(ds, k: int = 5, group_col: str = "source",
                     id_col: str = "doc_id", buckets: int = 32):
    """Exact-k uniform sample per group, deterministic: the k rows with
    the smallest md5(id) per group (a fixed random permutation, so the
    choice is uniform over the group yet reproducible across runs and
    block layouts — the distributed stand-in for reservoir sampling,
    whose sequential state doesn't shard). Same shuffle shape as per-key
    top-N: each batch keeps ≤k rows per group it has seen (partial
    combiner), then one vectorized rank-trim per hash bucket is exact."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from ..pipelines.reports import bucketed_groups

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [hashlib.md5(str(i).encode()).hexdigest()
                for i in batch.column(id_col).to_pylist()]
        return batch.append_column("sample_key",
                                   pa.array(keys, pa.string()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "sample_key", id_col])
        return df.groupby(group_col, sort=False).head(k)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "sample_key", id_col])
        return df.groupby(group_col, sort=False).head(k)

    return bucketed_groups(
        ds.select_columns([id_col, group_col])
        .map_batches(add_key, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas"),
        group_col, per_bucket, buckets=buckets)


def reservoir_sample_sql(table: str = "documents", k: int = 5,
                         group_col: str = "source",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin: row_number over md5(id) per group."""
    return f"""
SELECT {id_col}, {group_col}, sample_key FROM (
  SELECT {id_col}, {group_col},
         md5(CAST({id_col} AS VARCHAR)) AS sample_key,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY md5(CAST({id_col} AS VARCHAR)),
                                     {id_col}) AS rn
  FROM {table})
WHERE rn <= {k} ORDER BY {group_col}, sample_key, {id_col}"""


def stratified_split(ds, frac: float = 0.125, group_col: str = "source",
                     id_col: str = "doc_id", buckets: int = 32):
    """Exact stratified train/validation split: per group, the
    ``ceil(frac · n)`` rows with the smallest md5(id) become ``val``.

    Scale shape: the selection reduces to ONE THRESHOLD per group (the
    quota-th smallest key) — per-batch partial quota-trims feed a bucketed
    exact per-group trim, the driver sees only {group: threshold}, and the
    labels come from a final stateless pass (``key <= threshold``), so the
    val set itself never funnels through the driver. Deterministic across
    runs and block layouts; exact because md5 keys of distinct ids are
    collision-free in practice (the oracle comparison would surface one).
    Default frac 0.125 is binary-exact, keeping ceil(frac·n) identical
    across engines for every n."""
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Max

    from ..pipelines.reports import bucketed_groups

    counts = ds.groupby(group_col).count().to_pandas()
    quota = {g: math.ceil(frac * int(n))
             for g, n in zip(counts[group_col], counts["count()"])}

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [hashlib.md5(str(i).encode()).hexdigest()
                for i in batch.column(id_col).to_pylist()]
        return batch.append_column("__key", pa.array(keys, pa.string()))

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "__key", id_col])
        rn = df.groupby(group_col, sort=False).cumcount()
        return df[rn < df[group_col].map(quota).to_numpy()]

    keyed = ds.select_columns([id_col, group_col]) \
        .map_batches(add_key, batch_format="pyarrow")
    chosen = bucketed_groups(keyed.map_batches(trim, batch_format="pandas"),
                             group_col, trim, buckets=buckets)
    thr = (chosen.groupby(group_col)
           .aggregate(Max("__key", alias_name="thr")).to_pandas())
    thr_ref = ray.put(dict(zip(thr[group_col], thr["thr"])))

    def label(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        splits = ["val" if k <= t.get(g, "") else "train"
                  for g, k in zip(batch.column(group_col).to_pylist(),
                                  batch.column("__key").to_pylist())]
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            "split": pa.array(splits, pa.string()),
        })

    return keyed.map_batches(label, batch_format="pyarrow")


def stratified_split_sql(table: str = "documents", frac: float = 0.125,
                         group_col: str = "source",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin: row_number over md5(id) per group vs ceil(frac·n)."""
    return f"""
SELECT {id_col}, {group_col},
       CASE WHEN rn <= CEIL({frac} * n) THEN 'val' ELSE 'train' END AS split
FROM (
  SELECT {id_col}, {group_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY md5(CAST({id_col} AS VARCHAR)),
                                     {id_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table})
ORDER BY {id_col}
"""


def weighted_sample(ds, k: int = 50, weight_col: str = "n_chars",
                    id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirtakis 2006, A-ES): each row draws key = ln(u)/w where u is a
    fixed uniform derived from md5(id) (top 52 hash bits / 2^52), and
    the k LARGEST keys form a weight-proportional sample. Because u is
    a hash of the row id — not RNG state — the sample is reproducible
    across runs, block layouts and cluster sizes, the property that
    makes a 100-TB selection auditable. Zero/negative weights are
    excluded (never sampled), mirroring the SQL twin's WHERE.

    Shape: stateless per-block key computation + per-block top-k
    partial; the driver merges blocks×k rows, never the corpus. Returns
    (doc_id, weight, r_score) with r_score = −ln(u)/w half-away-rounded
    to 6 dp (ascending r_score ⇔ descending key)."""
    import hashlib
    import math

    import pandas as pd
    import pyarrow as pa

    def score(batch: pa.Table) -> pa.Table:
        id_type = batch.column(id_col).type
        ids = batch.column(id_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        oi, ow, orr = [], [], []
        for i, w in zip(ids, ws):
            if w is None or w <= 0:
                continue
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:13],
                    16) / 4503599627370496.0
            oi.append(i)
            ow.append(int(w))
            orr.append(-math.log(max(u, 2.2e-16)) / w)
        return pa.table({"doc_id": pa.array(oi, id_type),
                         "weight": pa.array(ow, pa.int64()),
                         "__r": pa.array(orr, pa.float64())})

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["__r", "doc_id"]).head(k)

    out = ds.select_columns([id_col, weight_col]) \
        .map_batches(score, batch_format="pyarrow") \
        .map_batches(topk_partial, batch_format="pandas") \
        .to_pandas()
    out = out.sort_values(["__r", "doc_id"]).head(k).reset_index(drop=True)
    out["r_score"] = out.pop("__r").map(
        lambda x: math.floor(x * 1e6 + 0.5) / 1e6)
    return out[["doc_id", "weight", "r_score"]]


def weighted_sample_sql(table: str = "documents", k: int = 50,
                        weight_col: str = "n_chars",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of ``weighted_sample``: identical hash-uniform,
    identical exponential key, identical ordering and rounding."""
    return f"""
WITH __b AS (
  SELECT {id_col} AS doc_id, {weight_col}::BIGINT AS weight,
         CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 13)
              AS UBIGINT) / 4503599627370496.0 AS u
  FROM {table} WHERE {weight_col} > 0)
SELECT doc_id, weight,
       round(-ln(greatest(u, 2.2e-16)) / weight, 6) AS r_score
FROM __b
ORDER BY -ln(greatest(u, 2.2e-16)) / weight, doc_id LIMIT {k}"""


def quality_topp(ds: rd.Dataset, p_num: int = 1, p_den: int = 10,
                 id_col: str = "doc_id", source_col: str = "source",
                 text_col: str = "text", buckets: int = 32) -> rd.Dataset:
    """FineWeb-style per-source quality selection: keep the top
    ceil(n_s · p_num/p_den) documents of each source, ranked by
    (quality DESC, id ASC) with ``text.quality_score`` as the gate.
    The fraction is a rational so k_s is exact integer arithmetic on
    both sides (float ceil(0.1·n) can land on either side of an epsilon).

    Distributed shape, three bounded passes (none gathers the corpus):

    1. score — stateless ``map_batches``; quality is 6-dp rounded in
       [0, 1], so the per-source value histogram is ≤ 10^6+1 rows
       regardless of corpus size (the histogram-not-rows trick of
       lm.quality_buckets).
    2. thresholds — (source, quality, count) shuffle; one cumulative
       walk from the TOP per source reads off the threshold t_s, and the
       tie allowance m_s = k_s − |{quality > t_s}|.
    3. keep — stateless filter quality > t_s (the selected stream, still
       a Dataset), plus the m_s id-smallest ties AT t_s via per-block
       bottom-m partials (driver merge is tie-set-sized: one 6-dp value
       per source).

    Returns a Dataset of (doc_id, source, quality)."""
    import pandas as pd

    from ..pipelines.reports import bucketed_groups
    from .text import quality_score

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table({
            "doc_id": batch.column(id_col),
            "source": batch.column(source_col),
            "quality": pa.array([quality_score(t) for t in texts],
                                pa.float64())})

    scored = ds.select_columns([id_col, source_col, text_col]) \
        .map_batches(score, batch_format="pyarrow")

    def hist_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter(zip(batch.column("source").to_pylist(),
                                 batch.column("quality").to_pylist()))
        ss, qs, ns = [], [], []
        for (s, q), n in c.items():
            ss.append(s)
            qs.append(q)
            ns.append(n)
        return pa.table({"source": pa.array(ss, pa.string()),
                         "__q": pa.array(qs, pa.float64()),
                         "__cnt": pa.array(ns, pa.int64())})

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        out_s, out_t, out_m = [], [], []
        for s, sub in df.groupby("source", sort=False):
            h = (sub.groupby("__q", sort=True)["__cnt"].sum()
                 .reset_index().sort_values("__q", ascending=False))
            cum = h["__cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            k = (n * p_num + p_den - 1) // p_den
            pos = int((cum < k).sum())   # first row where cum >= k
            above = int(cum[pos - 1]) if pos else 0
            out_s.append(s)
            out_t.append(float(h["__q"].iloc[pos]))
            out_m.append(k - above)
        return pd.DataFrame({"source": out_s, "thr": out_t, "m": out_m})

    thr_df = bucketed_groups(
        scored.map_batches(hist_partial, batch_format="pyarrow"),
        "source", per_source, buckets=buckets).to_pandas()
    thr = dict(zip(thr_df["source"], thr_df["thr"]))
    m_allow = dict(zip(thr_df["source"], thr_df["m"].astype(int)))

    def keep_strict(batch: pa.Table) -> pa.Table:
        import numpy as np
        srcs = batch.column("source").to_pylist()
        q = batch.column("quality").to_numpy(zero_copy_only=False)
        t = np.array([thr[s] for s in srcs])
        return batch.filter(pa.array(q > t))

    def tie_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[thr[s] == q for s, q in zip(df["source"], df["quality"])]]
        return (df.sort_values(["source", "doc_id"])
                .groupby("source", sort=False)
                .head(max(m_allow.values(), default=0)))

    ties = scored.map_batches(tie_partial,
                              batch_format="pandas").to_pandas()
    ties = (ties.sort_values(["source", "doc_id"])
            .groupby("source", sort=False)
            .apply(lambda g: g.head(m_allow[g.name]),
                   include_groups=False)
            .reset_index(level=0)
            .reset_index(drop=True)[["doc_id", "source", "quality"]])
    strict = scored.map_batches(keep_strict, batch_format="pyarrow")
    if len(ties):
        tie_tbl = pa.table({
            "doc_id": pa.array(ties["doc_id"]),
            "source": pa.array(ties["source"], pa.string()),
            "quality": pa.array(ties["quality"], pa.float64())})
        return strict.union(rd.from_arrow(tie_tbl))
    return strict


def quality_topp_sql(table: str = "documents", p_num: int = 1,
                     p_den: int = 10, id_col: str = "doc_id",
                     source_col: str = "source",
                     text_col: str = "text") -> str:
    """DuckDB twin of ``quality_topp``: identical quality formula,
    identical integer-exact k_s, identical (quality DESC, id ASC) ranking."""
    from .text import QUALITY_SQL
    q = QUALITY_SQL.format(col=text_col)
    return f"""
WITH s AS (
  SELECT {id_col} AS doc_id, {source_col} AS source, {q} AS quality
  FROM {table}),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM s)
SELECT doc_id, source, quality
FROM r WHERE rn <= (n * {p_num} + {p_den} - 1) // {p_den}
ORDER BY doc_id
"""


def shuffle_shard_mix(ds: rd.Dataset, id_col: str = "doc_id",
                      source_col: str = "source") -> "pd.DataFrame":
    """Shuffle-quality audit: partition rows into 16 shards by the FIRST
    hex digit of the md5 shuffle key (the same key
    ``deterministic_shuffle`` sorts by — each shard is one contiguous
    key range, i.e. one training shard) and report each shard's source
    mix. A good shuffle gives every shard near-max source entropy; a
    skewed shard means a training run would see source-correlated
    batches. Per-batch (shard, source) Counter partials → a 16×|sources|
    aggregate; nothing corpus-sized moves.

    Numeric contract: mix_entropy = log2(n) − (Σ c·log2 c)/n over the
    shard's source counts (the lexical_stats op order), floor(x·1e6 +
    0.5)/1e6. Returns (shard, n_rows, n_sources, mix_entropy), 16 rows."""
    import math
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for i, s in zip(batch.column(id_col).to_pylist(),
                        batch.column(source_col).to_pylist()):
            c[(_hex8(str(i))[0], s)] += 1
        ks = list(c.keys())
        return pa.table({"shard": pa.array([k[0] for k in ks],
                                           pa.string()),
                         "source": pa.array([k[1] for k in ks],
                                            pa.string()),
                         "c": pa.array([c[k] for k in ks], pa.int64())})

    counts = ds.select_columns([id_col, source_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["shard", "source"]) \
        .aggregate(Sum("c", alias_name="c")).to_pandas()
    rows = []
    for shard, sub in counts.groupby("shard"):
        n = int(sub["c"].sum())
        s = sum(int(c) * math.log2(int(c)) for c in
                sorted(sub["c"], key=lambda x: -x))
        ent = math.floor((math.log2(n) - s / n) * 1e6 + 0.5) / 1e6 \
            if n else 0.0
        rows.append((shard, n, len(sub), ent))
    return pd.DataFrame(rows, columns=[
        "shard", "n_rows", "n_sources", "mix_entropy"]) \
        .sort_values("shard").reset_index(drop=True)


def shuffle_shard_mix_sql(table: str = "documents",
                          id_col: str = "doc_id",
                          source_col: str = "source") -> str:
    """DuckDB twin: identical shard key, identical entropy op order."""
    return f"""
WITH __c AS (
  SELECT substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) AS shard,
         {source_col} AS source, COUNT(*)::BIGINT AS c
  FROM {table} GROUP BY 1, 2),
__p AS (
  SELECT shard, SUM(c)::BIGINT AS n_rows, COUNT(*)::BIGINT AS n_sources,
         SUM(c * log2(c)) AS s
  FROM __c GROUP BY shard)
SELECT shard, n_rows, n_sources,
       CASE WHEN n_rows > 0
            THEN floor((log2(n_rows) - s / n_rows) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS mix_entropy
FROM __p ORDER BY shard"""
