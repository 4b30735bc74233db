"""Dataset-card statistics over a document table.

``dataset_stats`` — per (source, lang): document count, total word tokens,
total characters, and the EXACT distinct-document count (by content
fingerprint). The per-group token/byte totals are what a training-mixture
card reports; the distinct count is the dedup-aware size the mixture
weights actually apply to. Generalizes the reference's per-crawl summary
counters (crawler.py:574-576, crawl_db stats) to a corpus-scale pass.

Ray-Data-first shape (two streaming passes, one narrow shuffle):
- Totals: per-batch pandas partial aggregation (the combiner) → tiny
  partial frames → final sum on the collected partials. The shuffle-free
  partial-aggregate shape: block count × group count rows, never
  corpus-sized.
- Exact distinct: (source, lang, fingerprint) narrow rows bucketed by
  crc32(fingerprint) — identical fingerprints collocate, so per-bucket
  drop_duplicates is globally correct — then per-bucket group counts sum.
  This is the scale path for count(DISTINCT) that an approximate engine
  would do with HLL; here exactness is required for the DuckDB oracle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .text import fingerprint, token_count


def dataset_stats(ds: rd.Dataset, text_col: str = "text",
                  group_cols: tuple[str, str] = ("source", "lang"),
                  chars_col: str = "n_chars",
                  buckets: int = 32) -> pa.Table:
    """(source, lang, n_docs, total_tokens, total_chars, n_unique_docs),
    sorted by the group key."""
    g0, g1 = group_cols

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__tok=[token_count(t) for t in df[text_col]])
        out = (df.groupby([g0, g1], sort=False)
               .agg(n_docs=(text_col, "size"), total_tokens=("__tok", "sum"),
                    total_chars=(chars_col, "sum")).reset_index())
        return out

    partials = (ds.select_columns([g0, g1, text_col, chars_col])
                .map_batches(partial, batch_format="pandas").to_pandas())
    totals = (partials.groupby([g0, g1], sort=False)
              .agg(n_docs=("n_docs", "sum"),
                   total_tokens=("total_tokens", "sum"),
                   total_chars=("total_chars", "sum")).reset_index())

    def to_fp(batch: pa.Table) -> pa.Table:
        fps = [fingerprint(t) for t in batch.column(text_col).to_pylist()]
        bk = [zlib.crc32(f.encode()) % buckets for f in fps]
        return pa.table({
            g0: batch.column(g0), g1: batch.column(g1),
            "fp": pa.array(fps, pa.string()),
            "__bucket": pa.array(bk, pa.int32())})

    def bucket_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([g0, g1, "fp"])
        return (d.groupby([g0, g1], sort=False)
                .size().reset_index(name="n_unique_docs"))

    uniq_parts = (ds.select_columns([g0, g1, text_col])
                  .map_batches(to_fp, batch_format="pyarrow")
                  .groupby("__bucket")
                  .map_groups(lambda df: bucket_distinct(
                      df.drop(columns="__bucket")), batch_format="pandas")
                  .to_pandas())
    uniq = (uniq_parts.groupby([g0, g1], sort=False)
            .agg(n_unique_docs=("n_unique_docs", "sum")).reset_index())

    out = (totals.merge(uniq, on=[g0, g1], how="left")
           .sort_values([g0, g1]).reset_index(drop=True))
    schema = pa.schema([(g0, pa.string()), (g1, pa.string()),
                        ("n_docs", pa.int64()),
                        ("total_tokens", pa.int64()),
                        ("total_chars", pa.int64()),
                        ("n_unique_docs", pa.int64())])
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def dataset_stats_sql(table: str = "documents") -> str:
    from .text import FINGERPRINT_SQL, TOKEN_COUNT_SQL
    return f"""
SELECT source, lang,
       count(*)::BIGINT AS n_docs,
       sum({TOKEN_COUNT_SQL.format(col='text')})::BIGINT AS total_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       count(DISTINCT {FINGERPRINT_SQL.format(col='text')})::BIGINT
         AS n_unique_docs
FROM {table}
GROUP BY source, lang
ORDER BY source, lang
"""


DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def length_quantiles(ds: rd.Dataset, qs: tuple = DEFAULT_QUANTILES,
                     group_col: str = "source", text_col: str = "text",
                     buckets: int = 32) -> pa.Table:
    """EXACT per-group token-length quantiles (DuckDB ``quantile_disc``
    semantics: sorted value at index ``max(ceil(q·n)−1, 0)``), as
    (group, q, tokens) long-format rows.

    Scale shape: exact quantiles normally need a global per-group sort,
    but token lengths are small bounded integers, so the value HISTOGRAM
    is tiny. Per-batch (group, length) Counter partials compress each
    block to its distinct lengths; the shuffle ships (group, length,
    count) — never rows — and one vectorized pass per group walks the
    cumulative histogram to read off every quantile exactly. (The
    approximate-engine alternative is t-digest; exactness here is what
    lets the DuckDB oracle verify bit-for-bit.)"""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(zip(batch.column(group_col).to_pylist(),
                        (token_count(t)
                         for t in batch.column(text_col).to_pylist())))
        gs, ls, ns = [], [], []
        for (g, ln), cnt in c.items():
            gs.append(g)
            ls.append(ln)
            ns.append(cnt)
        return pa.table({group_col: pa.array(gs, pa.string()),
                         "__len": pa.array(ls, pa.int64()),
                         "__cnt": pa.array(ns, pa.int64())})

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        import math
        out_g, out_q, out_t = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = (sub.groupby("__len", sort=True)["__cnt"].sum()
                 .reset_index())
            cum = h["__cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            for q in qs:
                idx = max(math.ceil(q * n) - 1, 0)
                pos = int((cum <= idx).sum())  # first cum > idx
                out_g.append(g)
                out_q.append(q)
                out_t.append(int(h["__len"].iloc[pos]))
        return pd.DataFrame({group_col: out_g, "q": out_q,
                             "tokens": out_t})

    from ..pipelines.reports import bucketed_groups
    res = bucketed_groups(
        ds.select_columns([group_col, text_col])
        .map_batches(partial, batch_format="pyarrow"),
        group_col, per_group, buckets=buckets).to_pandas()
    res = res.sort_values([group_col, "q"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def length_quantiles_sql(table: str = "documents",
                         qs: tuple = DEFAULT_QUANTILES,
                         group_col: str = "source",
                         text_col: str = "text") -> str:
    """DuckDB twin: quantile_disc with parallel-unnest zip."""
    from .text import TOKEN_COUNT_SQL
    n = TOKEN_COUNT_SQL.format(col=text_col)
    qlist = "[" + ", ".join(str(q) for q in qs) + "]"
    return f"""
WITH __t AS (SELECT {group_col}, {n} AS n FROM {table}),
__q AS (SELECT {group_col}, quantile_disc(n, {qlist}) AS tq
        FROM __t GROUP BY {group_col})
SELECT {group_col}, unnest({qlist}) AS q, unnest(tq)::BIGINT AS tokens
FROM __q ORDER BY {group_col}, q"""


def source_vocab_overlap(ds: rd.Dataset, group_col: str = "source",
                         text_col: str = "text",
                         buckets: int = 32) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mixture
    diagnostic that flags near-identical sources before mixture weights
    are assigned.

    Shape: per-batch (group, token) DISTINCT partials → one global
    distinct (groupby count == 1 dedup is implicit in the aggregate) →
    token-hash-bucketed pair expansion: each bucket turns a token's
    source list into C(k,2) pair increments locally and ships only
    (s1, s2, n) partials. The all-pairs work is per TOKEN (k = #sources
    containing it, bounded by #sources), never per row."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..pipelines.reports import bucketed_groups
    from .lm import _TOKEN_RE

    def distinct_partial(batch: pa.Table) -> pa.Table:
        seen = set()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for tok in set(_TOKEN_RE.findall((t or "").lower())):
                seen.add((g, tok))
        gs, ts = zip(*seen) if seen else ((), ())
        return pa.table({group_col: pa.array(list(gs), pa.string()),
                         "token": pa.array(list(ts), pa.string())})

    # global (group, token) distinct via token-bucketed dedup (the old
    # groupby([group, token]).count() sort-aggregate iterated every
    # vocab×source group in Python); materialized because both the size
    # map and the pair expansion read it
    vt = bucketed_groups(
        ds.select_columns([group_col, text_col])
        .map_batches(distinct_partial, batch_format="pyarrow"),
        "token",
        lambda df: df.drop_duplicates([group_col, "token"]),
        buckets=buckets).materialize()

    sizes = (vt.groupby(group_col).count().to_pandas()
             .set_index(group_col)["count()"].to_dict())

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for _, grp in df.groupby("token", sort=False):
            ss = sorted(grp[group_col].unique())
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    c[(ss[i], ss[j])] += 1
        if not c:
            return pd.DataFrame({"s1": [], "s2": [], "n_shared": []})
        ks = list(c.keys())
        return pd.DataFrame({"s1": [k[0] for k in ks],
                             "s2": [k[1] for k in ks],
                             "n_shared": [int(c[k]) for k in ks]})

    pairs = (bucketed_groups(vt, "token", pair_partial, buckets=buckets)
             .groupby(["s1", "s2"])
             .aggregate(Sum("n_shared", alias_name="n_shared"))
             .to_pandas())
    pairs["n1"] = pairs["s1"].map(sizes).astype("int64")
    pairs["n2"] = pairs["s2"].map(sizes).astype("int64")
    pairs["n_shared"] = pairs["n_shared"].astype("int64")
    pairs["jaccard"] = [
        round(i / (a + b - i), 6)
        for i, a, b in zip(pairs["n_shared"], pairs["n1"], pairs["n2"])]
    return pairs.sort_values(["s1", "s2"]).reset_index(drop=True)


def source_vocab_overlap_sql(table: str = "documents",
                             group_col: str = "source",
                             col: str = "text") -> str:
    return f"""
WITH vt AS (
  SELECT DISTINCT {group_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS token
  FROM {table}
),
sizes AS (SELECT {group_col}, COUNT(*) AS n FROM vt GROUP BY {group_col}),
inter AS (
  SELECT a.{group_col} AS s1, b.{group_col} AS s2, COUNT(*) AS n_shared
  FROM vt a JOIN vt b USING (token)
  WHERE a.{group_col} < b.{group_col}
  GROUP BY 1, 2
)
SELECT i.s1, i.s2, i.n_shared, sa.n AS n1, sb.n AS n2,
       ROUND(i.n_shared / (sa.n + sb.n - i.n_shared)::DOUBLE, 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.{group_col} = i.s1
JOIN sizes sb ON sb.{group_col} = i.s2
ORDER BY i.s1, i.s2
"""


def dedup_rates(ds: rd.Dataset, group_col: str = "source",
                text_col: str = "text", buckets: int = 32) -> pa.Table:
    """Per-source duplication diagnostics — the dashboard number a
    curation run checks BEFORE paying for a full dedup pass: doc count,
    EXACT distinct-fingerprint count, and the duplicate rate.

    Shape: per-batch (group, fingerprint) DISTINCT partials collapse each
    block before the shuffle; a fingerprint-bucketed global dedup gives
    the exact distinct count (same machinery as dataset_stats' distinct
    docs — never an all-pairs or a full-row shuffle); doc counts ride the
    same partials. Output (group, n_docs, n_unique, dup_rate)."""
    from collections import Counter

    from ..pipelines.reports import bucketed_agg, bucketed_groups
    from .text import fingerprint

    def partial(batch: pa.Table) -> pa.Table:
        gs = batch.column(group_col).to_pylist()
        fps = [fingerprint(t)
               for t in batch.column(text_col).to_pylist()]
        pair_counts = Counter(zip(gs, fps))
        g2, f2, n2 = [], [], []
        for (g, f), n in pair_counts.items():
            g2.append(g)
            f2.append(f)
            n2.append(n)
        return pa.table({group_col: pa.array(g2, pa.string()),
                         "fingerprint": pa.array(f2, pa.string()),
                         "n": pa.array(n2, pa.int64())})

    # global (group, fp, total n) — bucketed by fp so each pair lands once
    merged = bucketed_agg(
        ds.select_columns([group_col, text_col])
        .map_batches(partial, batch_format="pyarrow"),
        [group_col, "fingerprint"], {"n": ("n", "sum")},
        bucket_on="fingerprint")

    def per_group(df):
        return df.groupby(group_col, as_index=False).agg(
            n_docs=("n", "sum"), n_unique=("fingerprint", "size"))

    out = bucketed_groups(merged, group_col, per_group,
                          buckets=buckets).to_pandas()
    out = out.groupby(group_col, as_index=False).sum(numeric_only=True)
    # half-away at 6 dp matching DuckDB ROUND (pandas .round is
    # half-even and diverges on exact .5e-6 ratio boundaries)
    out["dup_rate"] = np.floor(
        (1.0 - out["n_unique"] / out["n_docs"]) * 1e6 + 0.5) / 1e6
    out = out.sort_values(group_col).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_rates_sql(table: str = "documents", group_col: str = "source",
                    text_col: str = "text") -> str:
    from .text import FINGERPRINT_SQL
    fp = FINGERPRINT_SQL.format(col=text_col)
    return f"""
SELECT {group_col},
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT {fp})::BIGINT AS n_unique,
       ROUND(1.0 - COUNT(DISTINCT {fp}) / COUNT(*)::DOUBLE, 6)
         AS dup_rate
FROM {table}
GROUP BY {group_col}
ORDER BY {group_col}
"""


def source_divergence(ds: rd.Dataset, group_col: str = "source",
                      text_col: str = "text", min_count: int = 5,
                      buckets: int = 32) -> pd.DataFrame:
    """Per-source KL divergence from the corpus token distribution —
    the mixture-drift diagnostic (how far each source's unigram
    distribution sits from the blend it contributes to; spikes flag
    sources that need their own mixture weight or a closer look).

    Definition (engine-portable, mirrored exactly by the twin): over
    the bounded vocabulary V = {token : corpus count ≥ min_count},
    with add-1 smoothing, p_s(t) = (c_st + 1)/(T_s + |V|) and
    q(t) = (c_t + 1)/(T + |V|); KL(p_s‖q) = Σ_{t∈V} p_s(t)·(ln p_s(t)
    − ln q(t)) — INCLUDING the zero-count terms of V, which this
    implementation folds in closed form (p₀·(n_absent·ln p₀ −
    Σ_absent ln q)) instead of materializing the source × V grid the
    SQL twin writes out. Final value half-away-rounded at 6 dp (the
    repo's float-sum precedent from lm scoring: sub-1e-12 cross-engine
    sum-order noise vs a 1e-6 grid).

    Scale shape: (source, token) count partials → ONE token-bucketed
    reduce feeds both the per-source table and the corpus table; the
    min_count cut bounds V (the same bounded-vocab discipline as
    tfidf/lm); per-source totals are a sources-sized broadcast; the
    per-term scoring pass and the two Σln q reductions stay
    distributed. Output: (source, n_tokens, kl) sorted by source."""
    import math

    from ..pipelines.reports import bucketed_agg, hash_join

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from .lm import _TOKEN_RE
        c: "Counter" = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for tok in _TOKEN_RE.findall((t or "").lower()):
                c[(g, tok)] += 1
        ks = list(c.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "token": pa.array([k[1] for k in ks], pa.string()),
            "c": pa.array([int(c[k]) for k in ks], pa.int64())})

    st = bucketed_agg(
        ds.select_columns([group_col, text_col])
        .map_batches(count_partial, batch_format="pyarrow"),
        [group_col, "token"], {"c": ("c", "sum")},
        bucket_on="token", buckets=buckets).materialize()

    ct = bucketed_agg(st, "token", {"c": ("c", "sum")},
                      buckets=buckets)
    vocab = ct.map_batches(
        lambda df: df[df["c"] >= min_count], batch_format="pandas") \
        .materialize()
    nv = float(vocab.count())
    if nv == 0:
        return pd.DataFrame({group_col: [], "n_tokens": [], "kl": []})
    tt = float(vocab.sum("c"))

    def lnq(df):
        q = (df["c"].to_numpy(dtype="float64") + 1.0) / (tt + nv)
        return df.assign(lnq=np.log(q))[["token", "lnq"]]

    lnq_tbl = vocab.map_batches(lnq, batch_format="pandas") \
        .materialize()
    sum_lnq_all = float(lnq_tbl.sum("lnq"))

    # per-source totals over V + present-term joins (both V-bounded)
    stv = hash_join(st, lnq_tbl, key="token")
    per_src = bucketed_agg(
        stv.map_batches(
            lambda df: df.groupby(group_col, as_index=False).agg(
                t_s=("c", "sum"), n_present=("token", "size"),
                sum_lnq_present=("lnq", "sum")),
            batch_format="pandas"),
        group_col, {"t_s": ("t_s", "sum"),
                    "n_present": ("n_present", "sum"),
                    "sum_lnq_present": ("sum_lnq_present", "sum")}) \
        .to_pandas()
    totals = dict(zip(per_src[group_col], per_src["t_s"]))

    def present_contrib(df):
        ts = df[group_col].map(totals).to_numpy(dtype="float64")
        p = (df["c"].to_numpy(dtype="float64") + 1.0) / (ts + nv)
        term = p * (np.log(p) - df["lnq"].to_numpy(dtype="float64"))
        return pd.DataFrame({group_col: df[group_col], "kl_part": term})

    present = bucketed_agg(
        stv.map_batches(present_contrib, batch_format="pandas"),
        group_col, {"kl_part": ("kl_part", "sum")}).to_pandas()

    out = per_src.merge(present, on=group_col)
    kl = []
    for _, r in out.iterrows():
        p0 = 1.0 / (float(r["t_s"]) + nv)
        n_absent = nv - float(r["n_present"])
        absent = p0 * (n_absent * math.log(p0)
                       - (sum_lnq_all - float(r["sum_lnq_present"])))
        kl.append(math.floor((float(r["kl_part"]) + absent) * 1e6
                             + 0.5) / 1e6)
    res = pd.DataFrame({group_col: out[group_col],
                        "n_tokens": out["t_s"].astype("int64"),
                        "kl": kl})
    return res.sort_values(group_col).reset_index(drop=True)


def source_divergence_sql(min_count: int = 5, table: str = "documents",
                          group_col: str = "source",
                          col: str = "text") -> str:
    """DuckDB twin of :func:`source_divergence`: materializes the
    source × V grid with zero fills (what the engine folds in closed
    form) — identical smoothing and 6-dp half-away final rounding."""
    return f"""
WITH toks AS (
  SELECT {group_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table}
), stc AS (
  SELECT {group_col}, tok, count(*)::DOUBLE AS c FROM toks
  GROUP BY {group_col}, tok
), ctv AS (
  SELECT tok, sum(c) AS c FROM stc GROUP BY tok
  HAVING sum(c) >= {min_count}
), consts AS (
  SELECT (SELECT count(*)::DOUBLE FROM ctv) AS nv,
         (SELECT sum(c) FROM ctv) AS tt
), srcs AS (
  SELECT DISTINCT {group_col} FROM stc JOIN ctv USING (tok)
), grid AS (
  SELECT s.{group_col}, v.tok, v.c AS cq, coalesce(stc.c, 0) AS c
  FROM srcs s
  CROSS JOIN ctv v
  LEFT JOIN stc ON stc.{group_col} = s.{group_col}
              AND stc.tok = v.tok
), ts AS (
  SELECT {group_col}, sum(c) AS t_s FROM grid GROUP BY {group_col}
), term AS (
  SELECT g.{group_col},
         ((g.c + 1.0) / (ts.t_s + consts.nv))
         * (ln((g.c + 1.0) / (ts.t_s + consts.nv))
            - ln((g.cq + 1.0) / (consts.tt + consts.nv))) AS kl_term
  FROM grid g
  JOIN ts USING ({group_col})
  CROSS JOIN consts
)
SELECT t.{group_col},
       CAST(ts.t_s AS BIGINT) AS n_tokens,
       floor(sum(t.kl_term) * 1000000.0 + 0.5) / 1000000.0 AS kl
FROM term t JOIN ts USING ({group_col})
GROUP BY t.{group_col}, ts.t_s
ORDER BY t.{group_col}"""


def quality_percentiles(ds: rd.Dataset, id_col: str = "doc_id",
                        source_col: str = "source",
                        text_col: str = "text",
                        buckets: int = 32) -> rd.Dataset:
    """Per-source percent-rank normalization of the quality score — the
    calibration step that makes quality gates comparable ACROSS sources
    (a 0.6 from a boilerplate-heavy source and a 0.6 from curated prose
    mean different things; their percentiles don't).

    Distributed shape: quality is 6-dp rounded in [0, 1], so the
    per-source (value → count-below) CDF is histogram-sized (≤ 10^6+1
    entries per source) regardless of corpus size. One (source, quality,
    count) shuffle builds the CDFs; they broadcast through the closure
    and a stateless ``map_batches`` emits each row's percentile — no
    per-row shuffle, the corpus streams through once more.

    pct_rank(v) = |{quality < v}| / (n_s − 1) — PERCENT_RANK's exact
    definition (ties share the minimum rank); 0.0 for single-row
    sources, floor(x·1e6+0.5)/1e6-rounded. Returns a Dataset of
    (doc_id, source, quality, pct_rank)."""
    import math
    from collections import Counter

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
        out_s, out_q, out_p = [], [], []
        for s, sub in df.groupby("source", sort=False):
            h = (sub.groupby("__q", sort=True)["__cnt"].sum()
                 .reset_index())
            below = h["__cnt"].cumsum().shift(fill_value=0).to_numpy()
            n = int(h["__cnt"].sum())
            for q, b in zip(h["__q"], below):
                p = float(b) / (n - 1) if n > 1 else 0.0
                out_s.append(s)
                out_q.append(q)
                out_p.append(math.floor(p * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({"source": out_s, "__q": out_q, "p": out_p})

    cdf_df = bucketed_groups(
        scored.map_batches(hist_partial, batch_format="pyarrow"),
        "source", per_source, buckets=buckets).to_pandas()
    cdf: dict = {}
    for s, sub in cdf_df.groupby("source"):
        cdf[s] = dict(zip(sub["__q"], sub["p"]))

    def label(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        qs = batch.column("quality").to_pylist()
        return batch.append_column("pct_rank", pa.array(
            [cdf[s][q] for s, q in zip(srcs, qs)], pa.float64()))

    return scored.map_batches(label, batch_format="pyarrow")


def quality_percentiles_sql(table: str = "documents",
                            id_col: str = "doc_id",
                            source_col: str = "source",
                            col: str = "text") -> str:
    """DuckDB twin: identical quality formula, PERCENT_RANK per source,
    identical floor rounding."""
    from .text import QUALITY_SQL
    q = QUALITY_SQL.format(col=col)
    return f"""
WITH s AS (
  SELECT {id_col} AS doc_id, {source_col} AS source, {q} AS quality
  FROM {table})
SELECT doc_id, source, quality,
       floor(PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality)
             * 1e6 + 0.5) / 1e6 AS pct_rank
FROM s ORDER BY doc_id"""


def ngram_diversity(ds: rd.Dataset, ns: tuple = (1, 2, 3),
                    group_col: str = "source", text_col: str = "text",
                    buckets: int = 32) -> pd.DataFrame:
    """Per-source n-gram diversity (distinct / total n-gram occurrences
    for n = 1..3) — the self-BLEU-class repetitiveness diagnostic: a
    source whose trigram diversity collapses is template spam no matter
    how good its per-doc quality scores look. N-grams never cross
    document boundaries.

    Shape: per-batch DISTINCT (group, n, gram) partials → gram-bucketed
    global dedup → a |sources|·|ns|-sized count; totals come from a
    separate arithmetic-only partial (len − n + 1 per doc) that ships
    |sources|·|ns| rows per block. The all-to-all carries distinct grams
    once — the same discipline as ``source_vocab_overlap``, with the
    count-vs-distinct split keeping the heavy stream narrow."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..pipelines.reports import bucketed_groups
    from .lm import _TOKEN_RE

    def distinct_partial(batch: pa.Table) -> pa.Table:
        seen = set()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = _TOKEN_RE.findall((t or "").lower())
            for n in ns:
                for i in range(len(toks) - n + 1):
                    seen.add((g, n, " ".join(toks[i:i + n])))
        gs, nn, gr = zip(*seen) if seen else ((), (), ())
        return pa.table({group_col: pa.array(list(gs), pa.string()),
                         "n": pa.array(list(nn), pa.int64()),
                         "gram": pa.array(list(gr), pa.string())})

    def total_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            k = len(_TOKEN_RE.findall((t or "").lower()))
            for n in ns:
                c[(g, n)] += max(k - n + 1, 0)
        ks = list(c.keys())
        return pa.table({group_col: pa.array([k[0] for k in ks],
                                             pa.string()),
                         "n": pa.array([k[1] for k in ks], pa.int64()),
                         "t": pa.array([c[k] for k in ks], pa.int64())})

    src = ds.select_columns([group_col, text_col])
    distinct = bucketed_groups(
        src.map_batches(distinct_partial, batch_format="pyarrow"),
        "gram", lambda df: df.drop_duplicates([group_col, "n", "gram"]),
        buckets=buckets) \
        .groupby([group_col, "n"]).count().to_pandas() \
        .rename(columns={"count()": "distinct_ngrams"})
    totals = src.map_batches(total_partial, batch_format="pyarrow") \
        .groupby([group_col, "n"]) \
        .aggregate(Sum("t", alias_name="total_ngrams")).to_pandas()
    out = distinct.merge(totals, on=[group_col, "n"])
    out["distinct_ngrams"] = out["distinct_ngrams"].astype("int64")
    out["total_ngrams"] = out["total_ngrams"].astype("int64")
    out["diversity"] = [
        math.floor(d / t * 1e6 + 0.5) / 1e6 if t else 0.0
        for d, t in zip(out["distinct_ngrams"], out["total_ngrams"])]
    return out.sort_values([group_col, "n"]).reset_index(drop=True)


def ngram_diversity_sql(table: str = "documents", ns: tuple = (1, 2, 3),
                        group_col: str = "source",
                        col: str = "text") -> str:
    """DuckDB twin: positional n-grams via generate_series + list slice
    (the bigram_lm idiom), distinct vs total split, identical floor
    rounding."""
    per_n = []
    for n in ns:
        per_n.append(f"""
SELECT {group_col} AS source, {n} AS n,
       array_to_string(ts[p : p + {n} - 1], ' ') AS gram
FROM (SELECT {group_col}, ts,
             unnest(generate_series(1, greatest(len(ts) - {n} + 1, 0)))
                 AS p
      FROM __tok)""")
    grams = " UNION ALL ".join(per_n)
    tot_n = " UNION ALL ".join(
        f"SELECT {group_col} AS source, {n} AS n, "
        f"greatest(len(ts) - {n} + 1, 0) AS t FROM __tok" for n in ns)
    return f"""
WITH __tok AS (
  SELECT {group_col}, regexp_extract_all(lower({col}), '\\w+') AS ts
  FROM {table}),
__g AS ({grams}),
__d AS (SELECT source, n, COUNT(DISTINCT gram)::BIGINT AS distinct_ngrams
        FROM __g GROUP BY source, n),
__t AS (SELECT source, n, SUM(t)::BIGINT AS total_ngrams
        FROM ({tot_n}) GROUP BY source, n)
SELECT d.source, d.n, d.distinct_ngrams, t.total_ngrams,
       CASE WHEN t.total_ngrams = 0 THEN 0.0
            ELSE floor(d.distinct_ngrams / t.total_ngrams::DOUBLE
                       * 1e6 + 0.5) / 1e6 END AS diversity
FROM __d d JOIN __t t ON d.source = t.source AND d.n = t.n
ORDER BY d.source, d.n"""


def vocab_growth(ds: rd.Dataset, points: int = 10,
                 group_col: str = "source", id_col: str = "doc_id",
                 text_col: str = "text",
                 buckets: int = 32) -> pd.DataFrame:
    """Heaps-law vocabulary-growth curve per source: distinct-token
    vocabulary size after streaming the first 1/points, 2/points, ...
    of the id-ordered corpus. Sublinear growth is healthy natural text;
    a flat curve means template spam (the vocabulary saturates), a
    linear one means noise/serial-number text — the corpus-level
    complement to the per-doc ``lexical_stats`` gauge, and the signal
    that decides whether more crawl yields more language.

    Distributed shape — NO ranks, NO sort: the k-th curve point is the
    id threshold t_k = (k * (max_id + 1)) // points (integer-exact on
    both sides), "vocabulary at t_k" = |{tokens: first_id < t_k}| where
    first_id = min doc id per (source, token). First-ids reduce via
    per-batch min partials into a token-bucketed exact min (the only
    all-to-all, carrying one row per distinct (source, token) per
    block); the curve itself is a ≤ |sources|·points-row aggregate of
    arithmetic-only partials. Returns (source, k, threshold, n_docs,
    vocab) for (source, k) cells with ≥1 doc in the prefix."""
    from collections import Counter

    from .lm import _TOKEN_RE
    from ..pipelines.reports import bucketed_agg

    max_id = int(ds.max(id_col))
    thresholds = [(k * (max_id + 1)) // points
                  for k in range(1, points + 1)]

    src = ds.select_columns([group_col, id_col, text_col])

    def first_partial(batch: pa.Table) -> pa.Table:
        best: dict = {}
        for g, i, t in zip(batch.column(group_col).to_pylist(),
                           batch.column(id_col).to_pylist(),
                           batch.column(text_col).to_pylist()):
            for tok in set(_TOKEN_RE.findall((t or "").lower())):
                key = (g, tok)
                if key not in best or i < best[key]:
                    best[key] = i
        ks = list(best.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "tok": pa.array([k[1] for k in ks], pa.string()),
            "mid": pa.array([best[k] for k in ks], pa.int64())})

    firsts = bucketed_agg(
        src.map_batches(first_partial, batch_format="pyarrow"),
        [group_col, "tok"], {"mid": ("mid", "min")}, bucket_on="tok",
        buckets=buckets)

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, th in enumerate(thresholds, 1):
            c = df.loc[df["mid"] < th].groupby(group_col).size()
            if len(c):
                rows.append(pd.DataFrame({group_col: c.index, "k": k,
                                          "v": c.to_numpy()}))
        if not rows:
            return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                                 "k": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    vocab = firsts.map_batches(vocab_partial, batch_format="pandas") \
        .to_pandas().groupby([group_col, "k"], as_index=False)["v"].sum()

    def docs_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, i in zip(batch.column(group_col).to_pylist(),
                        batch.column(id_col).to_pylist()):
            for k, th in enumerate(thresholds, 1):
                if i < th:
                    c[(g, k)] += 1
        ks = list(c.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "k": pa.array([k[1] for k in ks], pa.int64()),
            "nd": pa.array([c[k] for k in ks], pa.int64())})

    ndocs = src.select_columns([group_col, id_col]) \
        .map_batches(docs_partial, batch_format="pyarrow") \
        .to_pandas().groupby([group_col, "k"], as_index=False)["nd"].sum()

    out = ndocs.merge(vocab, on=[group_col, "k"], how="left")
    out["vocab"] = out["v"].fillna(0).astype("int64")
    out["n_docs"] = out["nd"].astype("int64")
    out["k"] = out["k"].astype("int64")
    out["threshold"] = [thresholds[k - 1] for k in out["k"]]
    out["threshold"] = out["threshold"].astype("int64")
    return (out[[group_col, "k", "threshold", "n_docs", "vocab"]]
            .sort_values([group_col, "k"]).reset_index(drop=True))


def vocab_growth_sql(table: str = "documents", points: int = 10,
                     group_col: str = "source", id_col: str = "doc_id",
                     col: str = "text") -> str:
    """DuckDB twin of ``vocab_growth``: identical integer thresholds
    ((k*(max_id+1)) // points), min-first-id per (source, token) via
    the repo's \\w+ tokenizer parity, curve via threshold joins."""
    return f"""
WITH __mx AS (SELECT max({id_col}) AS m FROM {table}),
__th AS (SELECT k, (k * (m + 1)) // {points} AS th
         FROM (SELECT unnest(generate_series(1, {points})) AS k), __mx),
__ft AS (
  SELECT {group_col} AS source, tok, min({id_col}) AS mid
  FROM (SELECT {group_col}, {id_col},
               unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
        FROM {table})
  GROUP BY 1, 2),
__v AS (SELECT f.source, t.k, count(*)::BIGINT AS vocab
        FROM __ft f JOIN __th t ON f.mid < t.th GROUP BY 1, 2),
__d AS (SELECT d.{group_col} AS source, t.k, t.th,
               count(*)::BIGINT AS n_docs
        FROM {table} d JOIN __th t ON d.{id_col} < t.th GROUP BY 1, 2, 3)
SELECT d.source, d.k::BIGINT AS k, d.th::BIGINT AS threshold, d.n_docs,
       coalesce(v.vocab, 0)::BIGINT AS vocab
FROM __d d LEFT JOIN __v v ON d.source = v.source AND d.k = v.k
ORDER BY d.source, d.k"""
