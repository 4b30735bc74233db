"""The flagship training-data curation pipeline: one streaming pass from a
raw document table to a deduplicated, quality-filtered, mixture-sampled
corpus — the end-to-end path a 100-TB pretraining-data build runs.

Stage order (each a Dataset→Dataset transform; the executor pipelines them
with backpressure, nothing materializes):

  1. annotate  — language id + exact-dup fingerprint + repetition signals,
                 ONE map_batches (per-doc work fused so text is scanned
                 once and never leaves the worker)
  2. gate      — keep lang == target and the integer-arithmetic Gopher
                 accept gate (stateless batch filter)
  3. dedup     — keep the min-id row per fingerprint (bucketed hash
                 shuffle of the *narrow* annotated rows — text is dropped
                 before the exchange)
  4. sample    — per-source deterministic md5-threshold mixture sampling
                 (stateless batch filter, no shuffle)

The only all-to-all exchange is stage 3, and it ships ~40 bytes/row.
Every stage is a pure row/group function, so retries and resumed
partitions reproduce identical output; the whole pipeline has an exact
DuckDB twin (``curate_corpus_sql``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..functions import text as T
from ..functions.sampling import MIXTURE_RATE_SQL_CASE, mixture_sample

__all__ = ["curate_corpus", "curate_corpus_sql",
           "curate_corpus_ccnet", "curate_corpus_ccnet_sql",
           "curate_corpus_containment", "curate_corpus_containment_sql"]


def _annotate(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    rows = [T.repetition_stats(t) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "lang_pred": pa.array([T.lang_id(t) for t in texts], pa.string()),
        "fingerprint": pa.array([T.fingerprint(t) for t in texts],
                                pa.string()),
        "n_words": pa.array([r[0] for r in rows], pa.int64()),
        "gopher_pass": pa.array(
            [T.gopher_pass(r[0], r[1], r[2], r[4]) for r in rows],
            pa.int32()),
    })


def curate_corpus(ds: rd.Dataset, lang: str = "en",
                  buckets: int = 32) -> rd.Dataset:
    """documents → curated (doc_id, source, lang_pred, n_words); see
    module docstring for the stage plan."""
    from .reports import bucketed_groups

    ann = (ds.select_columns(["doc_id", "source", "text"])
           .map_batches(_annotate, batch_format="pyarrow")
           .filter(expr=f"lang_pred == '{lang}' and gopher_pass == 1"))

    def keep_min(df):
        out = df.sort_values("doc_id").groupby("fingerprint", sort=False) \
            .head(1)
        return out.drop(columns=["gopher_pass"])

    deduped = bucketed_groups(ann, "fingerprint", keep_min,
                              buckets=buckets) \
        .drop_columns(["fingerprint"])
    return mixture_sample(deduped)


def curate_corpus_sql(table_expr: str = "documents",
                      lang: str = "en") -> str:
    """DuckDB twin of ``curate_corpus`` (same stage order and keys)."""
    rep = T.repetition_stats_sql(table_expr)
    return f"""
WITH __rep AS ({rep}),
__ann AS (
  SELECT d.doc_id, d.source,
         {T.lang_id_sql('d.text')} AS lang_pred,
         {T.FINGERPRINT_SQL.format(col='d.text')} AS fingerprint,
         r.n_words, r.gopher_pass
  FROM {table_expr} d JOIN __rep r USING (doc_id)),
__pass AS (
  SELECT * FROM __ann
  WHERE lang_pred = '{lang}' AND gopher_pass = 1),
__kept AS (
  SELECT * FROM __pass
  QUALIFY row_number() OVER (PARTITION BY fingerprint
                             ORDER BY doc_id) = 1)
SELECT doc_id, source, lang_pred, n_words
FROM __kept
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {MIXTURE_RATE_SQL_CASE}
ORDER BY doc_id"""


def curate_corpus_ccnet(ds: rd.Dataset, token_budget: int = 20_000,
                        buckets: int = 32) -> rd.Dataset:
    """The CCNet-shaped curation composition (Wenzek et al. 2020):
    LM-quality tertile gate → exact dedup → token-budget mixture — the
    recipe that keeps the BEST two thirds per language instead of
    curate_corpus's hard lang/Gopher gate, then rebalances sources to a
    token budget derived FROM the surviving data.

      1. quality_buckets — per-language head/middle/tail at exact
         lm_score tertiles; drop 'tail' (CCNet trains on head+middle)
      2. join — attach (source, fingerprint) via the adaptive hash join
         (narrow side: id + source + 16-char fp; text never shuffles)
      3. dedup — first-wins min-id per fingerprint (bucketed)
      4. balance — per-source rates min(budget·wₛ/Tₛ, 1) from the KEPT
         rows' token totals (a |sources|-sized aggregate), applied as
         the stateless md5-threshold filter

    Output: (doc_id, source, lang, bucket, n_tokens). Exact DuckDB twin
    in ``curate_corpus_ccnet_sql`` — every stage is deterministic, so
    the whole composition hash-matches.
    """
    from ..functions.lm import quality_buckets
    from ..functions.sampling import _hex8, rate_to_hex
    from .reports import bucketed_agg, bucketed_groups, hash_join

    scored = quality_buckets(ds, buckets=buckets) \
        .filter(expr="bucket != 'tail'")

    def fp_partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "fingerprint": pa.array(
                [T.fingerprint(t)
                 for t in batch.column("text").to_pylist()], pa.string()),
        })

    side = ds.select_columns(["doc_id", "source", "text"]) \
        .map_batches(fp_partial, batch_format="pyarrow")
    joined = hash_join(scored, side, "doc_id", buckets=buckets)

    def keep_min(df):
        return df.sort_values("doc_id") \
            .groupby("fingerprint", sort=False).head(1)

    deduped = bucketed_groups(joined, "fingerprint", keep_min,
                              buckets=buckets) \
        .drop_columns(["fingerprint", "lm_score"])

    def tok_partial(df):
        return df.groupby("source", as_index=False) \
            .agg(t=("n_tokens", "sum"))

    totals = bucketed_agg(
        deduped.map_batches(tok_partial, batch_format="pandas"),
        "source", {"t": ("t", "sum")}, buckets=buckets).to_pandas()
    k = len(totals)
    tmap = dict(zip(totals["source"], totals["t"]))
    thresholds = {
        s: rate_to_hex(min((token_budget * (1.0 / k)) / tmap[s], 1.0))
        for s in tmap}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        mask = [_hex8(str(i)) < thresholds.get(s, "00000000")
                for i, s in zip(ids, srcs)]
        return batch.filter(pa.array(mask, pa.bool_()))

    return deduped.map_batches(keep, batch_format="pyarrow") \
        .select_columns(["doc_id", "source", "lang", "bucket",
                         "n_tokens"])


def curate_corpus_ccnet_sql(table: str = "documents",
                            token_budget: int = 20_000) -> str:
    """DuckDB twin: the quality_buckets CTE chain + fingerprint
    first-wins + the printf-hex rate thresholds, same float-op order."""
    fp = T.FINGERPRINT_SQL.format(col="d.text")
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
  FROM {table}
),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c)::DOUBLE AS total FROM counts),
doc_tok AS (SELECT doc_id, lang, tok, COUNT(*) AS n FROM toks
            GROUP BY doc_id, lang, tok),
scored AS (
  SELECT dt.doc_id, dt.lang,
         SUM(dt.n)::BIGINT AS n_tokens,
         ROUND(SUM(dt.n * LN(c.c)) / SUM(dt.n) - LN(t.total), 4)
           AS lm_score
  FROM doc_tok dt JOIN counts c USING (tok) CROSS JOIN tot t
  GROUP BY dt.doc_id, dt.lang, t.total
),
th AS (
  SELECT lang,
         quantile_disc(lm_score, 1.0/3) AS q1,
         quantile_disc(lm_score, 2.0/3) AS q2
  FROM scored GROUP BY lang
),
labeled AS (
  SELECT s.doc_id, s.lang, s.n_tokens,
         CASE WHEN s.lm_score <= th.q1 THEN 'tail'
              WHEN s.lm_score <= th.q2 THEN 'middle'
              ELSE 'head' END AS bucket
  FROM scored s JOIN th USING (lang)
),
keep AS (
  SELECT l.doc_id, d.source, l.lang, l.bucket, l.n_tokens,
         {fp} AS fingerprint
  FROM labeled l JOIN {table} d USING (doc_id)
  WHERE l.bucket <> 'tail'
),
kept AS (
  SELECT * FROM keep
  QUALIFY row_number() OVER (PARTITION BY fingerprint
                             ORDER BY doc_id) = 1
),
tot2 AS (SELECT source, SUM(n_tokens)::BIGINT AS t FROM kept
         GROUP BY source),
k2 AS (SELECT COUNT(*)::DOUBLE AS k FROM tot2),
thr AS (
  SELECT source,
         printf('%08x', CAST(FLOOR(LEAST(
             LEAST(({token_budget} * (1.0 / k2.k)) / t, 1.0)
             * 4294967296.0, 4294967295.0)) AS BIGINT)) AS th
  FROM tot2 CROSS JOIN k2
)
SELECT kept.doc_id, kept.source, kept.lang, kept.bucket, kept.n_tokens
FROM kept JOIN thr USING (source)
WHERE substr(md5(CAST(kept.doc_id AS VARCHAR)), 1, 8) < thr.th
ORDER BY kept.doc_id
"""


def curate_corpus_containment(ds: rd.Dataset, threshold: float = 0.5,
                              prefix: int | None = 512,
                              buckets: int = 32) -> rd.Dataset:
    """Containment-gated curation: drop every document whose winnowing
    sketch is >= threshold contained in another document's sketch — the
    quoted-copy / article-plus-boilerplate signal (Lee et al. 2022) that
    symmetric near-dup gates miss, composed into a corpus filter.

    Drop rule (deterministic, order-free): a document ``a`` is dropped
    iff some directed pair (a contained-in b) passed the threshold AND
    NOT (b is also contained in a with a < b). Strictly-contained docs
    always drop; mutually-contained (near-identical) groups keep the
    smallest doc_id; containment chains a⊂b⊂c keep only the outermost.

    Scale shape: the pair detection is ``containment_pairs`` (fp-bucketed
    shuffle of narrow sketch rows — text never moves); the surviving
    pair table is near-dup-pair-sized (bounded, same budget as
    ``neardup_clusters``'s union-find input), and the resulting drop set
    is id-only, broadcast ONCE via ``ray.put`` and applied as a
    stateless ``pc.is_in`` batch filter — the ``incremental_dedup``
    broadcast-set shape. At 10^10-drop scale the broadcast becomes a
    bucketed anti-join on doc_id ranges; the broadcast form is exact and
    right whenever the drop set fits a worker heap (~10^8 ids).
    """
    import pyarrow.compute as pc
    import ray

    from ..functions.dedup import containment_pairs

    pairs = containment_pairs(ds, threshold=threshold, prefix=prefix,
                              buckets=buckets)
    pairset = set(zip(pairs.column("id_a").to_pylist(),
                      pairs.column("id_b").to_pylist()))
    drops = sorted({a for (a, b) in pairset
                    if (b, a) not in pairset or b < a})
    ref = ray.put(pa.array(drops, pa.int64()))

    def gate(batch: pa.Table) -> pa.Table:
        drop_arr = ray.get(ref)
        return batch.filter(pc.invert(
            pc.is_in(batch.column("doc_id"), value_set=drop_arr)))

    return ds.select_columns(["doc_id", "source", "lang"]) \
        .map_batches(gate, batch_format="pyarrow")


def curate_corpus_containment_sql(table: str = "documents",
                                  threshold: float = 0.5,
                                  prefix: int = 512) -> str:
    """DuckDB twin: the containment_pairs CTE chain, the same drop rule
    as an anti-join, projected to (doc_id, source, lang)."""
    from ..functions.text import winnow_fps_cte
    return f"""
WITH fps AS MATERIALIZED ({winnow_fps_cte(table, prefix=prefix)}),
flat AS (SELECT doc_id, unnest(fp) AS f FROM fps),
sizes AS (SELECT doc_id, len(fp)::BIGINT AS sz FROM fps),
sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       FROM flat a JOIN flat b ON a.f = b.f AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
bidi AS (SELECT id_a, id_b, shared FROM sh
         UNION ALL SELECT id_b, id_a, shared FROM sh),
pairs AS MATERIALIZED (
  SELECT b.id_a, b.id_b
  FROM bidi b JOIN sizes s ON s.doc_id = b.id_a
  WHERE b.shared / s.sz::DOUBLE >= {threshold}),
drops AS (
  SELECT DISTINCT p.id_a
  FROM pairs p
  LEFT JOIN pairs q ON q.id_a = p.id_b AND q.id_b = p.id_a
  WHERE q.id_a IS NULL OR p.id_b < p.id_a)
SELECT d.doc_id, d.source, d.lang
FROM {table} d
WHERE d.doc_id NOT IN (SELECT id_a FROM drops)
ORDER BY d.doc_id
"""
