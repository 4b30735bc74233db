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

__all__ = ["curate_corpus", "curate_corpus_sql"]


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
