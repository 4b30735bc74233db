"""TF-IDF top-terms per document (keyword extraction for corpus cards).

The standard curation companion to dataset stats: surface each document's
most characteristic terms (tf × ln(N/df)). Distribution shape mirrors
lm.py's two passes:

1. **df pass** — per-batch, each document contributes its DISTINCT terms
   once; a Counter over the batch collapses those to (term, partial_df)
   before the shuffle, so the ``groupby(term).sum`` moves batch-vocab
   rows, never the token stream. N is one ``count()``.
2. **score pass** — two exact strategies, selected by MEASURED vocabulary
   size (the df table is materialized and counted, never guessed):

   * vocab ≤ ``max_broadcast_vocab``: the df table broadcasts once via
     ``ray.put`` and one stateless ``map_batches`` emits each document's
     top-k rows — zero shuffle, the fast path for every corpus whose
     vocabulary fits a worker heap.
   * vocab > ``max_broadcast_vocab`` (the 100-TB web-crawl case, where
     the typo/hash-garbage tail pushes raw vocabulary into the billions):
     the (doc, term, tf) stream hash-joins the df table bucketed on
     term, then a bucketed per-doc top-k — no vocab-sized object on the
     driver or in any worker heap, identical output (same tokenizer,
     same round-before-rank), just an extra bounded shuffle.

   TF-IDF cannot take the min-df cut the unigram LM takes: the LOW-df
   terms are exactly the ones that rank top, so the scale path must stay
   exact rather than truncate the vocabulary.

Ranking is by (round(tfidf, 6) DESC, term ASC): rounding before ranking
makes the order reproducible across engines (raw float logs can differ in
the last ulp between libm and DuckDB).
"""


from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .lm import _TOKEN_RE


def tfidf_top_terms(ds: rd.Dataset, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_broadcast_vocab: int | None = 2_000_000,
                    buckets: int = 32) -> rd.Dataset:
    """(id, rank, term, tf, df, tfidf) — top-k terms per document.

    ``max_broadcast_vocab`` bounds the broadcast df table (see module
    docstring); above it the exact bucketed-join path runs instead.
    ``None`` forces the broadcast path regardless of vocabulary size
    (the explicit "I know my vocab fits" escape hatch).
    """
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(set(_TOKEN_RE.findall((t or "").lower())))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg, bucketed_groups, hash_join
    df_ds = bucketed_agg(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        "term", {"df": ("df", "sum")}).materialize()
    if (max_broadcast_vocab is not None
            and df_ds.count() > max_broadcast_vocab):
        return _tfidf_joined(ds, df_ds, n_docs, k, id_col, text_col,
                             buckets, bucketed_groups, hash_join)
    df_tbl = df_ds.to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"])))

    def score(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        ids, ranks, terms, tfs, dfs, scores = [], [], [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            tf = Counter(_TOKEN_RE.findall((t or "").lower()))
            scored = sorted(
                ((round(cnt * math.log(n_docs / df[term]), 6), term, cnt)
                 for term, cnt in tf.items()),
                key=lambda s: (-s[0], s[1]))[:k]
            for r, (sc, term, cnt) in enumerate(scored, start=1):
                ids.append(i)
                ranks.append(r)
                terms.append(term)
                tfs.append(cnt)
                dfs.append(int(df[term]))
                scores.append(sc)
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "tfidf": pa.array(scores, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _tfidf_joined(ds, df_ds, n_docs, k, id_col, text_col, buckets,
                  bucketed_groups, hash_join):
    """Exact scale path: (doc, term, tf) stream ⋈ df table, bucketed on
    term, then bucketed per-doc top-k. Same tokenizer and the same
    Python ``round(x, 6)`` before ranking as the broadcast path, so both
    strategies are bit-identical (pinned by pytest)."""
    import pandas as pd

    def tf_partial(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for term, cnt in Counter(
                    _TOKEN_RE.findall((t or "").lower())).items():
                ids.append(i)
                terms.append(term)
                tfs.append(cnt)
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    tf_ds = ds.map_batches(tf_partial, batch_format="pyarrow")
    joined = hash_join(tf_ds, df_ds, "term", buckets=buckets,
                       broadcast_threshold=0)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        raw = df["tf"].to_numpy(dtype="float64") \
            * np.log(n_docs / df["df"].to_numpy(dtype="float64"))
        df = df.assign(tfidf=[round(v, 6) for v in raw.tolist()])
        df = df.sort_values(["tfidf", "term"],
                            ascending=[False, True], kind="mergesort")
        out = df.groupby(id_col, sort=False).head(k).copy()
        out["rank"] = out.groupby(id_col, sort=False).cumcount() + 1
        return out[[id_col, "rank", "term", "tf", "df", "tfidf"]]

    return bucketed_groups(joined, id_col, topk, buckets=buckets)


def tfidf_sql(table_expr: str = "documents", k: int = 5,
              id_col: str = "doc_id", col: str = "text") -> str:
    """DuckDB twin: identical tokenizer, identical round-before-rank."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({col}), '\\w+')) AS term
  FROM {table_expr}
),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM toks
       GROUP BY {id_col}, term),
df AS (SELECT term, COUNT(DISTINCT {id_col}) AS df FROM toks
       GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM {table_expr}),
scored AS (
  SELECT t.{id_col}, t.term, t.tf, d.df,
         ROUND(t.tf * LN(n.n::DOUBLE / d.df), 6) AS tfidf
  FROM tf t JOIN df d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {id_col}
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT {id_col}, rank, term, tf, df, tfidf
FROM ranked WHERE rank <= {k}
ORDER BY {id_col}, rank
"""
