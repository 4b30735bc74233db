"""TF-IDF top-terms per document (keyword extraction for corpus cards).

The standard curation companion to dataset stats: surface each document's
most characteristic terms (tf × ln(N/df)). Distribution shape mirrors
lm.py's two passes:

1. **df pass** — per-batch, each document contributes its DISTINCT terms
   once; a Counter over the batch collapses those to (term, partial_df)
   before the shuffle, so the ``groupby(term).sum`` moves batch-vocab
   rows, never the token stream. N is one ``count()``.
2. **score pass** — the df table broadcasts once via ``ray.put``
   (vocab-sized; a min-df cut bounds it at 100 TB, same discipline as the
   LM vocabulary) and one stateless ``map_batches`` emits each document's
   top-k rows.

Ranking is by (round(tfidf, 6) DESC, term ASC): rounding before ranking
makes the order reproducible across engines (raw float logs can differ in
the last ulp between libm and DuckDB).
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .lm import _TOKEN_RE


def tfidf_top_terms(ds: rd.Dataset, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """(id, rank, term, tf, df, tfidf) — top-k terms per document."""
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(set(_TOKEN_RE.findall((t or "").lower())))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg
    df_tbl = bucketed_agg(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        "term", {"df": ("df", "sum")}).to_pandas()
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
