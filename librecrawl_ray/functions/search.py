"""Distributed inverted index + boolean search over the documents table.

The scale shape of full-text retrieval over a 100-TB corpus: build the
postings ONCE as a token-hash-partitioned parquet layout, then answer
each conjunctive query by reading ONLY the partitions that can contain
the query's terms — the index read is O(query terms' postings), never a
corpus scan.

Build (one pass + one bounded shuffle):
  per-batch term-frequency partials collapse each block to its distinct
  (token, doc) pairs with counts BEFORE the shuffle — the same
  massive-reduction-first discipline as lm.train_unigram_lm — then the
  pairs hash-partition by token into ``buckets`` directories
  (``bucket=K/``). Every posting for a token lands in exactly one
  bucket, so a bucket is a self-contained shard of the index. Buckets
  are the write-parallelism AND resume unit (a failed build reruns only
  missing bucket dirs).

Search (conjunctive / AND semantics):
  hash the query terms → the ≤len(terms) buckets that can hold them →
  ``read_parquet`` on those directories only, with a row-level
  ``pc.is_in`` term filter → one small groupby(doc) counting distinct
  matched terms; docs matching all terms survive, ranked by summed term
  frequency. The reduce state is bounded by the matched postings, not
  the corpus.

No reference twin: LibreCrawl has no search surface; this is one of the
round-prompt's beyond-reference training-data/retrieval operators. The
DuckDB oracle recomputes the same conjunctive query corpus-side (UNNEST
→ HAVING COUNT(DISTINCT term) = n), verifying the index path end to end.
"""

from __future__ import annotations

import os
import zlib
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .lm import _TOKEN_RE

__all__ = ["build_inverted_index", "boolean_search", "boolean_search_sql",
           "bm25_search", "bm25_search_sql"]


def _token_bucket(token: str, buckets: int) -> int:
    """Stable token → bucket hash (crc32, engine-independent)."""
    return zlib.crc32(token.encode()) % buckets


def build_inverted_index(ds: rd.Dataset, out_dir: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         buckets: int = 32) -> str:
    """One streaming pass → ``out_dir/bucket=K/*.parquet`` postings
    (token, doc id, tf). Returns ``out_dir``."""
    def tf_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for tok, n in Counter(
                    _TOKEN_RE.findall((t or "").lower())).items():
                c[(tok, i)] += n
        toks, ids, tfs, bks = [], [], [], []
        for (tok, i), n in c.items():
            toks.append(tok)
            ids.append(i)
            tfs.append(n)
            bks.append(_token_bucket(tok, buckets))
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, pa.int64()),
                         "tf": pa.array(tfs, pa.int64()),
                         "bucket": pa.array(bks, pa.int32())})

    (ds.select_columns([id_col, text_col])
     .map_batches(tf_partial, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))

    # doc-length sidecar for BM25 (each doc is one input row, so
    # per-batch lengths are exact — no shuffle); dl=0 docs included so
    # N/avgdl cover the whole corpus
    def dl_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        dls = [len(_TOKEN_RE.findall((t or "").lower()))
               for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dl": pa.array(dls, pa.int64())})

    (ds.select_columns([id_col, text_col])
     .map_batches(dl_partial, batch_format="pyarrow")
     .write_parquet(os.path.join(out_dir, "_doclen")))
    return out_dir


def boolean_search(index_dir: str, terms: list[str],
                   id_col: str = "doc_id",
                   buckets: int = 32) -> "pa.Table":
    """Conjunctive search against a built index: docs containing EVERY
    term, with ``total_tf`` = summed term frequency over the query terms
    (the rank key). Reads only the terms' buckets."""
    import pandas as pd

    want = sorted({t.lower() for t in terms})
    dirs = sorted({_token_bucket(t, buckets) for t in want})
    paths = []
    for b in dirs:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    if not paths:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_terms": pa.array([], pa.int64()),
                         "total_tf": pa.array([], pa.int64())})

    from ..pipelines.reports import bucketed_agg

    post = (rd.read_parquet(paths, columns=["token", id_col, "tf"])
            .map_batches(
                lambda b: b.filter(pc.is_in(b.column("token"),
                                            pa.array(want))),
                batch_format="pyarrow"))
    # the index holds per-build-batch partials, so the same (token, doc)
    # may span files: collapse to global postings first (bucketed on the
    # doc id so stage 2 reuses the partitioning), then count terms per
    # doc. Both reduces stay distributed — matched postings for a
    # frequent term are corpus-row-scale and never touch the driver;
    # only the conjunctive survivors do.
    dedup = bucketed_agg(post, ["token", id_col], {"tf": ("tf", "sum")},
                         bucket_on=id_col)
    ones = dedup.map_batches(
        lambda b: b.append_column(
            "one", pa.array([1] * b.num_rows, pa.int64())),
        batch_format="pyarrow")
    per_doc = bucketed_agg(ones, id_col,
                           {"n_terms": ("one", "sum"),
                            "total_tf": ("tf", "sum")})
    g = (per_doc.filter(expr=f"n_terms == {len(want)}")
         .to_pandas()
         .astype({"n_terms": "int64", "total_tf": "int64"})
         .sort_values([id_col]).reset_index(drop=True))
    return pa.Table.from_pandas(g, preserve_index=False)


def bm25_search(index_dir: str, terms: list[str], k: int = 10,
                id_col: str = "doc_id", buckets: int = 32,
                k1: float = 1.2, b: float = 0.75) -> "pa.Table":
    """BM25-ranked disjunctive retrieval against a built index
    (Robertson & Walker; the Lucene idf variant
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``): top-``k`` documents by
    summed per-term BM25 contribution over the query terms.

    Scale shape: reads ONLY the query terms' postings buckets (like
    :func:`boolean_search`); corpus statistics (N, avgdl) come from the
    index's ``_doclen`` sidecar as two scalar aggregates; per-term df is
    a terms-sized reduce; the postings ⋈ doclen join is the adaptive
    hash join; candidate scores reduce per-doc in bucketed groupbys and
    only per-block top-k partials reach the driver.

    Determinism across engines: each (term, doc) contribution is
    half-away-rounded to integer MICRO-units before summation, so the
    per-doc score is an exact int64 sum (float addition order never
    matters); ties rank by doc id. The DuckDB twin mirrors the float
    expression op-for-op."""
    import numpy as np
    import pandas as pd

    from ..pipelines.reports import bucketed_agg, hash_join

    want = sorted({t.lower() for t in terms})
    dirs = sorted({_token_bucket(t, buckets) for t in want})
    paths = []
    for bk in dirs:
        d = os.path.join(index_dir, f"bucket={bk}")
        if os.path.isdir(d):
            paths.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "bm25": pa.array([], pa.float64())})
    if not paths:
        return empty

    doclen = rd.read_parquet(os.path.join(index_dir, "_doclen"))
    n_docs = doclen.count()
    sum_dl = doclen.sum("dl")
    avgdl = float(sum_dl) / float(n_docs)

    post = (rd.read_parquet(paths, columns=["token", id_col, "tf"])
            .map_batches(
                lambda t: t.filter(pc.is_in(t.column("token"),
                                            pa.array(want))),
                batch_format="pyarrow"))
    # collapse per-build-batch partials to global postings, once; both
    # the df reduce and the scoring pass read the materialized result
    dedup = bucketed_agg(post, ["token", id_col], {"tf": ("tf", "sum")},
                         bucket_on=id_col).materialize()

    df_rows = (dedup.groupby("token").count().to_pandas())
    if df_rows.empty:
        return empty
    idf = {t: float(np.log((float(n_docs) - float(c) + 0.5)
                           / (float(c) + 0.5) + 1.0))
           for t, c in zip(df_rows["token"], df_rows["count()"])}

    scored = hash_join(dedup, doclen, key=id_col, how="inner")

    def contrib(pdf: pd.DataFrame) -> pd.DataFrame:
        idf_arr = pdf["token"].map(idf).to_numpy(dtype="float64")
        tf = pdf["tf"].to_numpy(dtype="float64")
        dl = pdf["dl"].to_numpy(dtype="float64")
        denom = tf + k1 * (1 - b + b * dl / avgdl)
        micro = np.floor(idf_arr * tf / denom * 1000000.0 + 0.5) \
            .astype("int64")
        return pd.DataFrame({id_col: pdf[id_col], "micro": micro})

    per_doc = bucketed_agg(
        scored.map_batches(contrib, batch_format="pandas"),
        id_col, {"micro": ("micro", "sum")})

    def topk_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["micro", id_col], ascending=[False, True]).head(k)

    cand = per_doc.map_batches(
        topk_partial, batch_format="pandas").to_pandas()
    top = cand.sort_values(["micro", id_col],
                           ascending=[False, True]).head(k)
    out = pd.DataFrame({
        id_col: top[id_col].to_numpy(),
        "bm25": top["micro"].to_numpy(dtype="float64") / 1000000.0})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def bm25_search_sql(terms: list[str], k: int = 10,
                    table: str = "documents", id_col: str = "doc_id",
                    col: str = "text", k1: float = 1.2,
                    b: float = 0.75) -> str:
    """DuckDB twin of :func:`bm25_search`: same tokenization, same idf
    variant, identical float op order, same micro-unit rounding before
    the per-doc sum."""
    want = sorted({t.lower() for t in terms})
    in_list = ", ".join(f"'{t}'" for t in want)
    return f"""
WITH dl AS (
  SELECT {id_col},
         len(regexp_extract_all(lower({col}), '\\w+'))::BIGINT AS dl
  FROM {table}
), stats AS (
  SELECT count(*)::DOUBLE AS n,
         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM dl
), toks AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table}
), tf AS (
  SELECT {id_col}, tok, count(*)::BIGINT AS tf FROM toks
  WHERE tok IN ({in_list}) GROUP BY {id_col}, tok
), df AS (
  SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok
), contrib AS (
  SELECT tf.{id_col},
         CAST(floor(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf::DOUBLE
           / (tf.tf::DOUBLE
              + {k1} * (1 - {b} + {b} * dl.dl::DOUBLE / stats.avgdl))
           * 1000000.0 + 0.5) AS BIGINT) AS micro
  FROM tf
  CROSS JOIN stats
  JOIN df USING (tok)
  JOIN dl USING ({id_col})
)
SELECT {id_col}, sum(micro)::DOUBLE / 1000000.0 AS bm25
FROM contrib
GROUP BY {id_col}
ORDER BY sum(micro) DESC, {id_col}
LIMIT {k}"""


def boolean_search_sql(terms: list[str], table: str = "documents",
                       id_col: str = "doc_id", col: str = "text") -> str:
    """DuckDB twin: recompute the conjunctive query corpus-side."""
    want = sorted({t.lower() for t in terms})
    in_list = ", ".join(f"'{t}'" for t in want)
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table}
),
hits AS (SELECT {id_col}, tok, COUNT(*) AS tf FROM toks
         WHERE tok IN ({in_list}) GROUP BY {id_col}, tok)
SELECT {id_col},
       COUNT(DISTINCT tok)::BIGINT AS n_terms,
       SUM(tf)::BIGINT AS total_tf
FROM hits
GROUP BY {id_col}
HAVING COUNT(DISTINCT tok) = {len(want)}
ORDER BY {id_col}
"""


def search_snippets(index_dir: str, corpus_parquet: str,
                    terms: list[str], width: int = 40,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> "pd.DataFrame":
    """KWIC result snippets: for every conjunctive-search survivor, the
    ±``width``-character window around the FIRST occurrence of the first
    query term — the result-page surface a search index ultimately
    serves. The survivor id set comes from the postings buckets
    (``boolean_search``); only survivors' texts are touched, attached
    via the adaptive hash join (never a full-corpus gather).

    Snippet rule (mirrored in SQL, 1-based strpos semantics): pos =
    strpos(lower(text), term); snippet = substr(text,
    max(pos − width, 1), 2·width + len(term)). Character-based on both
    sides."""
    import pandas as pd
    import ray.data as rd

    from ..pipelines.reports import hash_join

    term = sorted({t.lower() for t in terms})[0]
    hits = boolean_search(index_dir, terms, id_col=id_col)
    ids = rd.from_arrow(hits.select([id_col]))
    docs = rd.read_parquet(corpus_parquet, columns=[id_col, text_col])
    joined = hash_join(docs, ids.map_batches(
        lambda df: df.rename(columns={id_col: "__sid"}),
        batch_format="pandas"), key=id_col, right_key="__sid")

    def snip(batch: pa.Table) -> pa.Table:
        ids_out, snips = [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            t = t or ""
            pos = t.lower().find(term) + 1          # 1-based, 0 = absent
            if pos == 0:
                continue
            start = max(pos - width, 1)
            snips.append(t[start - 1:start - 1 + 2 * width + len(term)])
            ids_out.append(i)
        return pa.table({
            id_col: pa.array(ids_out,
                             batch.column(id_col).type),
            "snippet": pa.array(snips, pa.string())})

    out = joined.map_batches(snip, batch_format="pyarrow").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def search_snippets_sql(terms: list[str], table: str = "documents",
                        id_col: str = "doc_id", col: str = "text",
                        width: int = 40) -> str:
    """DuckDB twin of ``search_snippets`` (conjunctive survivors via the
    boolean twin's HAVING shape, then the mirrored strpos/substr rule)."""
    term = sorted({t.lower() for t in terms})[0]
    want = sorted({t.lower() for t in terms})
    inlist = ",".join(f"'{t}'" for t in want)
    return f"""
WITH __tok AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({col}), '\\w+')) AS t
  FROM {table}),
__hits AS (
  SELECT {id_col} FROM __tok WHERE t IN ({inlist})
  GROUP BY {id_col} HAVING count(DISTINCT t) = {len(want)}),
__pos AS (
  SELECT d.{id_col}, d.{col} AS __t,
         strpos(lower(d.{col}), '{term}') AS p
  FROM {table} d JOIN __hits USING ({id_col}))
SELECT {id_col},
       substr(__t, greatest(p - {width}, 1),
              {2 * width + len(term)}) AS snippet
FROM __pos WHERE p > 0 ORDER BY {id_col}"""
