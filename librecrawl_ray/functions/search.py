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

__all__ = ["build_inverted_index", "boolean_search", "boolean_search_sql"]


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
