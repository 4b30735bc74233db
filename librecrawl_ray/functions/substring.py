"""Exact-substring duplication detection.

The dedup family's missing member: MinHash/SimHash/winnowing find
NEAR-duplicate documents, but LLM training corpora are also polluted by
exact substrings repeated across otherwise-distinct documents
(boilerplate, licenses, templated spans). Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better") detect
these with suffix arrays; the Ray-native shape here is the bucketed
n-gram census: every document's DISTINCT byte n-grams cross ONE
hash-bucketed shuffle, each bucket counts document frequency per gram
with a single vectorized pandas groupby, and per-document duplication
stats come back as bucket-local partials (a gram lives entirely in one
bucket, so partial sums are exact). No all-pairs anywhere; the shuffle
payload is (gram, doc_id) pairs — ~n bytes per text position, the same
order as a token shuffle.

At 100 TB one ships a 64-bit rolling hash instead of the gram bytes
(8 B/position, collision rate ~1e-19 per pair — the Lee et al. trade);
``hash_grams=True`` selects that wire format. The default ships exact
gram bytes so the result is provably exact and matches the DuckDB twin
byte-for-byte.

Grams are BYTE n-grams (fixtures are ASCII so bytes == characters ==
DuckDB ``substr`` semantics; for non-ASCII corpora the twin would use
BLOB substr). Documents shorter than ``n`` have no grams and are absent
from the output, matching the SQL join semantics.

Reference analog: none — LibreCrawl has no substring-level dedup; this
extends the near-dup family (``functions/dedup.py``) per SURVEY §2.7.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# column-position weights for the vectorized 64-bit gram hash (bucketing
# only — correctness never depends on it): powers of the splitmix odd
# multiplier, precomputed per n
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def _gram_hash_coefs(n: int) -> np.ndarray:
    c = np.empty(n, dtype=np.uint64)
    acc = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(n):
            c[i] = acc
            acc = acc * _HASH_MULT
    return c


def _distinct_grams(text: bytes, n: int) -> np.ndarray:
    """All distinct byte n-grams of one document as a sorted (m, n)
    uint8 matrix (np.unique over a void view — one vectorized pass)."""
    buf = np.frombuffer(text, dtype=np.uint8)
    if buf.size < n:
        return np.empty((0, n), dtype=np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(buf, n)
    u = np.unique(np.ascontiguousarray(w).view(f"V{n}"))
    return u.view(np.uint8).reshape(-1, n)


def dup_ngram_stats(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 40,
                    buckets: int = 32,
                    hash_grams: bool = False) -> pa.Table:
    """Per-document exact-substring duplication stats over byte
    ``n``-grams: ``(doc_id, n_grams, n_dup_grams, dup_fraction)`` where
    ``n_grams`` counts the document's DISTINCT n-grams, ``n_dup_grams``
    those that also occur in at least one OTHER document, and
    ``dup_fraction`` their ratio (half-away-rounded at 6 dp, mirroring
    the DuckDB twin's FLOOR(x*1e6+0.5)/1e6).

    Stages (each one shuffle, no driver-resident gram set):
      1. map_batches: per-doc distinct grams (vectorized sliding window
         + void-view unique), emitted as (gram fixed-size-binary, doc_id)
         — or (hash64, doc_id) with ``hash_grams=True``.
      2. bucketed census: hash-bucket by gram, per bucket ONE pandas
         groupby computes each gram's doc frequency and immediately
         reduces to per-doc partials (n_grams, n_dup) — grams never
         leave their bucket.
      3. doc-keyed combine of the narrow partials + the rounded ratio.

    The result is document-row-sized (collected; callers at corpus scale
    keep it as the returned Dataset partials instead)."""
    coefs = _gram_hash_coefs(n)
    gram_type = pa.uint64() if hash_grams else pa.binary(n)

    def extract(batch: pa.Table) -> pa.Table:
        ids_out: list[pa.Array] = []
        grams_out: list[pa.Array] = []
        ids = batch.column(id_col)
        texts = batch.column(text_col)
        for i in range(batch.num_rows):
            t = texts[i].as_py()
            g = _distinct_grams(t.encode("utf-8"), n)
            if not g.shape[0]:
                continue
            if hash_grams:
                with np.errstate(over="ignore"):
                    h = (g.astype(np.uint64) * coefs).sum(
                        axis=1, dtype=np.uint64)
                grams_out.append(pa.array(h, pa.uint64()))
            else:
                grams_out.append(pa.Array.from_buffers(
                    gram_type, g.shape[0],
                    [None, pa.py_buffer(g.tobytes())]))
            ids_out.append(pa.array(
                np.full(g.shape[0], ids[i].as_py(), dtype=np.int64)))
        if not ids_out:
            return pa.table({"gram": pa.array([], gram_type),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.concat_arrays(grams_out),
            "doc_id": pa.concat_arrays(ids_out)})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df["gram"]
        if hash_grams:
            b = g.to_numpy(dtype="uint64", copy=False) % buckets
        else:
            b = pd.util.hash_pandas_object(g, index=False) \
                .to_numpy() % buckets
        return df.assign(__b=b.astype("int32"))

    def census(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (gram, doc) pairs, so per-gram size == the
        # gram's document frequency
        nd = df.groupby("gram", sort=False)["doc_id"].transform("size")
        part = df.assign(__dup=(nd >= 2).to_numpy().astype("int64")) \
            .groupby("doc_id", sort=False, as_index=False) \
            .agg(n_grams=("gram", "size"), n_dup_grams=("__dup", "sum"))
        return part

    partials = (ds.select_columns([id_col, text_col])
                .map_batches(extract, batch_format="pyarrow")
                .map_batches(add_bucket, batch_format="pandas")
                .groupby("__b")
                .map_groups(lambda df: census(df.drop(columns="__b")),
                            batch_format="pandas"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False, as_index=False).agg(
            n_grams=("n_grams", "sum"),
            n_dup_grams=("n_dup_grams", "sum"))
        frac = np.floor(out["n_dup_grams"].to_numpy() * 1e6
                        / out["n_grams"].to_numpy() + 0.5) / 1e6
        return out.assign(dup_fraction=frac)

    def bucket_doc(df: pd.DataFrame) -> pd.DataFrame:
        b = df["doc_id"].to_numpy(dtype="int64", copy=False) % buckets
        return df.assign(__b=b.astype("int32"))

    out = (partials.map_batches(bucket_doc, batch_format="pandas")
           .groupby("__b")
           .map_groups(lambda df: combine(df.drop(columns="__b")),
                       batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def dup_ngram_stats_sql(n: int = 40) -> str:
    """DuckDB twin of :func:`dup_ngram_stats` (exact-gram mode)."""
    return f"""
WITH grams AS (
  SELECT doc_id, substr(text, i::INT, {n}) AS g FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - {n} + 1)) AS i
    FROM documents)
), dg AS (SELECT DISTINCT doc_id, g FROM grams),
c AS (SELECT g, count(*) AS nd FROM dg GROUP BY g)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams,
       floor(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) * 1000000.0
             / count(*) + 0.5) / 1000000.0 AS dup_fraction
FROM dg d JOIN c USING (g)
GROUP BY d.doc_id
ORDER BY d.doc_id"""
