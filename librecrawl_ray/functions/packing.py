"""Sequence packing and segment-level exact dedup for training pipelines.

Two last-mile pretraining-data operators over a document table:

- ``pack_sequences`` — GPT-style concat-and-chunk packing: documents are
  laid out in a deterministic global order (md5 shuffle key, the same
  order ``sampling.deterministic_shuffle`` uses) and the concatenated
  token stream is cut into fixed-size training sequences; each document
  gets its global ``start_offset`` and the first/last pack (sequence
  index) it lands in. The global prefix sum is computed WITHOUT a
  driver-side pass over rows: the md5-hex key's leading byte is a
  RANGE-ALIGNED bucket (hex prefix order == global key order), so
  per-bucket token sums (a tiny groupby, ≤``buckets`` rows to the driver)
  prefix-sum into per-bucket base offsets, and one ``map_groups`` per
  bucket assigns row offsets by local cumsum + base. At 10^10 docs this
  is the standard two-pass distributed scan: only O(buckets) numbers
  ever funnel through the driver.

- ``segment_dedup`` — exact substring-granularity dedup (the "repeated
  boilerplate" pass of C4/CCNet-style pipelines, at fixed token-window
  granularity instead of lines): every non-overlapping W-token segment
  is fingerprinted (md5) and the corpus-wide FIRST occurrence (min
  (doc_id, seg_idx)) is the keeper; later occurrences are flagged for
  removal. Shuffle ships only (doc_id, seg_idx, fp) — never the text —
  through a fingerprint-bucketed groupby, the same shuffle-lean shape as
  ``winnow_neardup_pairs``.

Both are deliberately SQL-expressible (window cumsum / row_number over
md5 fingerprints) so DuckDB verifies them bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data as rd

from .text import token_count

__all__ = ["pack_sequences", "pack_sequences_sql",
           "segment_dedup", "segment_dedup_sql"]

_SEG_TOKEN_RE = re.compile(r"[a-z0-9]+")


# ---------------------------------------------------------------- packing

def pack_sequences(ds: rd.Dataset, seq_tokens: int = 128,
                   id_col: str = "doc_id", text_col: str = "text",
                   buckets: int = 256) -> rd.Dataset:
    """documents → (doc_id, n_tokens, start_offset, pack_first,
    pack_last) in deterministic md5-shuffle order.

    ``pack_first``/``pack_last`` are the first and last training-sequence
    indices the document's tokens occupy when the shuffled corpus is
    concatenated and cut every ``seq_tokens`` tokens (documents may span
    pack boundaries — concat-and-chunk, not first-fit). An empty document
    occupies no tokens; both packs point at the sequence containing its
    start offset.
    """
    if buckets < 1 or buckets > 65536:
        raise ValueError("buckets must be in [1, 65536]")
    # bucket = leading hex byte(s) of the shuffle key → bucket index order
    # IS global key order, so bucket-level prefix sums are valid bases
    hexdigits = 2 if buckets <= 256 else 4
    space = 16 ** hexdigits

    def annotate(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array([token_count(t) for t in texts],
                                 pa.int64()),
            "__key": pa.array(keys, pa.string()),
            "__bucket": pa.array(
                [int(k[:hexdigits], 16) * buckets // space for k in keys],
                pa.int32()),
        })

    narrow = ds.map_batches(annotate, batch_format="pyarrow")

    # pass 1: per-bucket token totals (≤buckets rows to the driver)
    from ray.data.aggregate import Sum
    totals = {int(r["__bucket"]): int(r["sum(n_tokens)"])
              for r in narrow.groupby("__bucket")
              .aggregate(Sum("n_tokens")).take_all()}
    base, acc = {}, 0
    for b in range(buckets):
        base[b] = acc
        acc += totals.get(b, 0)

    # pass 2: local cumsum per bucket + broadcast base offset
    def assign(df):
        b = int(df["__bucket"].iloc[0])
        df = df.sort_values(["__key", id_col]).reset_index(drop=True)
        cum = df["n_tokens"].cumsum()
        start = base[b] + cum - df["n_tokens"]
        last_tok = start + df["n_tokens"].clip(lower=1) - 1
        out = df[[id_col, "n_tokens"]].copy()
        out["start_offset"] = start.astype("int64")
        out["pack_first"] = (start // seq_tokens).astype("int64")
        out["pack_last"] = (last_tok // seq_tokens).astype("int64")
        return out

    return narrow.groupby("__bucket").map_groups(
        assign, batch_format="pandas")


def pack_sequences_sql(table_expr: str = "documents",
                       seq_tokens: int = 128, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin: window cumsum over the same md5 shuffle order."""
    from .text import TOKEN_COUNT_SQL
    n = TOKEN_COUNT_SQL.format(col=text_col)
    return f"""
WITH __t AS (
  SELECT {id_col}, {n} AS n_tokens,
         md5(CAST({id_col} AS VARCHAR)) AS k
  FROM {table_expr}),
__c AS (
  SELECT {id_col}, n_tokens,
         (sum(n_tokens) OVER (ORDER BY k, {id_col}
            ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
  FROM __t)
SELECT {id_col}, n_tokens, start_offset,
       (start_offset // {seq_tokens})::BIGINT AS pack_first,
       ((start_offset + greatest(n_tokens, 1) - 1)
          // {seq_tokens})::BIGINT AS pack_last
FROM __c ORDER BY start_offset, {id_col}"""


# ----------------------------------------------------------- segment dedup

def segment_dedup(ds: rd.Dataset, segment_tokens: int = 32,
                  id_col: str = "doc_id", text_col: str = "text",
                  buckets: int = 32) -> rd.Dataset:
    """documents → (doc_id, seg_idx, n_tokens, is_kept): corpus-wide
    exact dedup of fixed-size token segments, first occurrence (ordered
    by (doc_id, seg_idx)) wins.

    Tokenization matches ``chunking.chunk_documents`` (``[a-z0-9]+`` over
    lowercased text); segments are non-overlapping, the last may be
    short; empty documents emit no segments."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_seg, o_n, o_fp = [], [], [], []
        for did, t in zip(ids, texts):
            ws = _SEG_TOKEN_RE.findall((t or "").lower())
            for k in range(0, (len(ws) + segment_tokens - 1)
                           // segment_tokens):
                piece = ws[k * segment_tokens:(k + 1) * segment_tokens]
                o_id.append(did)
                o_seg.append(k)
                o_n.append(len(piece))
                o_fp.append(hashlib.md5(
                    " ".join(piece).encode()).hexdigest())
        return pa.table({
            id_col: pa.array(o_id, pa.int64()),
            "seg_idx": pa.array(o_seg, pa.int32()),
            "n_tokens": pa.array(o_n, pa.int64()),
            "__fp": pa.array(o_fp, pa.string()),
        })

    segs = ds.map_batches(explode, batch_format="pyarrow")

    def per_bucket(df):
        df = df.sort_values([id_col, "seg_idx"]).reset_index(drop=True)
        df["is_kept"] = ~df["__fp"].duplicated()
        return df[[id_col, "seg_idx", "n_tokens", "is_kept"]]

    from ..pipelines.reports import bucketed_groups
    return bucketed_groups(segs, "__fp", per_bucket, buckets=buckets)


def segment_dedup_sql(table_expr: str = "documents",
                      segment_tokens: int = 32, id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB twin: same windows/fingerprints, first-wins via
    row_number() over (doc_id, seg_idx)."""
    w = segment_tokens
    return f"""
WITH __w AS (
  SELECT {id_col},
         regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS ws
  FROM {table_expr}),
__c AS (SELECT {id_col}, ws, len(ws) AS n FROM __w WHERE len(ws) > 0),
__seg AS (
  SELECT {id_col}, CAST(start / {w} AS INTEGER) AS seg_idx,
         (least(start + {w}, n) - start)::BIGINT AS n_tokens,
         md5(array_to_string(ws[start + 1 : start + {w}], ' ')) AS fp
  FROM (SELECT {id_col}, ws, n, unnest(range(0, n, {w})) AS start
        FROM __c)),
__r AS (
  SELECT *, row_number() OVER (
      PARTITION BY fp ORDER BY {id_col}, seg_idx) AS rn
  FROM __seg)
SELECT {id_col}, seg_idx, n_tokens, rn = 1 AS is_kept
FROM __r ORDER BY {id_col}, seg_idx"""
