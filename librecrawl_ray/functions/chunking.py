"""Document → training-chunk splitting.

The last hop of a pretraining-data pipeline: each document's token stream
is cut into fixed-size windows with overlap, one training example per
window. Expressed as a 1→N ``map_batches`` expansion (Ray Data handles
output blocks larger than input blocks natively; no shuffle — chunking is
embarrassingly parallel and streams). Tokenization here is the engine's
word-token convention (``[a-z0-9]+`` over lowercased text) so the operator
has an exact DuckDB twin; a real BPE tokenizer drops into ``_tokens``
without changing the window logic.

Window rule (matches Python ``range`` semantics so the SQL twin can use
DuckDB's ``range(0, n, stride)``): starts at 0, stride
``chunk_tokens - overlap``, one chunk per start < n_tokens; the final
chunk may be short.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

__all__ = ["chunk_documents", "chunk_documents_sql"]

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def chunk_documents(ds: rd.Dataset, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """documents → (doc_id, chunk_id, n_tokens, chunk_text) rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_chunk, o_n, o_text = [], [], [], []
        for did, t in zip(ids, texts):
            ws = _tokens(t)
            n = len(ws)
            for k, start in enumerate(range(0, n, stride)):
                piece = ws[start:start + chunk_tokens]
                o_id.append(did)
                o_chunk.append(k)
                o_n.append(len(piece))
                o_text.append(" ".join(piece))
        return pa.table({
            id_col: pa.array(o_id, pa.int64()),
            "chunk_id": pa.array(o_chunk, pa.int32()),
            "n_tokens": pa.array(o_n, pa.int64()),
            "chunk_text": pa.array(o_text, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def chunk_documents_sql(table_expr: str = "documents",
                        chunk_tokens: int = 64, overlap: int = 16,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of ``chunk_documents`` (same window rule, 1-based list
    slicing with the same clamping)."""
    stride = chunk_tokens - overlap
    return f"""
WITH __w AS (
  SELECT {id_col},
         regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS ws
  FROM {table_expr}),
__c AS (SELECT {id_col}, ws, len(ws) AS n FROM __w WHERE len(ws) > 0),
__idx AS (
  SELECT {id_col}, ws, n, unnest(range(0, n, {stride})) AS start
  FROM __c)
SELECT {id_col},
       CAST(start / {stride} AS INTEGER) AS chunk_id,
       (least(start + {chunk_tokens}, n) - start)::BIGINT AS n_tokens,
       array_to_string(ws[start + 1 : start + {chunk_tokens}], ' ')
           AS chunk_text
FROM __idx
ORDER BY {id_col}, chunk_id"""
