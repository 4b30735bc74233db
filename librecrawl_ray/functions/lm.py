"""Unigram language-model quality scoring (CCNet-style perplexity filter).

CCNet / Gopher-class curation pipelines score every document against a
language model trained on a reference corpus and gate on the score
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data"). This module implements the distributed shape with a
unigram LM (deterministic, SQL-twinnable — a KenLM-class n-gram model
slots into the same two passes):

1. **train** — one streaming pass: per-batch token Counters collapse each
   block to its distinct tokens (the massive reduction happens BEFORE the
   shuffle), a small ``groupby(token).sum`` merges the partials, and the
   resulting vocabulary (token → ln count) is broadcast once via
   ``ray.put``. At 100 TB the vocabulary after a min-count cut is a few
   million rows — metadata-sized next to the corpus, the same
   broadcast-small-side discipline as decontam.py's benchmark grams.
2. **score** — one stateless ``map_batches`` pass: mean token log-prob per
   document from the broadcast vocab; no shuffle, no driver state.

Score = (Σ_t n_t · ln c_t) / n − ln(total): the mean of ln(c_t/total)
over token occurrences, rounded to 4 dp (summation-order FP noise is
~1e-12, far inside the rounding margin).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

_TOKEN_RE = re.compile(r"\w+")


def train_unigram_lm(ds: rd.Dataset, text_col: str = "text",
                     min_count: int = 1) -> tuple["ray.ObjectRef", float]:
    """One pass over ``ds`` → (broadcast {token: ln(count)}, ln(total)).

    ``min_count`` drops rare tokens from the vocabulary (they score at the
    OOV floor ln(1/total) — the reference-corpus smoothing CCNet applies
    through KenLM's backoff). Total counts all token occurrences, kept
    tokens or not, so the distribution stays a distribution.
    """
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg
    vocab = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token", {"count": ("count", "sum")}).to_pandas()
    total = int(vocab["count"].sum())
    kept = vocab[vocab["count"] >= min_count]
    logc = {t: math.log(c) for t, c in zip(kept["token"], kept["count"])}
    return ray.put(logc), math.log(total)


def lm_score(ds: rd.Dataset, logc_ref, ln_total: float,
             id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Score every document: (id, n_tokens, lm_score). Documents with no
    tokens are dropped (no distribution to average over)."""
    def score(batch: pa.Table) -> pa.Table:
        logc = ray.get(logc_ref)
        # every token's effective logp is (stored − ln_total); the OOV
        # floor prob 1/total therefore stores ln(1) = 0
        oov = 0.0
        ids, ns, scores = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = Counter(_TOKEN_RE.findall((t or "").lower()))
            n = sum(toks.values())
            if n == 0:
                continue
            s = sum(cnt * logc.get(tok, oov)
                    for tok, cnt in toks.items()) / n - ln_total
            ids.append(i)
            ns.append(n)
            scores.append(round(s, 4))
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "n_tokens": pa.array(ns, pa.int64()),
            "lm_score": pa.array(scores, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_lm_scores(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_count: int = 1) -> rd.Dataset:
    """Train on ``ds`` and score ``ds`` — the self-scoring configuration
    whose SQL twin is exact (no OOV when min_count=1)."""
    ref, ln_total = train_unigram_lm(ds, text_col, min_count)
    return lm_score(ds, ref, ln_total, id_col, text_col)


def unigram_lm_sql(table_expr: str = "documents", id_col: str = "doc_id",
                   col: str = "text") -> str:
    """DuckDB twin of the self-scoring min_count=1 configuration."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}
),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c)::DOUBLE AS total FROM counts),
doc_tok AS (SELECT {id_col}, tok, COUNT(*) AS n FROM toks
            GROUP BY {id_col}, tok)
SELECT dt.{id_col},
       SUM(dt.n)::BIGINT AS n_tokens,
       ROUND(SUM(dt.n * LN(c.c)) / SUM(dt.n) - LN(t.total), 4) AS lm_score
FROM doc_tok dt JOIN counts c USING (tok) CROSS JOIN tot t
GROUP BY dt.{id_col}, t.total
ORDER BY dt.{id_col}
"""
