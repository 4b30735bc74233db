"""DSIR-style data selection via importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", public method): estimate a target-domain and a raw-corpus
distribution over HASHED N-GRAM features, score every raw document by
its importance log-weight Σ_f count_f · (ln p_target[f] − ln p_raw[f]),
and keep the highest-weight documents. The hashing is what makes it
scale: the feature space is fixed at 65,536 buckets regardless of
corpus size, so both distributions (and their log-ratio table) are
bounded broadcast state by construction — the same bounded-vocab
discipline as ``functions/lm.py``.

Ray shape (one featurize pass + two bounded reduces + one scoring pass):
  1. map_batches: per-doc hashed-bigram counts → (doc_id, is_target, f,
     cnt) rows; features are the first 4 hex chars of md5(bigram) — the
     repo's established engine-portable hash (DuckDB computes the
     identical md5), 16 bits = the 65,536-bucket space.
  2. two feature aggregates (raw = everything, target = the filtered
     side) → ≤65,536 rows each → driver computes the add-1-smoothed
     log-ratio table once, ``ray.put`` broadcast.
  3. scoring pass over the SAME materialized featurized rows: per-row
     contribution rounds to integer micro-units (floor(x·1e6 + 0.5),
     mirrored in the twin) so per-doc sums are exact int64 — float
     addition order can never flip a rank — then a doc-keyed bucketed
     sum and per-block top-k partials; only k·blocks rows reach the
     driver.

The paper resamples with Gumbel noise; this implementation takes the
deterministic top-k (the zero-temperature limit) so the result is
exactly reproducible and oracle-checkable. md5-per-distinct-bigram is
the featurize cost; at 100 TB one swaps in any 16-bit rolling hash on
BOTH sides — the contract only needs hash equality across engines.

Reference analog: none (LibreCrawl has no data-selection surface);
part of the beyond-reference LLM-data operator family.
"""
from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .lm import _TOKEN_RE

N_FEATURES = 65_536  # 4 hex chars of md5


def _feat(bigram: str) -> str:
    return hashlib.md5(bigram.encode()).hexdigest()[:4]


def dsir_topk(ds: rd.Dataset, target_lang: str = "en", k: int = 100,
              id_col: str = "doc_id", text_col: str = "text",
              lang_col: str = "lang", buckets: int = 32) -> pa.Table:
    """Top-``k`` documents by DSIR importance log-weight toward the
    ``target_lang`` slice: ``(doc_id, dsir_logweight)``, ranked by
    weight desc then doc id. Documents with fewer than two tokens have
    no bigrams and are absent (matching the twin's join semantics)."""
    from ..pipelines.reports import bucketed_agg

    def featurize(batch: pa.Table) -> pa.Table:
        ids, tgts, fs, cnts = [], [], [], []
        for i, t, lg in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist(),
                            batch.column(lang_col).to_pylist()):
            toks = _TOKEN_RE.findall((t or "").lower())
            if len(toks) < 2:
                continue
            c = Counter(_feat(a + " " + b)
                        for a, b in zip(toks, toks[1:]))
            tgt = lg == target_lang
            for f, n in c.items():
                ids.append(i)
                tgts.append(tgt)
                fs.append(f)
                cnts.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "is_target": pa.array(tgts, pa.bool_()),
                         "f": pa.array(fs, pa.string()),
                         "cnt": pa.array(cnts, pa.int64())})

    feats = (ds.select_columns([id_col, text_col, lang_col])
             .map_batches(featurize, batch_format="pyarrow")
             .materialize())

    def f_partial(batch: pa.Table, target_only: bool) -> pa.Table:
        df = batch.to_pandas()
        if target_only:
            df = df[df["is_target"]]
        g = df.groupby("f", sort=False, as_index=False)["cnt"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    raw_tbl = bucketed_agg(
        feats.map_batches(lambda b: f_partial(b, False),
                          batch_format="pyarrow"),
        "f", {"cnt": ("cnt", "sum")}, buckets=buckets).to_pandas()
    tgt_tbl = bucketed_agg(
        feats.map_batches(lambda b: f_partial(b, True),
                          batch_format="pyarrow"),
        "f", {"cnt": ("cnt", "sum")}, buckets=buckets).to_pandas()

    tot_raw = float(raw_tbl["cnt"].sum())
    tot_tgt = float(tgt_tbl["cnt"].sum())
    tgt_map = dict(zip(tgt_tbl["f"], tgt_tbl["cnt"]))
    # add-1-smoothed log-ratio per OBSERVED feature (a doc's features
    # always appear in the raw table, so the map is total for scoring)
    lr = {f: math.log((float(tgt_map.get(f, 0)) + 1.0)
                      / (tot_tgt + float(N_FEATURES)))
          - math.log((float(c) + 1.0) / (tot_raw + float(N_FEATURES)))
          for f, c in zip(raw_tbl["f"], raw_tbl["cnt"])}
    lr_ref = ray.put(lr)

    def contrib(pdf: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lr_ref)
        lrv = pdf["f"].map(table).to_numpy(dtype="float64")
        cnt = pdf["cnt"].to_numpy(dtype="float64")
        micro = np.floor(cnt * lrv * 1000000.0 + 0.5).astype("int64")
        return pd.DataFrame({id_col: pdf[id_col], "micro": micro})

    per_doc = bucketed_agg(
        feats.map_batches(contrib, batch_format="pandas"),
        id_col, {"micro": ("micro", "sum")}, buckets=buckets)

    def topk_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["micro", id_col], ascending=[False, True]).head(k)

    cand = per_doc.map_batches(
        topk_partial, batch_format="pandas").to_pandas()
    top = cand.sort_values(["micro", id_col],
                           ascending=[False, True]).head(k)
    out = pd.DataFrame({
        id_col: top[id_col].to_numpy(),
        "dsir_logweight":
            top["micro"].to_numpy(dtype="float64") / 1000000.0})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def dsir_topk_sql(target_lang: str = "en", k: int = 100,
                  table: str = "documents", id_col: str = "doc_id",
                  col: str = "text", lang_col: str = "lang") -> str:
    """DuckDB twin of :func:`dsir_topk`: identical md5 feature hash,
    identical smoothing and float op order, identical micro-unit
    rounding before the per-doc sum."""
    nf = float(N_FEATURES)
    return f"""
WITH toks AS (
  SELECT {id_col}, {lang_col},
         regexp_extract_all(lower({col}), '\\w+') AS ts
  FROM {table}
), pos AS (
  SELECT {id_col}, {lang_col}, ts,
         unnest(generate_series(1, len(ts) - 1)) AS i
  FROM toks
), big AS (
  SELECT {id_col}, {lang_col},
         substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 4) AS f
  FROM pos
), raw AS (
  SELECT f, count(*)::DOUBLE AS c FROM big GROUP BY f
), tgt AS (
  SELECT f, count(*)::DOUBLE AS c FROM big
  WHERE {lang_col} = '{target_lang}' GROUP BY f
), totals AS (
  SELECT (SELECT sum(c) FROM raw) AS tr,
         (SELECT coalesce(sum(c), 0) FROM tgt) AS tt
), lr AS (
  SELECT raw.f,
         ln((coalesce(tgt.c, 0) + 1.0) / (totals.tt + {nf}))
       - ln((raw.c + 1.0) / (totals.tr + {nf})) AS lrv
  FROM raw LEFT JOIN tgt USING (f) CROSS JOIN totals
), docfeat AS (
  SELECT {id_col}, f, count(*)::DOUBLE AS cnt FROM big
  GROUP BY {id_col}, f
), contrib AS (
  SELECT d.{id_col},
         CAST(floor(d.cnt * lr.lrv * 1000000.0 + 0.5) AS BIGINT)
             AS micro
  FROM docfeat d JOIN lr USING (f)
)
SELECT {id_col}, sum(micro)::DOUBLE / 1000000.0 AS dsir_logweight
FROM contrib
GROUP BY {id_col}
ORDER BY sum(micro) DESC, {id_col}
LIMIT {k}"""
