"""Keyword extraction + normalization (M23/M24, reference
src/keyword/keyword_analyzer.py:243-331 and src/keyword/normalizer.py:10-174
— the data-flow-ish slice of the keyword suite; the external-API
orchestration around it is out of scope per SURVEY.md).

- ``ngram_counts``      — stopword-filtered uni/bi/tri-gram counts per doc
                          with density % and top-N truncation
- ``top_keywords``      — corpus-wide top-K unigrams (map_batches partial
                          counts → groupby-sum → top-k; SQL-oracled)
- ``normalize_keyword`` — lowercase/strip/collapse, word-count bucket,
                          intent-signal classification
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .text import _TOKEN_RE

STOPWORDS_FULL = frozenset(
    "the a an of to and in is are was were be been for on with as by at "
    "it its this that these those from or not no but if then than so "
    "such into over under out up down off own same".split())

INTENT_SIGNALS = {
    "transactional": ("buy", "price", "cheap", "deal", "discount", "order"),
    "informational": ("how", "what", "why", "guide", "tutorial", "learn"),
    "navigational": ("login", "www", "site", "official", "homepage"),
}


def ngram_counts(text: str, max_n: int = 3, top: int = 20) -> dict:
    """Per-document n-gram analysis (keyword_analyzer.py:243-331):
    stopword-filtered token stream → Counter per n → density % of total
    tokens → top-N (count desc, gram asc)."""
    toks = [t for t in _TOKEN_RE.findall((text or "").lower())
            if t not in STOPWORDS_FULL]
    total = max(len(toks), 1)
    out = {}
    for n in range(1, max_n + 1):
        grams = Counter(" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
        ranked = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        out[f"{n}gram"] = [
            {"gram": g, "count": c,
             "density_pct": round(c * 100.0 / total, 2)}
            for g, c in ranked]
    return out


def normalize_keyword(kw: str) -> dict:
    """Keyword normalize/classify (normalizer.py:10-174): canonical form,
    word-count bucket, intent signal."""
    norm = " ".join((kw or "").lower().strip().split())
    nwords = len(norm.split()) if norm else 0
    bucket = ("short" if nwords <= 1 else
              "medium" if nwords <= 3 else "long_tail")
    intent = "unclassified"
    words = set(norm.split())
    for label, signals in INTENT_SIGNALS.items():
        if words & set(signals):
            intent = label
            break
    return {"keyword": norm, "word_count": nwords, "bucket": bucket,
            "intent": intent}


def dedup_keywords(kws: list[str]) -> list[dict]:
    """Exact dedup after normalization, first occurrence wins (M24)."""
    seen: set[str] = set()
    out = []
    for kw in kws:
        n = normalize_keyword(kw)
        if n["keyword"] and n["keyword"] not in seen:
            seen.add(n["keyword"])
            out.append(n)
    return out


def top_keywords(ds: rd.Dataset, text_col: str = "text",
                 k: int = 20) -> pd.DataFrame:
    """Corpus-wide top-k unigrams: partial Counter per batch (one row per
    term per batch) → groupby-sum shuffle over terms only → top-k."""
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(tok for tok in _TOKEN_RE.findall((t or "").lower())
                     if tok not in STOPWORDS_FULL)
        if not c:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        terms, counts = zip(*c.items())
        return pa.table({"term": pa.array(terms, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    from ..pipelines.reports import bucketed_agg
    out = bucketed_agg(
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "term", {"occurrences": ("n", "sum")}).to_pandas()
    return (out.sort_values(["occurrences", "term"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


def top_keywords_sql(k: int = 20) -> str:
    stop = ",".join(f"'{w}'" for w in sorted(STOPWORDS_FULL))
    return f"""
SELECT term, count(*) AS occurrences
FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS term
      FROM documents)
WHERE term NOT IN ({stop})
GROUP BY term ORDER BY occurrences DESC, term LIMIT {k}
"""


def pmi_collocations(ds: rd.Dataset, text_col: str = "text",
                     k: int = 30, min_count: int = 5,
                     buckets: int = 32) -> pa.Table:
    """Corpus-wide collocation mining: top-``k`` adjacent token pairs by
    pointwise mutual information ``ln(p(a,b)) − ln(p(a)) − ln(p(b))``
    (bigram probability over total bigram positions, unigram
    probabilities over total tokens), gated by ``min_count`` bigram
    occurrences — the classic PMI + frequency-floor recipe (Church &
    Hanks 1990).

    Scale shape: per-batch bigram/unigram Counter partials →
    ``bucketed_agg`` keyed reduces (the min_count floor is what bounds
    the surviving bigram table at corpus scale — the long tail is
    exactly what it prunes); unigram counts attach to survivors through
    the adaptive hash join (broadcast at fixture scale, bucketed at
    corpus scale) — never a vocab-sized driver dict. PMI rounds to
    integer micro-units before ranking so order is engine-stable; ties
    rank lexicographically.

    Output: ``(w1, w2, n_pairs, pmi)``, pmi desc. No reference analog —
    extends the M23 keyword family corpus-wide."""
    import numpy as np

    from ..pipelines.reports import bucketed_agg, hash_join

    def partials(batch: pa.Table) -> pa.Table:
        bc: Counter = Counter()
        uc: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = _TOKEN_RE.findall((t or "").lower())
            uc.update(toks)
            bc.update(zip(toks, toks[1:]))
        w1 = [a for a, _ in bc]
        w2 = [b for _, b in bc]
        # unigram rows ride along with w2=NULL (one stream, one shuffle
        # family; split again after the keyed reduces)
        return pa.table({
            "w1": pa.array(w1 + list(uc.keys()), pa.string()),
            "w2": pa.array(w2 + [None] * len(uc), pa.string()),
            "c": pa.array(list(bc.values()) + list(uc.values()),
                          pa.int64())})

    import pyarrow.compute as pc

    counts = (ds.select_columns([text_col])
              .map_batches(partials, batch_format="pyarrow")
              .materialize())

    def _bigram_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("w2")))

    def _unigram_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("w2"))).drop_columns(["w2"])

    big_rows = counts.map_batches(_bigram_rows, batch_format="pyarrow")
    big = bucketed_agg(big_rows, ["w1", "w2"], {"c": ("c", "sum")},
                       buckets=buckets)
    uni = bucketed_agg(
        counts.map_batches(_unigram_rows, batch_format="pyarrow"),
        "w1", {"c": ("c", "sum")}, buckets=buckets).materialize()

    total_big = float(big_rows.sum("c"))
    total_uni = float(uni.sum("c"))

    surv = big.filter(expr=f"c >= {min_count}")
    j1 = hash_join(surv, uni.map_batches(
        lambda d: d.rename(columns={"w1": "tok", "c": "c1"}),
        batch_format="pandas"), key="w1", right_key="tok")
    j2 = hash_join(j1, uni.map_batches(
        lambda d: d.rename(columns={"w1": "tok", "c": "c2"}),
        batch_format="pandas"), key="w2", right_key="tok")

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        cab = pdf["c"].to_numpy(dtype="float64")
        c1 = pdf["c1"].to_numpy(dtype="float64")
        c2 = pdf["c2"].to_numpy(dtype="float64")
        micro = np.floor(
            (np.log(cab / total_big) - np.log(c1 / total_uni)
             - np.log(c2 / total_uni)) * 1000000.0 + 0.5).astype("int64")
        return pd.DataFrame({"w1": pdf["w1"], "w2": pdf["w2"],
                             "n_pairs": pdf["c"].astype("int64"),
                             "micro": micro})

    def topk_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(["micro", "w1", "w2"],
                               ascending=[False, True, True]).head(k)

    cand = (j2.map_batches(score, batch_format="pandas")
            .map_batches(topk_partial, batch_format="pandas")
            .to_pandas())
    top = cand.sort_values(["micro", "w1", "w2"],
                           ascending=[False, True, True]).head(k)
    out = pd.DataFrame({
        "w1": top["w1"].to_numpy(), "w2": top["w2"].to_numpy(),
        "n_pairs": top["n_pairs"].to_numpy(),
        "pmi": top["micro"].to_numpy(dtype="float64") / 1000000.0})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def pmi_collocations_sql(k: int = 30, min_count: int = 5,
                         table: str = "documents",
                         col: str = "text") -> str:
    """DuckDB twin of :func:`pmi_collocations` (same tokenization,
    probability definitions, float op order, micro-unit rounding)."""
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower({col}), '\\w+') AS ts FROM {table}
), pos AS (
  SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks
), big AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2 FROM pos
), bc AS (
  SELECT w1, w2, count(*)::DOUBLE AS c FROM big GROUP BY w1, w2
  HAVING count(*) >= {min_count}
), uni AS (
  SELECT tok, count(*)::DOUBLE AS c
  FROM (SELECT unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
        FROM {table})
  GROUP BY tok
), tot AS (
  SELECT (SELECT sum(c) FROM uni) AS u,
         (SELECT count(*)::DOUBLE FROM big) AS t
), scored AS (
  SELECT bc.w1, bc.w2, CAST(bc.c AS BIGINT) AS n_pairs,
         CAST(floor((ln(bc.c / tot.t) - ln(u1.c / tot.u)
                     - ln(u2.c / tot.u)) * 1000000.0 + 0.5) AS BIGINT)
             AS micro
  FROM bc
  CROSS JOIN tot
  JOIN uni u1 ON u1.tok = bc.w1
  JOIN uni u2 ON u2.tok = bc.w2
)
SELECT w1, w2, n_pairs, micro::DOUBLE / 1000000.0 AS pmi
FROM scored
ORDER BY micro DESC, w1, w2
LIMIT {k}"""
