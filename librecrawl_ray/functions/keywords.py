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
