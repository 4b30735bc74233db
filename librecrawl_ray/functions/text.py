"""Text-analysis operators for large-scale training-data pipelines.

Each operator is a vectorized ``map_batches`` body over a document table
(any table with a text column). Formulas are deliberately SQL-expressible
so the DuckDB oracle can verify them bit-for-bit:

- ``token_count``      — ASCII word tokens, ``\\w+`` (regexp_extract_all)
- ``quality score``    — length / punctuation-ratio / stopword-ratio mix
- ``language id``      — marker-word scoring (argmax over per-language
                         counts), an n-gram-free heuristic in the spirit of
                         LibreCrawl's keyword heuristics
- ``fingerprint``      — md5 of whitespace-normalized lowercase text
                         (document identity for exact dedup)

The reference analogue is the word_count/regex battery of the SEO extractor
(seo_extractor.py:42-44,151-190) and the keyword normalizer
(keyword/normalizer.py:10-174); these generalize them to corpus scale.
"""

from __future__ import annotations

import hashlib
import math
import re

import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+")
_WS_RE = re.compile(r"\s+")

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")

# marker words per language; scoring = total occurrences as standalone
# tokens, argmax wins (first in this order on ties)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "und", "die", "das"),
    "es": ("el", "los", "y", "las"),
}
PUNCT = ".,;:!?"


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text or ""))


def normalize_ws(text: str) -> str:
    return _WS_RE.sub(" ", (text or "").strip().lower())


def fingerprint(text: str) -> str:
    return hashlib.md5(normalize_ws(text).encode("utf-8")).hexdigest()


def quality_score(text: str) -> float:
    """Deterministic quality heuristic in [0,1]:
    0.4·len_score + 0.3·(1 − punct_ratio·10 clamped) + 0.3·stop_score
    where len_score = min(tokens,400)/400, punct_ratio = punct chars /
    max(chars,1), stop_score = min(stop_ratio·5, 1)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    n = len(toks)
    len_score = min(n, 400) / 400.0
    chars = max(len(text or ""), 1)
    punct = sum((text or "").count(c) for c in PUNCT)
    punct_ratio = punct / chars
    punct_score = max(0.0, 1.0 - min(punct_ratio * 10.0, 1.0))
    stops = sum(1 for t in toks if t in STOPWORDS)
    stop_score = min((stops / n if n else 0.0) * 5.0, 1.0)
    v = 0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score
    # Half-away-from-zero at 6 dp, matching DuckDB's round(x, 6) — Python's
    # round() is half-even and diverges on exact .5e-6 boundaries.
    return math.floor(v * 1e6 + 0.5) / 1e6


def lang_id(text: str) -> str:
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang, markers in LANG_MARKERS.items():
        score = sum(1 for t in toks if t in markers)
        if score > best:
            best_lang, best = lang, score
    return best_lang


def annotate_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches body: append token_count / quality / lang / fingerprint."""
    texts = batch.column(text_col).to_pylist()
    return (batch
            .append_column("tokens", pa.array(
                [token_count(t) for t in texts], pa.int64()))
            .append_column("quality", pa.array(
                [quality_score(t) for t in texts], pa.float64()))
            .append_column("lang_pred", pa.array(
                [lang_id(t) for t in texts], pa.string()))
            .append_column("fingerprint", pa.array(
                [fingerprint(t) for t in texts], pa.string())))


# ------------------------------------------------------------- SQL oracles

TOKEN_COUNT_SQL = "len(regexp_extract_all({col}, '\\w+'))"

QUALITY_SQL = """
round(
  0.4 * (least(len(regexp_extract_all({col}, '\\w+')), 400) / 400.0)
+ 0.3 * greatest(0.0, 1.0 - least(
    ((len({col}) - len(replace(replace(replace(replace(replace(replace(
        {col}, '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))
    / greatest(len({col}), 1)) * 10.0, 1.0))
+ 0.3 * least(
    coalesce((len(list_filter(regexp_extract_all(lower({col}), '\\w+'),
        t -> list_contains(['the','a','of','to','and','in','is'], t)))
    / nullif(len(regexp_extract_all({col}, '\\w+')), 0)) * 5.0, 0.0), 1.0)
, 6)
"""

FINGERPRINT_SQL = ("md5(lower(trim(regexp_replace({col}, '\\s+', ' ', 'g'))))")


def _marker_count_sql(col: str, markers: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{m}'" for m in markers)
    return (f"coalesce(len(list_filter(regexp_extract_all(lower({col}), "
            f"'\\w+'), t -> list_contains([{inlist}], t))), 0)")


def lang_id_sql(col: str) -> str:
    scores = {lang: _marker_count_sql(col, m)
              for lang, m in LANG_MARKERS.items()}
    # argmax with tie order en > fr > de > es, all-zero → 'und'
    return f"""
CASE
  WHEN greatest({scores['en']}, {scores['fr']}, {scores['de']},
                {scores['es']}) = 0 THEN 'und'
  WHEN {scores['en']} >= {scores['fr']} AND {scores['en']} >= {scores['de']}
       AND {scores['en']} >= {scores['es']} AND {scores['en']} > 0 THEN 'en'
  WHEN {scores['fr']} >= {scores['de']} AND {scores['fr']} >= {scores['es']}
       AND {scores['fr']} > 0 THEN 'fr'
  WHEN {scores['de']} >= {scores['es']} AND {scores['de']} > 0 THEN 'de'
  ELSE 'es'
END"""


# BPE-ish subword splitter: letter runs / digit runs / punctuation runs,
# each optionally preceded by one space (the GPT-2 pattern family, reduced
# to RE2-safe syntax so DuckDB's regexp_extract_all matches re.findall
# exactly — no lookaheads, no unicode property classes)
_BPE_RE = re.compile(r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+")
BPE_TOKEN_SQL = ("len(regexp_extract_all(lower({col}), "
                 "' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+'))")
WS_TOKEN_SQL = "len(regexp_extract_all({col}, '\S+'))"
_WS_TOKEN_RE = re.compile(r"\S+")


def bpe_token_count(text: str) -> int:
    """BPE-ish token count (subword-run splitter over lowercased text)."""
    return len(_BPE_RE.findall((text or "").lower()))


def ws_token_count(text: str) -> int:
    """Plain whitespace token count."""
    return len(_WS_TOKEN_RE.findall(text or ""))


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches body: doc_id + the three token-count columns."""
    texts = batch.column(text_col).to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "ws_tokens": pa.array([ws_token_count(t) for t in texts],
                              pa.int64()),
        "word_tokens": pa.array([token_count(t) for t in texts],
                                pa.int64()),
        "bpe_tokens": pa.array([bpe_token_count(t) for t in texts],
                               pa.int64()),
    })


# ---------------------------------------------------- winnowing fingerprints

def winnow_fingerprints(text: str, k: int = 8, window: int = 16,
                        prefix: int | None = None) -> list:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every character k-gram of the whitespace-normalized
    text, keep the minimum of each sliding window of ``window`` hashes,
    return the distinct minima sorted.

    Hashes are the first 8 hex chars of md5(k-gram) compared
    LEXICOGRAPHICALLY — identical semantics in Python and ANSI SQL
    (min over substr(md5(...),1,8)), which makes the operator fully
    DuckDB-oracle-able. A production deployment swaps in a true rolling
    Rabin–Karp hash; the window-minima selection is unchanged.
    """
    s = _WS_RE.sub(" ", (text or "").lower()).strip()
    if prefix is not None:
        s = s[:prefix]
    if not s:
        return []
    if len(s) < k:
        return [hashlib.md5(s.encode()).hexdigest()[:8]]
    hs = [hashlib.md5(s[i:i + k].encode()).hexdigest()[:8]
          for i in range(len(s) - k + 1)]
    if len(hs) <= window:
        return [min(hs)]
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view
    # fixed-width lowercase hex → uint64 preserves lexicographic order, so
    # the vectorized integer window-min equals the SQL string list_min
    ints = np.array([int(h, 16) for h in hs], dtype=np.uint64)
    minima = sliding_window_view(ints, window).min(axis=1)
    return [f"{v:08x}" for v in sorted(set(minima.tolist()))]


def winnow_fps_cte(table_expr: str, col: str = "text", k: int = 8,
                   window: int = 16, prefix: int | None = None) -> str:
    """Staged-CTE SQL twin of ``winnow_fingerprints``: SELECT doc_id, fp.

    MUST be staged (norm → grams → fps) so the k-gram hash list
    materializes once per doc — inlining it into the window lambda makes
    DuckDB recompute every md5 per window position (O(n·w) md5 calls
    become O(n²))."""
    pre = (f"substr(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')), "
           f"1, {prefix})" if prefix is not None else
           f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))")
    return f"""
WITH __norm AS (
  SELECT doc_id, {pre} AS s FROM {table_expr}),
__grams AS (
  SELECT doc_id, s,
         CASE WHEN len(s) >= {k}
              THEN list_transform(generate_series(1, len(s) - {k - 1}),
                                  i -> substr(md5(substr(s, i, {k})), 1, 8))
              ELSE [] END AS hs
  FROM __norm)
SELECT doc_id,
  CASE WHEN len(s) = 0 THEN []
       WHEN len(s) < {k} THEN [substr(md5(s), 1, 8)]
       ELSE list_sort(list_distinct(list_transform(
          generate_series(1, greatest(len(hs) - {window - 1}, 1)),
          i -> list_min(hs[i:i + {window - 1}]))))
  END AS fp
FROM __grams"""
