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
