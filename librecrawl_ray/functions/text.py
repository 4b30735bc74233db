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


# --------------------------------------- repetition / Gopher-style quality

_ALNUM_RE = re.compile(r"[a-z0-9]+")


def repetition_stats(text: str) -> tuple[int, int, int, int, int]:
    """Per-document repetition signals in the Gopher quality-filter family
    (Rae et al. 2021 §A1.1, adapted to word/bigram repetition because the
    synthetic corpus is single-line): word count, distinct-word count,
    max single-word frequency, max adjacent-bigram frequency, total word
    length. All integers so the SQL twin hashes exactly (no float
    rounding-mode traps)."""
    from collections import Counter
    words = _ALNUM_RE.findall((text or "").lower())
    n = len(words)
    if not n:
        return 0, 0, 0, 0, 0
    wc = Counter(words)
    top_bigram = max(Counter(zip(words, words[1:])).values()) if n >= 2 \
        else 0
    return (n, len(wc), max(wc.values()), top_bigram,
            sum(len(w) for w in words))


def gopher_pass(n_words: int, n_unique: int, top_word: int,
                sum_len: int) -> int:
    """Integer-arithmetic Gopher-style accept gate: 10 ≤ words ≤ 100k,
    mean word length in [3, 10], ≥20% unique words, top word ≤20% of all
    words. Cross-multiplied so the engine and the SQL twin agree bit-for-
    bit (no ratio floats)."""
    return int(10 <= n_words <= 100_000
               and 3 * n_words <= sum_len <= 10 * n_words
               and 5 * n_unique >= n_words
               and 5 * top_word <= n_words)


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """map_batches body: doc_id + repetition signals + the accept gate."""
    texts = batch.column(text_col).to_pylist()
    rows = [repetition_stats(t) for t in texts]
    n, u, tw, tb, sl = (list(c) for c in zip(*rows)) if rows else \
        ([], [], [], [], [])
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(n, pa.int64()),
        "n_unique_words": pa.array(u, pa.int64()),
        "top_word_count": pa.array(tw, pa.int64()),
        "top_bigram_count": pa.array(tb, pa.int64()),
        "sum_word_len": pa.array(sl, pa.int64()),
        "gopher_pass": pa.array(
            [gopher_pass(a, b, c, e) for a, b, c, _d, e in rows],
            pa.int32()),
    })


def repetition_stats_sql(table_expr: str, col: str = "text") -> str:
    """DuckDB twin of repetition_stats_batch. Staged CTEs (norm → explode
    → counts) — inlining list expressions into lambdas re-evaluates them
    per element."""
    return f"""
WITH __w AS (
  SELECT doc_id, regexp_extract_all(lower({col}), '[a-z0-9]+') AS ws
  FROM {table_expr}),
__base AS (
  SELECT doc_id, len(ws) AS n_words,
         coalesce(list_sum(list_transform(ws, t -> len(t))), 0)::BIGINT
             AS sum_word_len
  FROM __w),
__ex AS (SELECT doc_id, unnest(ws) AS word FROM __w),
__wc AS (SELECT doc_id, word, count(*) AS c FROM __ex
         GROUP BY doc_id, word),
__tops AS (SELECT doc_id, count(*)::BIGINT AS n_unique_words,
                  max(c)::BIGINT AS top_word_count
           FROM __wc GROUP BY doc_id),
__bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || chr(31) || ws[i + 1])) AS bigram
  FROM __w WHERE len(ws) >= 2),
__bgc AS (SELECT doc_id, bigram, count(*) AS c FROM __bg
          GROUP BY doc_id, bigram),
__bgtop AS (SELECT doc_id, max(c)::BIGINT AS top_bigram_count
            FROM __bgc GROUP BY doc_id)
SELECT b.doc_id, b.n_words,
       coalesce(t.n_unique_words, 0) AS n_unique_words,
       coalesce(t.top_word_count, 0) AS top_word_count,
       coalesce(g.top_bigram_count, 0) AS top_bigram_count,
       b.sum_word_len,
       CAST(CASE WHEN b.n_words BETWEEN 10 AND 100000
                  AND 3 * b.n_words <= b.sum_word_len
                  AND b.sum_word_len <= 10 * b.n_words
                  AND 5 * coalesce(t.n_unique_words, 0) >= b.n_words
                  AND 5 * coalesce(t.top_word_count, 0) <= b.n_words
             THEN 1 ELSE 0 END AS INTEGER) AS gopher_pass
FROM __base b
LEFT JOIN __tops t USING (doc_id)
LEFT JOIN __bgtop g USING (doc_id)
ORDER BY doc_id"""


# -------------------------------------------------------- PII-pattern scan

# RE2-safe (no lookaround/backrefs) so DuckDB regexp_extract_all matches
# re.findall exactly. Deliberately simple curation-grade detectors: a
# production pipeline swaps stricter validators into the same batch shape.
_EMAIL_RE = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
_PHONE_RE = re.compile(r"\+?[0-9][0-9()\-. ]{7,}[0-9]")
_IPV4_RE = re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")

EMAIL_SQL = (r"len(regexp_extract_all(lower({col}), "
             r"'[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{{2,}}'))")
PHONE_SQL = (r"len(regexp_extract_all(lower({col}), "
             r"'\+?[0-9][0-9()\-. ]{{7,}}[0-9]'))")
IPV4_SQL = (r"len(regexp_extract_all(lower({col}), "
            r"'[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}'))")


def pii_scan_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches body: per-doc counts of email / phone / IPv4 patterns
    plus a has_pii flag — the redaction-triage pass of a curation
    pipeline (stateless, no shuffle; a redactor stage consumes the
    match offsets in the same batch shape)."""
    texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
    em = [len(_EMAIL_RE.findall(t)) for t in texts]
    ph = [len(_PHONE_RE.findall(t)) for t in texts]
    ip = [len(_IPV4_RE.findall(t)) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "email_count": pa.array(em, pa.int64()),
        "phone_count": pa.array(ph, pa.int64()),
        "ipv4_count": pa.array(ip, pa.int64()),
        "has_pii": pa.array([int(a + b + c > 0)
                             for a, b, c in zip(em, ph, ip)], pa.int32()),
    })


def pii_scan_sql(table_expr: str = "documents", col: str = "text") -> str:
    e = EMAIL_SQL.format(col=col)
    p = PHONE_SQL.format(col=col)
    i = IPV4_SQL.format(col=col)
    return f"""
SELECT doc_id,
       {e}::BIGINT AS email_count,
       {p}::BIGINT AS phone_count,
       {i}::BIGINT AS ipv4_count,
       CAST(CASE WHEN {e} + {p} + {i} > 0 THEN 1 ELSE 0 END AS INTEGER)
           AS has_pii
FROM {table_expr} ORDER BY doc_id"""


def lexical_stats_batch(batch: pa.Table, text_col: str = "text") \
        -> pa.Table:
    """map_batches body: per-doc lexical-diversity signals over the \\w+
    token stream — n_tokens, n_types (distinct tokens), type-token ratio,
    and Shannon entropy of the token distribution (bits). Low entropy /
    TTR flags template and keyword-stuffed pages that Gopher-style length
    gates miss; both are standard pre-training quality features.

    Stateless, no shuffle. Numeric contract: entropy is computed as
    log2(T) − (Σ c·log2 c)/T — the exact operation order the SQL twin
    mirrors — then half-away-rounded to 6 dp (DuckDB ROUND parity), same
    idiom as quality_score."""
    from collections import Counter

    texts = batch.column(text_col).to_pylist()
    n_tok, n_typ, ttr, ent = [], [], [], []
    for t in texts:
        toks = _TOKEN_RE.findall((t or "").lower())
        T = len(toks)
        if not T:
            n_tok.append(0)
            n_typ.append(0)
            ttr.append(0.0)
            ent.append(0.0)
            continue
        c = Counter(toks)
        s = sum(n * math.log2(n) for n in c.values())
        n_tok.append(T)
        n_typ.append(len(c))
        ttr.append(math.floor(len(c) / T * 1e6 + 0.5) / 1e6)
        ent.append(math.floor((math.log2(T) - s / T) * 1e6 + 0.5) / 1e6)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_types": pa.array(n_typ, pa.int64()),
        "ttr": pa.array(ttr, pa.float64()),
        "entropy": pa.array(ent, pa.float64()),
    })


def lexical_stats_sql(table_expr: str = "documents",
                      col: str = "text") -> str:
    """DuckDB twin of ``lexical_stats_batch`` (same \\w+ tokenizer idiom
    as the unigram-LM twin; op-order-mirrored entropy; half-away 6 dp)."""
    return f"""
WITH __tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}),
__cnt AS (
  SELECT doc_id, tok, count(*)::DOUBLE AS c FROM __tok
  GROUP BY doc_id, tok),
__per AS (
  SELECT doc_id, sum(c) AS t, count(*)::BIGINT AS v,
         sum(c * log2(c)) AS s
  FROM __cnt GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(p.t, 0)::BIGINT AS n_tokens,
       coalesce(p.v, 0)::BIGINT AS n_types,
       CASE WHEN p.t > 0
            THEN floor(p.v / p.t * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS ttr,
       CASE WHEN p.t > 0
            THEN floor((log2(p.t) - p.s / p.t) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS entropy
FROM {table_expr} d LEFT JOIN __per p USING (doc_id)
ORDER BY d.doc_id"""


def lang_confusion_batch(batch: pa.Table) -> pa.Table:
    """map_batches combiner for the language-ID confusion matrix: each
    block reduces to its distinct (declared lang, predicted lang) pairs
    with counts — the calibration report a curation pipeline reads
    before trusting lang_pred as a gate. Compose with a small keyed sum
    (the partials are ≤ n_langs² rows per block)."""
    from collections import Counter

    c = Counter(zip(batch.column("lang").to_pylist(),
                    (lang_id(t)
                     for t in batch.column("text").to_pylist())))
    keys = list(c.keys())
    return pa.table({
        "lang": pa.array([k[0] for k in keys], pa.string()),
        "lang_pred": pa.array([k[1] for k in keys], pa.string()),
        "n_docs": pa.array([c[k] for k in keys], pa.int64())})


def lang_confusion_sql(table_expr: str = "documents",
                       col: str = "text") -> str:
    """DuckDB twin of the confusion matrix (same lang_id argmax)."""
    return f"""
SELECT lang, {lang_id_sql(col)} AS lang_pred, count(*)::BIGINT AS n_docs
FROM {table_expr} GROUP BY 1, 2 ORDER BY lang, lang_pred"""
