"""Byte-pair-encoding tokenizer training + encoding, Ray-Data-first.

Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016, public): BPE is trained on the *word-frequency table*,
not the raw corpus — the only corpus-sized stage is therefore the classic
one-pass word count (Counter partials -> ``bucketed_agg`` keyed sum, the
same shape as ``lm.train_unigram_lm``). The merge loop then iterates over
the BOUNDED (word, count) table on the driver: at 100 TB the distinct-word
table after the default ``max_words`` cap is metadata-sized while the
corpus itself never moves again. Encoding broadcasts the merge list once
(``ray.put``) and streams a stateless ``map_batches`` with a per-batch
word -> token-count cache (words repeat heavily inside a batch; a
persistent cross-batch cache would be an actor-pool stage, unnecessary at
the merge depths benched here).

Merge semantics pinned for the SQL twin: within one merge step every
non-overlapping occurrence of the chosen pair merges in a single
left-to-right scan — exactly the semantics of one DuckDB ``replace()``
call over a sentinel-bracketed symbol string, which is what lets the
oracle unroll the whole training loop as a CTE chain (the same
unrolled-twin trick as the pagerank / HITS oracles). Pair *counting*
uses plain positional adjacency (overlaps included), per the reference
algorithm. Ties on pair count break (count DESC, sym_a ASC, sym_b ASC);
DuckDB's binary UTF-8 ordering equals Python codepoint ordering, so the
tie-break is identical on both sides.

The reference repo has no tokenizer trainer; this operator extends the
LLM-data-pipeline surface (token counting lives at functions/text.py:151
— this is its trainable upgrade).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# identical tokenization to lm.py / tfidf.py so the operators compose
# (same RE2-safety contract as those twins: DuckDB's \w is ASCII-only,
# Python's is unicode — exact on the deterministic ASCII corpus; the BPE
# machinery itself — bracketing, pair counts, greedy merges — is
# codepoint-exact either way, verified by the unicode pytest)
_TOKEN_RE = re.compile(r"\w+")

EOW = "</w>"  # end-of-word marker symbol (Sennrich's convention)


# ---------------------------------------------------------------- train

def word_count_table(ds: rd.Dataset, text_col: str = "text",
                     min_count: int = 1,
                     max_words: int | None = 2_000_000) -> pd.DataFrame:
    """One pass over ``ds`` -> bounded (word, count) pandas table.

    ``max_words`` caps the driver copy by (count DESC, word ASC) exactly
    like ``train_unigram_lm``'s ``max_vocab``: on a 100-TB web corpus the
    raw distinct-word tail is billions of typo/hash strings, so the cap
    is what keeps the merge loop's input metadata-sized. ``None``
    restores the exact mode (the SQL-twin configuration; fixtures sit
    far under the default cap, so the twin is exact there too).
    """
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg
    wc = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "word", {"count": ("count", "sum")}).materialize()
    if max_words is not None and wc.count() > max_words:
        wc = wc.sort(["count", "word"], descending=[True, False]) \
            .limit(max_words)
    df = wc.to_pandas()
    if min_count > 1:
        df = df[df["count"] >= min_count]
    return df.reset_index(drop=True)


def _merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One greedy left-to-right non-overlapping merge pass (== one
    ``replace()`` over the sentinel-bracketed string form)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_merges(word_freq: pd.DataFrame,
                     num_merges: int = 12) -> pd.DataFrame:
    """Driver-side merge loop over the bounded word-frequency table.

    Returns (step:int64, sym_a, sym_b, pair_count:int64) — the learned
    merge rules in application order. Stops early if no adjacent pair
    remains (every word fully merged).
    """
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (EOW,), int(c))
        for w, c in zip(word_freq["word"], word_freq["count"])]
    rows = []
    for step in range(1, num_merges + 1):
        pc: Counter = Counter()
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (a, b), n = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rows.append((step, a, b, int(n)))
        words = [(_merge_word(s, a, b), c) for s, c in words]
    return pd.DataFrame(rows, columns=["step", "sym_a", "sym_b",
                                       "pair_count"])


def bpe_train(ds: rd.Dataset, text_col: str = "text",
              num_merges: int = 12,
              min_count: int = 1,
              max_words: int | None = 2_000_000) -> pd.DataFrame:
    """Train ``num_merges`` BPE merge rules on ``ds``'s word counts."""
    return train_bpe_merges(
        word_count_table(ds, text_col, min_count, max_words), num_merges)


# --------------------------------------------------------------- encode

def encode_word(word: str, merges: list[tuple[str, str]]) -> int:
    """Symbol count of ``word`` after applying ``merges`` in order."""
    syms = tuple(word) + (EOW,)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, a, b)
    return len(syms)


def bpe_encode_counts(ds: rd.Dataset, merges: pd.DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> rd.Dataset:
    """Per-doc BPE token counts under trained merges:
    (id, n_words, bpe_tokens). Documents with no words drop (mirrors
    ``lm_score``'s empty-doc rule). The merge list broadcasts once; the
    per-batch word cache keeps the encode loop off the hot path."""
    pairs = list(zip(merges["sym_a"], merges["sym_b"]))
    merges_ref = ray.put(pairs)

    def enc(batch: pa.Table) -> pa.Table:
        mg = ray.get(merges_ref)
        cache: dict[str, int] = {}
        ids, nws, nts = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = Counter(_TOKEN_RE.findall((t or "").lower()))
            if not toks:
                continue
            total = 0
            for w, n in toks.items():
                ns = cache.get(w)
                if ns is None:
                    ns = cache[w] = encode_word(w, mg)
                total += n * ns
            ids.append(i)
            nws.append(sum(toks.values()))
            nts.append(total)
        return pa.table({id_col: pa.array(ids, batch.column(id_col).type),
                         "n_words": pa.array(nws, pa.int64()),
                         "bpe_tokens": pa.array(nts, pa.int64())})

    return ds.map_batches(enc, batch_format="pyarrow")


# ------------------------------------------------------------ SQL twins

_S1, _S2 = "chr(1)", "chr(2)"  # symbol-bracket sentinels (can't occur in \w)


def _bpe_chain_cte(table_expr: str, col: str, num_merges: int) -> str:
    """words + w0 + (p_i, m_i, w_i) x num_merges CTE bodies (no WITH)."""
    sep = f"{_S2} || {_S1}"
    parts = [f"""
__words AS MATERIALIZED (
  SELECT tok AS word, COUNT(*)::BIGINT AS c FROM (
    SELECT unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
    FROM {table_expr})
  GROUP BY 1),
__w0 AS MATERIALIZED (
  SELECT word, c,
         regexp_replace(word, '(.)', {_S1} || '\\1' || {_S2}, 'g')
           || {_S1} || '{EOW}' || {_S2} AS sym
  FROM __words)"""]
    for i in range(1, num_merges + 1):
        parts.append(f"""
__p{i} AS MATERIALIZED (
  SELECT l[j] AS sym_a, l[j + 1] AS sym_b, SUM(c)::BIGINT AS n
  FROM (SELECT c, l, unnest(generate_series(1, len(l) - 1)) AS j
        FROM (SELECT c, str_split(substr(sym, 2, length(sym) - 2),
                                  {sep}) AS l
              FROM __w{i - 1}))
  GROUP BY 1, 2),
__m{i} AS MATERIALIZED (SELECT sym_a, sym_b, n FROM __p{i}
           ORDER BY n DESC, sym_a ASC, sym_b ASC LIMIT 1),
__w{i} AS MATERIALIZED (
  SELECT word, c,
         replace(sym, {_S1} || m.sym_a || {_S2} || {_S1} || m.sym_b
                        || {_S2},
                 {_S1} || m.sym_a || m.sym_b || {_S2}) AS sym
  FROM __w{i - 1} CROSS JOIN __m{i} m)""")
    return ",".join(parts)


def bpe_train_sql(table_expr: str = "documents", col: str = "text",
                  num_merges: int = 12) -> str:
    """DuckDB twin of ``bpe_train`` (exact, uncapped config): the merge
    loop unrolled as a CTE chain — pair counts by positional adjacency,
    the argmax pair by (n DESC, pair ASC), the merge applied by one
    non-overlapping left-to-right ``replace`` over sentinel-bracketed
    symbols (identical greedy semantics to the Python scan)."""
    chain = _bpe_chain_cte(table_expr, col, num_merges)
    union = "\n  UNION ALL ".join(
        f"SELECT {i} AS step, sym_a, sym_b, n FROM __m{i}"
        for i in range(1, num_merges + 1))
    return f"""
WITH {chain}
SELECT step::BIGINT AS step, sym_a, sym_b, n AS pair_count
FROM ({union})
ORDER BY step"""


def bpe_encode_sql(table_expr: str = "documents", id_col: str = "doc_id",
                   col: str = "text", num_merges: int = 12) -> str:
    """DuckDB twin of ``bpe_encode_counts`` under the same training run:
    final per-word symbol counts from the unrolled chain, joined back to
    per-doc word occurrences."""
    chain = _bpe_chain_cte(table_expr, col, num_merges)
    sep = f"{_S2} || {_S1}"
    return f"""
WITH {chain},
__fin AS MATERIALIZED (
  SELECT word,
         len(str_split(substr(sym, 2, length(sym) - 2), {sep})) AS n_sym
  FROM __w{num_merges}),
__dw AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS word
  FROM {table_expr})
SELECT d.{id_col}, COUNT(*)::BIGINT AS n_words,
       SUM(f.n_sym)::BIGINT AS bpe_tokens
FROM __dw d JOIN __fin f USING (word)
GROUP BY 1 ORDER BY 1"""
