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
                     min_count: int = 1,
                     max_vocab: int | None = 5_000_000
                     ) -> tuple["ray.ObjectRef", float]:
    """One pass over ``ds`` → (broadcast {token: ln(count)}, ln(total)).

    ``min_count`` drops rare tokens from the vocabulary (they score at the
    OOV floor ln(1/total) — the reference-corpus smoothing CCNet applies
    through KenLM's backoff). Total counts all token occurrences, kept
    tokens or not, so the distribution stays a distribution.

    ``max_vocab`` bounds the broadcast AND the driver copy by default: on
    a 100-TB web corpus the raw vocabulary (typo/hash-garbage tail) is
    billions of terms, so an uncapped {token: ln count} dict would sink
    the driver long before any worker. When the MEASURED vocabulary
    exceeds the cap, only the top-``max_vocab`` tokens by (count DESC,
    token ASC — deterministic) are kept, via a distributed sort+limit on
    the (token, count) table; everything cut scores at the same OOV
    floor min_count already routes through, so the cap composes with the
    existing smoothing rather than adding a new semantics. ``None``
    restores the exact unbounded mode (the SQL-twin configuration —
    fixtures sit far under the default cap, so the twin is exact there).
    ``total`` is summed over ALL tokens before any cut.
    """
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg
    vocab_ds = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token", {"count": ("count", "sum")}).materialize()
    total = int(vocab_ds.sum("count"))
    if max_vocab is not None and vocab_ds.count() > max_vocab:
        vocab_ds = vocab_ds.sort(["count", "token"],
                                 descending=[True, False]) \
            .limit(max_vocab)
    vocab = vocab_ds.to_pandas()
    kept = vocab[vocab["count"] >= min_count]
    logc = {t: math.log(c) for t, c in zip(kept["token"], kept["count"])}
    return ray.put(logc), math.log(total)


def lm_score(ds: rd.Dataset, logc_ref, ln_total: float,
             id_col: str = "doc_id", text_col: str = "text",
             carry_cols: tuple = ()) -> rd.Dataset:
    """Score every document: (id, *carry_cols, n_tokens, lm_score).
    Documents with no tokens are dropped (no distribution to average
    over). ``carry_cols`` pass through untouched (e.g. ``lang`` for the
    per-language bucketing downstream)."""
    def score(batch: pa.Table) -> pa.Table:
        logc = ray.get(logc_ref)
        # every token's effective logp is (stored − ln_total); the OOV
        # floor prob 1/total therefore stores ln(1) = 0
        oov = 0.0
        ids, ns, scores, keep_idx = [], [], [], []
        for row, (i, t) in enumerate(zip(
                batch.column(id_col).to_pylist(),
                batch.column(text_col).to_pylist())):
            toks = Counter(_TOKEN_RE.findall((t or "").lower()))
            n = sum(toks.values())
            if n == 0:
                continue
            s = sum(cnt * logc.get(tok, oov)
                    for tok, cnt in toks.items()) / n - ln_total
            ids.append(i)
            ns.append(n)
            scores.append(round(s, 4))
            keep_idx.append(row)
        cols = {id_col: pa.array(ids, batch.column(id_col).type)}
        for c in carry_cols:
            cols[c] = batch.column(c).take(pa.array(keep_idx, pa.int64()))
        cols["n_tokens"] = pa.array(ns, pa.int64())
        cols["lm_score"] = pa.array(scores, pa.float64())
        return pa.table(cols)

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


def quality_buckets(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", lang_col: str = "lang",
                    qs: tuple = (1.0 / 3, 2.0 / 3),
                    buckets: int = 32) -> rd.Dataset:
    """CCNet-style head/middle/tail partition per language (Wenzek et al.
    2020 §4.4: score every doc against the LM, split each language at the
    score tertiles; training recipes then weight the thirds differently).

    Distributed shape, three bounded passes:

    1. score — ``unigram_lm_scores`` (train partials → broadcast vocab →
       stateless scoring), carrying ``lang`` through.
    2. thresholds — EXACT per-language ``quantile_disc`` over the scores.
       Scores are rounded to 4 dp over a bounded ln-prob range, so the
       (lang, score) value histogram is ≤ ~10^5 distinct values per
       language regardless of corpus size — the same
       histogram-not-rows trick as stats.length_quantiles. The shuffle
       ships (lang, score, count); one cumulative walk per language reads
       off each quantile exactly.
    3. label — thresholds (|langs|·|qs| floats) close over a stateless
       ``map_batches``: bucket = tail if score ≤ q[1/3], middle if
       ≤ q[2/3], else head. No shuffle; the scored stream is consumed
       once more (recomputed — cheaper than materializing at 100 TB).

    Returns (id, lang, n_tokens, lm_score, bucket).
    """
    import math as _math

    from ..pipelines.reports import bucketed_groups

    ref, ln_total = train_unigram_lm(
        ds.select_columns([text_col]), text_col, min_count=1)
    scored = lm_score(ds.select_columns([id_col, lang_col, text_col]),
                      ref, ln_total, id_col, text_col,
                      carry_cols=(lang_col,))

    def hist_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter(zip(batch.column(lang_col).to_pylist(),
                                 batch.column("lm_score").to_pylist()))
        ls, ss, ns = [], [], []
        for (lg, s), cnt in c.items():
            ls.append(lg)
            ss.append(s)
            ns.append(cnt)
        return pa.table({lang_col: pa.array(ls, pa.string()),
                         "__score": pa.array(ss, pa.float64()),
                         "__cnt": pa.array(ns, pa.int64())})

    def per_lang(df):
        import pandas as pd
        out_l, out_q, out_s = [], [], []
        for lg, sub in df.groupby(lang_col, sort=False):
            h = (sub.groupby("__score", sort=True)["__cnt"].sum()
                 .reset_index())
            cum = h["__cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            for q in qs:
                idx = max(_math.ceil(q * n) - 1, 0)
                pos = int((cum <= idx).sum())
                out_l.append(lg)
                out_q.append(q)
                out_s.append(float(h["__score"].iloc[pos]))
        return pd.DataFrame({lang_col: out_l, "q": out_q, "thr": out_s})

    thr_df = bucketed_groups(
        scored.map_batches(hist_partial, batch_format="pyarrow"),
        lang_col, per_lang, buckets=buckets).to_pandas()
    # |langs| × |qs| rows — metadata-sized by construction
    th: dict = {}
    for lg, sub in thr_df.groupby(lang_col):
        th[lg] = [t for _, t in sorted(zip(sub["q"], sub["thr"]))]

    def label(batch: pa.Table) -> pa.Table:
        import numpy as np
        langs = batch.column(lang_col).to_pylist()
        s = batch.column("lm_score").to_numpy(zero_copy_only=False)
        lo = np.array([th[lg][0] for lg in langs])
        hi = np.array([th[lg][1] for lg in langs])
        b = np.where(s <= lo, "tail", np.where(s <= hi, "middle", "head"))
        return batch.append_column("bucket", pa.array(b.tolist(),
                                                      pa.string()))

    return scored.map_batches(label, batch_format="pyarrow")


def quality_buckets_sql(table: str = "documents", id_col: str = "doc_id",
                        col: str = "text", lang_col: str = "lang") -> str:
    """DuckDB twin: the unigram-LM score CTE + per-language tertile
    ``quantile_disc`` thresholds + the same ≤/≤/else CASE. Threshold
    comparisons are between identical rounded doubles on both sides, so
    equality is bit-for-bit."""
    return f"""
WITH toks AS (
  SELECT {id_col}, {lang_col},
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table}
),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c)::DOUBLE AS total FROM counts),
doc_tok AS (SELECT {id_col}, {lang_col}, tok, COUNT(*) AS n FROM toks
            GROUP BY {id_col}, {lang_col}, tok),
scored AS (
  SELECT dt.{id_col}, dt.{lang_col},
         SUM(dt.n)::BIGINT AS n_tokens,
         ROUND(SUM(dt.n * LN(c.c)) / SUM(dt.n) - LN(t.total), 4)
           AS lm_score
  FROM doc_tok dt JOIN counts c USING (tok) CROSS JOIN tot t
  GROUP BY dt.{id_col}, dt.{lang_col}, t.total
),
th AS (
  SELECT {lang_col},
         quantile_disc(lm_score, 1.0/3) AS q1,
         quantile_disc(lm_score, 2.0/3) AS q2
  FROM scored GROUP BY {lang_col}
)
SELECT s.{id_col}, s.{lang_col}, s.n_tokens, s.lm_score,
       CASE WHEN s.lm_score <= th.q1 THEN 'tail'
            WHEN s.lm_score <= th.q2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM scored s JOIN th USING ({lang_col})
ORDER BY s.{id_col}
"""


# ------------------------------------------------- interpolated bigram LM

def train_bigram_lm(ds: rd.Dataset, text_col: str = "text",
                    min_count: int = 1,
                    max_bigrams: int | None = 20_000_000
                    ) -> tuple["ray.ObjectRef", "ray.ObjectRef", float]:
    """One streaming pass → (broadcast {token: count},
    broadcast {(prev, tok): count}, total token occurrences).

    The KenLM-class upgrade of ``train_unigram_lm``: transition counts
    for a Jelinek–Mercer-interpolated bigram model. Both tables ride the
    same partial-Counter → bucketed-exact-sum → ``ray.put`` shape; the
    bigram side is additionally capped at ``max_bigrams`` (count DESC,
    key ASC — deterministic) because a web-scale bigram table is an
    order of magnitude wider than the vocabulary. A cut bigram backs off
    to pure unigram mass through the interpolation itself (its λ-term
    contributes 0), so the cap composes with the model semantics instead
    of adding an OOV rule. ``min_count`` applies to both tables.
    """
    SEP = "\x1f"

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    def big_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = _TOKEN_RE.findall((t or "").lower())
            c.update(SEP.join(p) for p in zip(toks, toks[1:]))
        return pa.table({"key": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    from ..pipelines.reports import bucketed_agg
    uni_ds = bucketed_agg(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        "token", {"count": ("count", "sum")}).materialize()
    total = float(int(uni_ds.sum("count")))
    uni = uni_ds.to_pandas()
    uni = uni[uni["count"] >= min_count]
    uni_map = dict(zip(uni["token"], uni["count"].astype(float)))

    big_ds = bucketed_agg(
        ds.map_batches(big_partial, batch_format="pyarrow"),
        "key", {"count": ("count", "sum")}).materialize()
    if max_bigrams is not None and big_ds.count() > max_bigrams:
        big_ds = big_ds.sort(["count", "key"],
                             descending=[True, False]).limit(max_bigrams)
    big = big_ds.to_pandas()
    big = big[big["count"] >= min_count]
    big_map = {tuple(k.split(SEP, 1)): float(c)
               for k, c in zip(big["key"], big["count"])}
    return ray.put(uni_map), ray.put(big_map), total


def bigram_lm_scores(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", lam: float = 0.75,
                     min_count: int = 1) -> rd.Dataset:
    """Self-scoring interpolated bigram LM (CCNet's KenLM slot, one model
    order up from ``unigram_lm_scores``): per document the mean token
    log-prob under

        p(w_i | w_{i-1}) = λ·c₂(w_{i-1}, w_i)/c₁(w_{i-1})
                           + (1−λ)·c₁(w_i)/total

    with the first token of each doc scored on its unigram term alone.
    In the self-scoring min_count=1 configuration every token and every
    transition is in-model, so the SQL twin is exact. Returns
    (id, n_tokens, lm2_score) — docs with no tokens are dropped; scores
    round to 4 dp (summation-order FP noise ~1e-12, far inside the
    grid)."""
    uni_ref, big_ref, total = train_bigram_lm(ds, text_col, min_count)

    def score(batch: pa.Table) -> pa.Table:
        uni = ray.get(uni_ref)
        big = ray.get(big_ref)
        ids, ns, scores = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = _TOKEN_RE.findall((t or "").lower())
            n = len(toks)
            if n == 0:
                continue
            # unigram floor 1/total for OOV tokens (min_count cuts);
            # missing bigram contributes 0 through the λ-term
            u0 = uni.get(toks[0], 1.0)
            s = math.log(u0 / total)
            for prev, w in zip(toks, toks[1:]):
                cb = big.get((prev, w), 0.0)
                cp = uni.get(prev, 1.0)
                cw = uni.get(w, 1.0)
                s += math.log(lam * (cb / cp) + (1.0 - lam) * (cw / total))
            ids.append(i)
            ns.append(n)
            scores.append(round(s / n, 4))
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "n_tokens": pa.array(ns, pa.int64()),
            "lm2_score": pa.array(scores, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_sql(table_expr: str = "documents", id_col: str = "doc_id",
                  col: str = "text", lam: float = 0.75) -> str:
    """DuckDB twin of the self-scoring min_count=1 configuration of
    ``bigram_lm_scores`` (positional tokens via the unnest /
    generate_series idiom; interpolation mirrored term-for-term)."""
    return f"""
WITH __tl AS (
  SELECT {id_col}, regexp_extract_all(lower({col}), '\\w+') AS ts
  FROM {table_expr}),
__pw AS (
  SELECT {id_col}, ts[i] AS w,
         CASE WHEN i > 1 THEN ts[i - 1] ELSE NULL END AS prev
  FROM (SELECT {id_col}, ts,
               unnest(generate_series(1, len(ts))) AS i FROM __tl)),
__uni AS (SELECT w AS tok, count(*)::DOUBLE AS c FROM __pw GROUP BY w),
__tot AS (SELECT sum(c) AS total FROM __uni),
__big AS (SELECT prev, w, count(*)::DOUBLE AS cb FROM __pw
          WHERE prev IS NOT NULL GROUP BY prev, w),
__lp AS (
  SELECT p.{id_col},
         CASE WHEN p.prev IS NULL
              THEN ln(u.c / (SELECT total FROM __tot))
              ELSE ln({lam} * (b.cb / up.c)
                      + {1.0 - lam} * (u.c / (SELECT total FROM __tot)))
         END AS lp
  FROM __pw p
  JOIN __uni u ON p.w = u.tok
  LEFT JOIN __uni up ON p.prev = up.tok
  LEFT JOIN __big b ON p.prev = b.prev AND p.w = b.w)
SELECT {id_col}, count(*)::BIGINT AS n_tokens,
       round(sum(lp) / count(*), 4) AS lm2_score
FROM __lp GROUP BY {id_col} ORDER BY {id_col}"""


def nb_confusion(ds: rd.Dataset, group_col: str = "source",
                 id_col: str = "doc_id", text_col: str = "text",
                 vocab_cap: int = 5000) -> "pd.DataFrame":
    """Multinomial Naive Bayes source classifier, self-evaluated as a
    confusion matrix (declared source × predicted source, n_docs) — the
    count-trained stand-in for the fastText-style quality/domain
    classifiers used to curate pretraining corpora: if NB can't tell
    two sources apart from token counts, neither can a mixture-weight
    audit, and the pair is a merge candidate.

    Train: token counts per (class, token) via Counter partials →
    token-bucketed exact sums; the vocabulary is capped at ``vocab_cap``
    by (corpus count DESC, token ASC) — deterministic across layouts —
    and out-of-vocabulary tokens are skipped at score time (no OOV
    rule). Add-one smoothing over the capped vocab: p(tok|c) =
    (n_{c,tok}+1)/(N_c+V). The model (V × |classes| log-prob matrix)
    broadcasts once via ray.put; scoring is a per-batch numpy gather +
    matvec, argmax ties broken by class name ascending. Output is
    all-integer (counts), so the driver hash is float-noise-free; the
    per-doc argmax rides the same ln() cross-engine parity as
    ``bigram_lm_scores``."""
    import numpy as np
    import pandas as pd

    from ..pipelines.reports import bucketed_agg

    SEP = "\x1f"

    def cnt_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for tok in _TOKEN_RE.findall((t or "").lower()):
                c[g + SEP + tok] += 1
        return pa.table({"key": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    cnt_ds = bucketed_agg(
        ds.map_batches(cnt_partial, batch_format="pyarrow"),
        "key", {"n": ("n", "sum")}).materialize()

    def tok_of(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        return pa.table({
            "tok": pa.array([k.split(SEP, 1)[1] for k in keys],
                            pa.string()),
            "n": batch.column("n")})

    tot_ds = bucketed_agg(cnt_ds.map_batches(tok_of,
                                             batch_format="pyarrow"),
                          "tok", {"c": ("n", "sum")})
    vocab_pd = tot_ds.sort(["c", "tok"], descending=[True, False]) \
        .limit(vocab_cap).to_pandas()
    vocab = sorted(vocab_pd["tok"])
    vset = set(vocab)
    V = float(len(vocab))

    cnt = cnt_ds.to_pandas()
    ks = cnt["key"].str.split(SEP, n=1, expand=True)
    cnt["cls"], cnt["tok"] = ks[0], ks[1]
    cnt = cnt[cnt["tok"].isin(vset)]

    def prior_partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column(group_col).to_pylist())
        return pa.table({"cls": pa.array(list(c.keys()), pa.string()),
                         "nd": pa.array(list(c.values()), pa.int64())})

    pri = ds.map_batches(prior_partial, batch_format="pyarrow") \
        .to_pandas().groupby("cls", as_index=False)["nd"].sum()
    classes = sorted(pri["cls"])
    n_total = float(pri["nd"].sum())
    logprior = np.array([
        math.log(float(pri.set_index("cls")["nd"][c]) / n_total)
        for c in classes])

    nc = cnt.groupby("cls")["n"].sum().astype(float)
    tok_index = {t: i for i, t in enumerate(vocab)}
    cls_index = {c: j for j, c in enumerate(classes)}
    nmat = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    nmat[[tok_index[t] for t in cnt["tok"]],
         [cls_index[c] for c in cnt["cls"]]] = \
        cnt["n"].to_numpy(dtype=np.float64)
    denom = np.array([float(nc.get(c, 0.0)) + V for c in classes])
    logp = np.log((nmat + 1.0) / denom)
    model_ref = ray.put((tok_index, logp, logprior))

    def score(batch: pa.Table) -> pa.Table:
        tidx, lp, lpr = ray.get(model_ref)
        out: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            c: Counter = Counter(
                tok for tok in _TOKEN_RE.findall((t or "").lower())
                if tok in tidx)
            if c:
                idxs = np.fromiter((tidx[t] for t in c.keys()),
                                   dtype=np.int64, count=len(c))
                m = np.fromiter(c.values(), dtype=np.float64,
                                count=len(c))
                s = m @ lp[idxs] + lpr
            else:
                s = lpr
            out[(g, int(np.argmax(s)))] += 1
        ks = list(out.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "pj": pa.array([k[1] for k in ks], pa.int64()),
            "n_docs": pa.array([out[k] for k in ks], pa.int64())})

    conf = ds.select_columns([group_col, text_col]) \
        .map_batches(score, batch_format="pyarrow").to_pandas() \
        .groupby([group_col, "pj"], as_index=False)["n_docs"].sum()
    conf["predicted"] = [classes[j] for j in conf["pj"]]
    conf["n_docs"] = conf["n_docs"].astype("int64")
    return (conf[[group_col, "predicted", "n_docs"]]
            .sort_values([group_col, "predicted"])
            .reset_index(drop=True))


def nb_confusion_sql(table: str = "documents", group_col: str = "source",
                     id_col: str = "doc_id", col: str = "text",
                     vocab_cap: int = 5000) -> str:
    """DuckDB twin of ``nb_confusion``: identical capped vocabulary
    ((count DESC, tok ASC) LIMIT), add-one smoothing term-for-term, the
    same ln() expressions, argmax via row_number ORDER BY (s DESC, class
    ASC)."""
    return f"""
WITH __toks AS (
  SELECT {id_col}, {group_col} AS src,
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table}),
__vocab AS (
  SELECT tok FROM (SELECT tok, count(*) AS c FROM __toks GROUP BY tok)
  ORDER BY c DESC, tok LIMIT {vocab_cap}),
__vn AS (SELECT count(*)::DOUBLE AS v FROM __vocab),
__pri AS (SELECT {group_col} AS cls, count(*)::DOUBLE AS nd
          FROM {table} GROUP BY 1),
__tot AS (SELECT sum(nd) AS t FROM __pri),
__cnt AS (SELECT t.src AS cls, t.tok, count(*)::DOUBLE AS n
          FROM __toks t JOIN __vocab v USING (tok) GROUP BY 1, 2),
__nc AS (SELECT p.cls, coalesce(sum(c.n), 0.0) AS nc
         FROM __pri p LEFT JOIN __cnt c USING (cls) GROUP BY p.cls),
__dt AS (SELECT t.{id_col}, t.tok, count(*)::DOUBLE AS m
         FROM __toks t JOIN __vocab v USING (tok) GROUP BY 1, 2),
__scores AS (
  SELECT d.{id_col}, d.{group_col} AS source, p.cls,
         ln(p.nd / (SELECT t FROM __tot)) + coalesce(sum(
             dt.m * ln((coalesce(c.n, 0) + 1) /
                       (nc.nc + (SELECT v FROM __vn)))), 0.0) AS s
  FROM {table} d
  CROSS JOIN __pri p
  JOIN __nc nc ON nc.cls = p.cls
  LEFT JOIN __dt dt ON dt.{id_col} = d.{id_col}
  LEFT JOIN __cnt c ON c.cls = p.cls AND c.tok = dt.tok
  GROUP BY d.{id_col}, d.{group_col}, p.cls, p.nd, nc.nc),
__pred AS (
  SELECT source, cls AS predicted,
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY s DESC, cls ASC) AS rn
  FROM __scores)
SELECT source, predicted, count(*)::BIGINT AS n_docs
FROM __pred WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2"""
