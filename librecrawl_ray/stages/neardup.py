"""D3 — near-duplicate content detection (issue_detector.py:1299-1431).

Scoring is the reference's, exactly: weighted SequenceMatcher ratios over
lowercased title (.35), meta description (.35), h1 (.20) plus word-count
min/max ratio (.10); symmetric pair issues at threshold ≥ 0.85, with the
same staged upper-bound early exits (word-count prune, real_quick_ratio
prunes) inside each pair evaluation.

The reference runs all-pairs O(N²) over the whole crawl. That cannot scale;
here the all-pairs comparison runs *within blocks*:

- ``exact=True``  — single block (全 all-pairs), used at fixture scale for
  1:1 score parity with the reference.
- ``exact=False`` — candidate blocking: each page lands in up to three
  blocks (4-char lowercase prefix of title / desc / h1). A pair scoring
  ≥ 0.85 must score ≥ 0.5 on at least one text field (0.85 − 0.35 − 0.10
  means title+h1 alone can't carry it, so desc ≥ (0.85−0.65)/0.35 ≈ 0.57
  when the others are perfect) — highly similar strings overwhelmingly
  share a short prefix, making prefix blocks a high-recall candidate set;
  the fixture tests assert blocked recall == exact recall on the t1 corpus.
  Blocks are processed via groupby(block).map_groups — the same shuffle
  shape as a MinHash-LSH band pass.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pyarrow as pa
import ray.data as rd

WEIGHTS = {"title": 0.35, "desc": 0.35, "h1": 0.20, "word_count": 0.10}
THRESHOLD_DEFAULT = 0.85


def preprocess(row: dict) -> dict:
    return {
        "url": row.get("url", ""),
        "title": (row.get("title") or "").lower().strip(),
        "desc": (row.get("meta_description") or "").lower().strip(),
        "h1": (row.get("h1") or "").lower().strip(),
        "word_count": row.get("word_count", 0) or 0,
    }


def pair_score(d1: dict, d2: dict, threshold: float) -> float | None:
    """Reference-exact staged scoring; None = pruned below threshold."""
    if d1["word_count"] and d2["word_count"]:
        mx = max(d1["word_count"], d2["word_count"])
        wc_sim = min(d1["word_count"], d2["word_count"]) / mx if mx else 0
    else:
        wc_sim = 0
    score = wc_sim * WEIGHTS["word_count"]
    max_potential = 1.0 - WEIGHTS["word_count"] + score
    if max_potential < threshold:
        return None
    for field, w in (("title", WEIGHTS["title"]), ("desc", WEIGHTS["desc"])):
        if d1[field] and d2[field]:
            m = SequenceMatcher(None, d1[field], d2[field])
            if m.real_quick_ratio() * w + (max_potential - w) < threshold:
                return None
            # quick_ratio (char-multiset bound, no LCS) is also an upper
            # bound on ratio — exactness-preserving prune
            if m.quick_ratio() * w + (max_potential - w) < threshold:
                return None
            sim = m.ratio()
        else:
            sim = 0
        score += sim * w
        max_potential = max_potential - w + sim * w
        if max_potential < threshold:
            return None
    if d1["h1"] and d2["h1"]:
        h1_sim = SequenceMatcher(None, d1["h1"], d2["h1"]).ratio()
    else:
        h1_sim = 0
    score += h1_sim * WEIGHTS["h1"]
    return score if score >= threshold else None


def _candidate_pairs(rows: list[dict], threshold: float):
    """Vectorized exactness-preserving prefilter: for every pair compute
    an upper bound on the reference score — exact wc_sim plus, per text
    field, SequenceMatcher.quick_ratio (char-multiset bound, >= ratio)
    weighted as pair_score weights it. Pairs whose bound is below the
    threshold can never score >= threshold, so only survivors reach the
    per-pair staged scorer. numpy over an n x vocab char-count matrix —
    no Python pair loop for the pruned majority."""
    import numpy as np
    n = len(rows)
    wc = np.array([r["word_count"] or 0 for r in rows], dtype=np.float64)
    mn = np.minimum.outer(wc, wc)
    mx = np.maximum.outer(wc, wc)
    wc_sim = np.where(mn > 0, mn / np.where(mx > 0, mx, 1.0), 0.0)
    bound = wc_sim * WEIGHTS["word_count"]
    from collections import Counter
    for f, w in (("title", WEIGHTS["title"]), ("desc", WEIGHTS["desc"]),
                 ("h1", WEIGHTS["h1"])):
        texts = [r[f] for r in rows]
        counters = [Counter(t) for t in texts]
        vocab: dict[str, int] = {}
        for c in counters:
            for ch in c:
                vocab.setdefault(ch, len(vocab))
        C = np.zeros((n, max(len(vocab), 1)), dtype=np.int32)
        lens = np.zeros(n)
        for i, c in enumerate(counters):
            lens[i] = len(texts[i])
            for ch, k in c.items():
                C[i, vocab[ch]] = k
        summin = np.empty((n, n))
        for i in range(n):
            summin[i] = np.minimum(C[i], C).sum(axis=1)
        lsum = lens[:, None] + lens[None, :]
        qr = np.where((lens[:, None] > 0) & (lens[None, :] > 0),
                      2.0 * summin / np.where(lsum > 0, lsum, 1.0), 0.0)
        bound += np.minimum(qr, 1.0) * w
    ii, jj = np.nonzero(np.triu(bound >= threshold, k=1))
    return zip(ii.tolist(), jj.tolist())


def _pairs_in_block(rows: list[dict], threshold: float) -> list[dict]:
    out = []
    for i, j in _candidate_pairs(rows, threshold):
        s = pair_score(rows[i], rows[j], threshold)
        if s is not None:
            a, b = rows[i]["url"], rows[j]["url"]
            if a > b:
                a, b = b, a
            out.append({"url_a": a, "url_b": b,
                        "score": round(s, 6)})
    return out


PAIRS_SCHEMA = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("score", pa.float64())])


def near_duplicate_pairs(pages: rd.Dataset,
                         threshold: float = THRESHOLD_DEFAULT,
                         exact: bool = False,
                         prefix_len: int = 4,
                         max_block: int = 512) -> pa.Table:
    """Detect near-duplicate page pairs; returns (url_a, url_b, score)."""
    narrow = pages.select_columns(["url", "title", "meta_description",
                                   "h1", "word_count"])
    if exact:
        rows = [preprocess(r) for b in narrow.iter_batches(
                    batch_format="pyarrow", batch_size=8192)
                for r in b.to_pylist()]
        return pa.Table.from_pylist(_pairs_in_block(rows, threshold),
                                    schema=PAIRS_SCHEMA)

    def explode_blocks(batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            p = preprocess(r)
            blocks = set()
            for f in ("title", "desc", "h1"):
                if p[f]:
                    blocks.add(f[0] + ":" + p[f][:prefix_len])
            for bkey in blocks:
                out.append({**p, "block": bkey})
        if not out:
            return pa.schema(list(PREP_SCHEMA) +
                             [("block", pa.string())]).empty_table()
        return pa.Table.from_pylist(out)

    import pandas as pd

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("block"):
            if len(g) > max_block:
                # template-heavy corpora can put thousands of pages in one
                # prefix block; subdivide by word-count bucket (the
                # reference's own wc-ratio prune direction) before the
                # quadratic comparison. A cross-bucket pair needs near-
                # perfect similarity on all text fields to reach 0.85 with
                # wc_sim < 50/(50+bucket width) — rare by construction.
                for _, sub in g.groupby(g["word_count"] // 50):
                    out.extend(_pairs_in_block(sub.to_dict("records"),
                                               threshold))
            else:
                out.extend(_pairs_in_block(g.to_dict("records"), threshold))
        return pd.DataFrame(out, columns=["url_a", "url_b", "score"])

    from ..pipelines.reports import bucketed_groups
    pairs_ds = bucketed_groups(
        narrow.map_batches(explode_blocks, batch_format="pyarrow"),
        "block", per_bucket)
    pdf = pairs_ds.to_pandas()
    if pdf.empty:
        return PAIRS_SCHEMA.empty_table()
    pdf = pdf.drop_duplicates(["url_a", "url_b"]).sort_values(
        ["url_a", "url_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pdf, schema=PAIRS_SCHEMA,
                                preserve_index=False)


PREP_SCHEMA = pa.schema([
    ("url", pa.string()), ("title", pa.string()), ("desc", pa.string()),
    ("h1", pa.string()), ("word_count", pa.int64()),
])


def duplication_issues(pairs: pa.Table) -> pa.Table:
    """Symmetric issue rows for each pair (reference emission shape)."""
    rows = []
    for r in pairs.to_pylist():
        pct = f"{r['score'] * 100:.1f}"
        rows.append({"url": r["url_a"], "type": "warning",
                     "category": "Duplication",
                     "issue": "Duplicate Content Detected",
                     "details": f"Content is {pct}% similar to {r['url_b']}"})
        rows.append({"url": r["url_b"], "type": "warning",
                     "category": "Duplication",
                     "issue": "Duplicate Content Detected",
                     "details": f"Content is {pct}% similar to {r['url_a']}"})
    from ..schema import ISSUES_SCHEMA
    if not rows:
        return ISSUES_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=ISSUES_SCHEMA)
