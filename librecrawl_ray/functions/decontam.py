"""Benchmark decontamination for training corpora.

Flags training documents that share token n-grams with a held-out
benchmark/eval split — the standard pre-training hygiene pass (the GPT-3
appendix-C shape: 13-gram overlap vs eval sets; n is a parameter here and
fixtures use smaller n for signal). The reference has no counterpart; this
generalizes its keyword/duplication scans (issue_detector.py:1299-1431) to
corpus-vs-benchmark overlap.

Ray-Data-first shape:
- The benchmark split is tiny relative to the corpus (eval sets are
  10^3–10^6 docs vs 10^9+ training docs), so its distinct n-gram set is
  collected once and broadcast via ``ray.put`` — every scoring task reads
  it zero-copy from the object store; the corpus side STREAMS through one
  ``map_batches`` pass. No shuffle at all.
- If the "benchmark" were itself corpus-sized, the broadcast degenerates;
  the scale path then is a hash-partitioned semi-join on the gram key
  (flat (doc, gram) rows → bucketed_groups on gram, the
  winnow_neardup_pairs shape). Not needed for real benchmark sizes.

Tokenization matches the DuckDB twin exactly:
``regexp_extract_all(lower(text), '\\w+')`` == ``_TOKEN_RE.findall(lower)``
(the proven-parity tokenizer of the minhash oracle), with the same
short-doc rule: fewer than n tokens → one partial gram, zero tokens → none.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _shingles


def benchmark_ngram_set(ds: rd.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        bench_mod: int = 37) -> set[str]:
    """Distinct n-grams of the benchmark split (``id % bench_mod == 0`` —
    the deterministic eval-split convention used across the fixtures).
    Per-batch gram sets are unioned on the driver; the result is
    benchmark-sized, not corpus-sized."""
    def grams(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            if int(i) % bench_mod == 0:
                out.update(_shingles(t, n))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    parts = (ds.select_columns([id_col, text_col])
             .map_batches(grams, batch_format="pyarrow").to_pandas())
    return set(parts["gram"])


def decontaminate(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5,
                  bench_mod: int = 37,
                  bench_grams: set[str] | None = None) -> pa.Table:
    """Per-training-doc contamination score vs the benchmark split:
    (doc_id, overlap = #distinct shared n-grams, contaminated = overlap>0).
    Benchmark docs themselves are excluded from the output (they are the
    eval set, not training data)."""
    if bench_grams is None:
        bench_grams = benchmark_ngram_set(ds, id_col, text_col, n,
                                          bench_mod)
    ref = ray.put(bench_grams)

    def score(batch: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        out_id, out_ov = [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            if int(i) % bench_mod == 0:
                continue
            g = set(_shingles(t, n))
            out_id.append(int(i))
            out_ov.append(len(g & bset))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "overlap": pa.array(out_ov, pa.int64()),
            "contaminated": pa.array([v > 0 for v in out_ov], pa.bool_())})

    out = (ds.select_columns([id_col, text_col])
           .map_batches(score, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    schema = pa.schema([("doc_id", pa.int64()), ("overlap", pa.int64()),
                        ("contaminated", pa.bool_())])
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def decontaminate_sql(table: str = "documents", n: int = 5,
                      bench_mod: int = 37) -> str:
    """DuckDB twin: same tokenizer, same short-doc rule, distinct-gram
    intersection counts via a gram-key join."""
    toks = "regexp_extract_all(lower(text), '\\w+')"
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n)) \
        .replace("t[i+0]", "t[i]")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM {table}),
g AS (
  SELECT doc_id,
    CASE WHEN len(t) = 0 THEN []
         WHEN len(t) < {n} THEN [array_to_string(t, ' ')]
         ELSE list_distinct(list_transform(
                generate_series(1, len(t) - {n - 1}), i -> {concat}))
    END AS gs
  FROM toks),
bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g
          WHERE doc_id % {bench_mod} = 0),
flat AS (SELECT doc_id, unnest(gs) AS gram FROM g
         WHERE doc_id % {bench_mod} <> 0),
hits AS (SELECT f.doc_id, count(DISTINCT f.gram) AS overlap
         FROM flat f JOIN bench b ON f.gram = b.gram GROUP BY 1)
SELECT d.doc_id,
       coalesce(h.overlap, 0)::BIGINT AS overlap,
       coalesce(h.overlap, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {bench_mod} <> 0
ORDER BY d.doc_id
"""
