"""Mergeable streaming sketches: HyperLogLog distinct counting,
Misra–Gries heavy hitters, and Count-Min frequency estimation.

At 100 TB, "how many distinct tokens" and "which tokens dominate" are
questions a pipeline wants answered WITHOUT an exact all-to-all
(token, count) shuffle: a vocabulary-sized exchange costs more than the
answer is worth when a bounded-memory estimate suffices. Both sketches
here are classic mergeable summaries (Agarwal et al., "Mergeable
Summaries", PODS 2012):

- **HyperLogLog** (Flajolet et al. 2007): each block reduces to an
  m-register array (one small row), registers max-merge associatively,
  the estimate is a deterministic function of the merged registers. The
  hash is md5-derived, so the ENTIRE sketch — bucket split, rank
  (leftmost-1-bit), harmonic mean, small-range correction — is
  re-derivable in SQL: the oracle verifies the exact register state and
  estimate, not just "close enough".
- **Misra–Gries / SpaceSaving-style heavy hitters**: each block keeps at
  most ``k_cap`` counters (decrement rule), summaries merge by counter
  addition + re-trim. Merged error is bounded by n/(k_cap+1); when
  ``k_cap`` exceeds the distinct-key count no decrement ever fires and
  the sketch is EXACT — the oracle configuration (same
  exhaustive-config-equals-exact pattern as the IVF and PQ oracles).
- **Count-Min** (Cormode & Muthukrishnan 2005): ``d`` hash rows ×
  ``w`` cells of int64 counts; blocks merge by plain addition (exact,
  commutative → layout-independent), point queries take the min over
  rows. Overestimate is bounded by 2n/w per row w.h.p. The d row
  hashes are disjoint 32-bit slices of md5(token), so the oracle
  re-derives every probed CELL — the sum of true counts of all tokens
  colliding into it — in SQL and pins the exact estimate, collisions
  included, not a tolerance.

Distributed shape: one ``map_batches`` pass emits per-block summaries
(bounded rows, never raw streams); merging is associative, so at
cluster scale the partials reduce through a tree — here the final merge
runs on the driver over block-count-bounded rows.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"\w+")

HLL_P = 12                      # 4096 registers, ~1.6% relative error
HLL_M = 1 << HLL_P
_W_BITS = 64 - HLL_P
_W_MASK = (1 << _W_BITS) - 1


def _hash64(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)


def _hll_update(regs: np.ndarray, toks: set[str]) -> None:
    for tok in toks:
        h = _hash64(tok)
        j = h >> _W_BITS
        w = h & _W_MASK
        rho = _W_BITS - w.bit_length() + 1 if w > 0 else _W_BITS + 1
        if rho > regs[j]:
            regs[j] = rho


def hll_distinct(ds: rd.Dataset, text_col: str = "text") -> "pd.DataFrame":
    """Estimate the corpus-wide distinct-token count with HyperLogLog,
    next to the exact count (fp-bucketed distinct) so the report shows
    the sketch error directly. Returns one row:
    (m, n_zero_registers, hll_estimate, n_exact).

    Numeric contract (mirrored in SQL): α = 0.7213/(1+1.079/m),
    E = α·m²/Σ2^(−M_j) with zero registers contributing 2⁰;
    small-range correction E = m·ln(m/V) when E ≤ 2.5m and V>0;
    half-away-rounded to 6 dp."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, np.int8)
        seen: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            seen.update(_TOKEN_RE.findall((t or "").lower()))
        _hll_update(regs, seen)
        return pa.table({
            "regs": pa.array([regs.tolist()], pa.list_(pa.int8())),
            "toks": pa.array([sorted(seen)], pa.list_(pa.string()))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    # registers max-merge on the driver (block-count-bounded rows); the
    # exact count comes from a bucketed distinct over the same partial
    # token sets (per-block distinct, then per-bucket global dedup)
    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column("toks")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"tok": col.values})

    from ..pipelines.reports import bucketed_groups
    mat = parts.materialize()
    exact = bucketed_groups(
        mat.map_batches(explode, batch_format="pyarrow"), "tok",
        lambda df: df.drop_duplicates(["tok"]), buckets=16).count()

    regs = np.zeros(HLL_M, np.int64)
    for row in mat.select_columns(["regs"]).iter_batches(
            batch_format="pyarrow"):
        for r in row.column("regs").to_pylist():
            regs = np.maximum(regs, np.asarray(r, np.int64))

    v = int((regs == 0).sum())
    s = float(np.power(2.0, -regs.astype(np.float64)).sum())
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / s
    if est <= 2.5 * HLL_M and v > 0:
        est = HLL_M * math.log(HLL_M / v)
    est = math.floor(est * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"m": [HLL_M], "n_zero_registers": [v],
                         "hll_estimate": [est], "n_exact": [exact]})


def hll_distinct_sql(table_expr: str = "documents",
                     col: str = "text") -> str:
    """DuckDB twin of ``hll_distinct``: the md5-derived hash makes the
    register state itself reproducible in SQL — bucket split, rank and
    the corrected estimate are all re-derived, so a green row pins the
    whole sketch, not a tolerance."""
    p, m, wb = HLL_P, HLL_M, _W_BITS
    return f"""
WITH __toks AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}),
__h AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) AS hv
  FROM __toks),
__jr AS (
  SELECT (hv >> {wb}) AS j,
         (hv & ((1::UBIGINT << {wb}) - 1)) AS w FROM __h),
__regs AS (
  SELECT j, max(CASE WHEN w > 0
                     THEN {wb} - length(format('{{:b}}', w::BIGINT)) + 1
                     ELSE {wb} + 1 END) AS r
  FROM __jr GROUP BY j),
__agg AS (
  SELECT count(*) AS nz, sum(power(2.0, -r)) AS s_nz FROM __regs),
__est AS (
  SELECT ({m} - nz) AS v,
         (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
             / (s_nz + ({m} - nz) * 1.0) AS e_raw
  FROM __agg)
SELECT {m}::BIGINT AS m, v::BIGINT AS n_zero_registers,
       floor(CASE WHEN e_raw <= 2.5 * {m} AND v > 0
                  THEN {m} * ln({m} / v) ELSE e_raw END * 1e6 + 0.5)
           / 1e6 AS hll_estimate,
       (SELECT count(*) FROM __toks)::BIGINT AS n_exact
FROM __est"""


def _mg_trim(c: Counter, k_cap: int) -> Counter:
    """Misra–Gries decrement: keep at most ``k_cap`` counters by
    subtracting the (k_cap+1)-th largest count from every counter and
    dropping non-positives (the mergeable-summaries trim rule)."""
    if len(c) <= k_cap:
        return c
    dec = sorted(c.values(), reverse=True)[k_cap]
    return Counter({t: n - dec for t, n in c.items() if n - dec > 0})


def heavy_hitters(ds: rd.Dataset, k: int = 20, k_cap: int = 200_000,
                  text_col: str = "text") -> "pd.DataFrame":
    """Top-``k`` tokens by a Misra–Gries mergeable sketch: each block
    reduces to ≤``k_cap`` counters, summaries merge by addition +
    re-trim, no (token, count) shuffle ever happens. Merged
    underestimate is bounded by total_tokens/(k_cap+1); with ``k_cap``
    above the distinct-token count the sketch is exact — the oracle
    configuration. Ties at rank k break by token ASC (deterministic).
    Returns (rank, token, count)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        c = _mg_trim(c, k_cap)
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "count": pa.array(list(c.values()), pa.int64())})

    merged: Counter = Counter()
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        # one iter batch may concatenate several block summaries, so the
        # same token can appear on multiple rows — accumulate, never
        # dict-collapse
        for tok, cnt in zip(batch.column("token").to_pylist(),
                            batch.column("count").to_pylist()):
            merged[tok] += cnt
        merged = _mg_trim(merged, k_cap)

    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "token": [t for t, _ in top],
        "count": np.asarray([n for _, n in top], np.int64)})


def heavy_hitters_sql(table_expr: str = "documents", k: int = 20,
                      col: str = "text") -> str:
    """DuckDB twin of the exact (k_cap ≥ distinct tokens)
    configuration of ``heavy_hitters``."""
    return f"""
WITH __toks AS (
  SELECT unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}),
__c AS (SELECT tok, count(*)::BIGINT AS n FROM __toks GROUP BY tok)
SELECT row_number() OVER (ORDER BY n DESC, tok) AS rank,
       tok AS token, n AS count
FROM __c ORDER BY n DESC, tok LIMIT {k}"""


CMS_D = 4                       # hash rows (md5 gives 4 disjoint u32s)
CMS_W = 1 << 12                 # 4096 cells/row: ~0.05% of stream per cell


def _cms_cells(tok: str, w: int = CMS_W) -> list[int]:
    """Row cells for ``tok``: md5's 32 hex chars sliced into CMS_D
    disjoint 32-bit words, each mod ``w`` (mirrored in SQL)."""
    hx = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return [int(hx[i * 8:(i + 1) * 8], 16) % w for i in range(CMS_D)]


def cms_point_counts(ds: rd.Dataset, probes: list[str],
                     text_col: str = "text") -> "pd.DataFrame":
    """Count-Min point-frequency estimates for ``probes`` next to their
    exact stream counts, so the report shows the one-sided sketch error
    directly. Returns (token, cms_estimate, n_exact) per probe, token
    ASC.

    Distributed shape: one ``map_batches`` pass reduces each block to a
    d×w int64 table (CMS_D·CMS_W·8 B ≈ 128 KB, independent of block
    size) plus the block's exact probe counts; tables ADD-merge
    (associative and exact, so the result is block-layout independent)
    through the driver over block-count-bounded rows — at cluster scale
    the same addition reduces through a tree. No (token, count) shuffle
    ever happens; the probes' exact counts ride the same pass as a
    bounded Counter."""
    import pandas as pd

    probe_set = sorted(set(probes))

    def partial(batch: pa.Table) -> pa.Table:
        tab = np.zeros((CMS_D, CMS_W), np.int64)
        exact: Counter = Counter()
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        for tok, n in c.items():
            for i, cell in enumerate(_cms_cells(tok)):
                tab[i, cell] += n
            if tok in probe_set:
                exact[tok] = n
        return pa.table({
            "tab": pa.array([tab.ravel().tolist()], pa.list_(pa.int64())),
            "exact": pa.array(
                [[int(exact.get(p, 0)) for p in probe_set]],
                pa.list_(pa.int64()))})

    tab = np.zeros(CMS_D * CMS_W, np.int64)
    exact = np.zeros(len(probe_set), np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for row in batch.column("tab").to_pylist():
            tab += np.asarray(row, np.int64)
        for row in batch.column("exact").to_pylist():
            exact += np.asarray(row, np.int64)

    tab = tab.reshape(CMS_D, CMS_W)
    est = [int(min(tab[i, cell] for i, cell
                   in enumerate(_cms_cells(p)))) for p in probe_set]
    return pd.DataFrame({"token": probe_set,
                         "cms_estimate": np.asarray(est, np.int64),
                         "n_exact": exact})


def cms_point_counts_sql(probes: list[str],
                         table_expr: str = "documents",
                         col: str = "text") -> str:
    """DuckDB twin of ``cms_point_counts``: re-derives each probed cell
    as the sum of true counts of every token hashing into it (the md5
    slices make the collision set computable), then the row-min — a
    green row pins the sketch estimate exactly, collisions included."""
    probe_set = sorted(set(probes))
    plist = ", ".join("'" + p.replace("'", "''") + "'"
                      for p in probe_set)
    return f"""
WITH __toks AS (
  SELECT unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}),
__c AS (SELECT tok, count(*)::BIGINT AS n FROM __toks GROUP BY tok),
__rows AS (SELECT unnest(range({CMS_D})) AS i),
__cells AS (
  SELECT r.i,
         CAST('0x' || substr(md5(c.tok), 1 + r.i::INT * 8, 8) AS UBIGINT)
             % {CMS_W} AS cell,
         c.n
  FROM __c c CROSS JOIN __rows r),
__probes AS (SELECT unnest([{plist}]) AS ptok),
__pcells AS (
  SELECT p.ptok, r.i,
         CAST('0x' || substr(md5(p.ptok), 1 + r.i::INT * 8, 8) AS UBIGINT)
             % {CMS_W} AS cell
  FROM __probes p CROSS JOIN __rows r),
__rowest AS (
  SELECT pc.ptok, pc.i, coalesce(sum(c.n), 0)::BIGINT AS cell_n
  FROM __pcells pc LEFT JOIN __cells c
       ON c.i = pc.i AND c.cell = pc.cell
  GROUP BY pc.ptok, pc.i)
SELECT r.ptok AS token, min(r.cell_n)::BIGINT AS cms_estimate,
       coalesce(any_value(e.n), 0)::BIGINT AS n_exact
FROM __rowest r LEFT JOIN __c e ON e.tok = r.ptok
GROUP BY r.ptok ORDER BY token"""


class KLLSketch:
    """Deterministic KLL-style mergeable quantile summary (Karnin,
    Lang & Liberty 2016, derandomized): levels of ≤``k`` int64 items,
    level ``i`` items each standing for 2^i stream values. Compaction
    sorts a full level and promotes alternating survivors (parity from
    a per-level counter, so the whole structure is deterministic given
    the merge order — no RNG). Every compaction event at level ``i``
    shifts any rank estimate by at most 2^i, and the sketch ACCUMULATES
    that bound in ``max_rank_err``: the answer ships with its own
    certified error, which is what the property test asserts. With
    ``k`` above the stream size no compaction fires and every quantile
    is exact — the oracle configuration (same pattern as Misra–Gries).

    At 100 TB: levels hold O(k·log(n/k)) items regardless of n — the
    general-domain complement to ``stats.length_quantiles``'s exact
    bounded-histogram trick (which needs a small value domain)."""

    def __init__(self, k: int = 1 << 17):
        self.k = k
        self.levels: list[list[int]] = [[]]
        self.n = 0
        self.max_rank_err = 0
        self._parity: list[int] = [0]

    def add_many(self, vals) -> None:
        self.levels[0].extend(int(v) for v in vals)
        self.n += len(vals)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = sorted(self.levels[i])
                # compact an even-length buffer only (each promoted item
                # absorbs exactly one dropped neighbour, so total weight
                # — and therefore n — is conserved); an odd straggler
                # stays at this level
                leftover = []
                if len(buf) % 2:
                    leftover = [buf[-1]]
                    buf = buf[:-1]
                if i + 1 == len(self.levels):
                    self.levels.append([])
                    self._parity.append(0)
                off = self._parity[i] & 1
                self._parity[i] += 1
                self.levels[i + 1].extend(buf[off::2])
                self.levels[i] = leftover
                self.max_rank_err += 1 << i
            i += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self._parity.append(0)
        for i, lv in enumerate(other.levels):
            self.levels[i].extend(lv)
        self.n += other.n
        self.max_rank_err += other.max_rank_err
        self._compress()
        return self

    def quantile(self, q: float) -> int:
        """Smallest item whose cumulative weight reaches ceil(q·n)
        (quantile_disc-style lower rank; mirrored in the SQL twin)."""
        items: list[tuple[int, int]] = []
        for i, lv in enumerate(self.levels):
            items.extend((v, 1 << i) for v in lv)
        items.sort()
        target = max(math.ceil(q * self.n), 1)
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    def to_rows(self) -> tuple[list[list[int]], int, int]:
        return ([list(lv) for lv in self.levels], self.n,
                self.max_rank_err)

    @classmethod
    def from_rows(cls, levels, n, err, k: int = 1 << 17) -> "KLLSketch":
        s = cls(k)
        s.levels = [list(lv) for lv in levels]
        s._parity = [0] * len(s.levels)
        s.n = int(n)
        s.max_rank_err = int(err)
        return s


def kll_quantiles(ds: rd.Dataset,
                  qs: tuple = (0.01, 0.25, 0.5, 0.75, 0.99),
                  text_col: str = "text",
                  k: int = 1 << 17) -> "pd.DataFrame":
    """Document char-length quantiles via a mergeable KLL summary:
    each block reduces to one bounded sketch row, sketches merge on the
    driver (tree-reducible at cluster scale), answers carry a certified
    max rank error. Returns (q, n, max_rank_err, value); with the
    default ``k`` above the fixture sizes the sketch is exact and the
    SQL twin pins every value."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        s = KLLSketch(k)
        s.add_many(pa.compute.utf8_length(
            batch.column(text_col).fill_null("")).to_pylist())
        levels, n, err = s.to_rows()
        return pa.table({
            "levels": pa.array([levels], pa.list_(pa.list_(pa.int64()))),
            "n": pa.array([n], pa.int64()),
            "err": pa.array([err], pa.int64())})

    merged = KLLSketch(k)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for levels, n, err in zip(batch.column("levels").to_pylist(),
                                  batch.column("n").to_pylist(),
                                  batch.column("err").to_pylist()):
            merged.merge(KLLSketch.from_rows(levels, n, err, k))

    return pd.DataFrame({
        "q": list(qs),
        "n": np.full(len(qs), merged.n, np.int64),
        "max_rank_err": np.full(len(qs), merged.max_rank_err, np.int64),
        "value": np.asarray([merged.quantile(q) for q in qs], np.int64)})


def kll_quantiles_sql(table_expr: str = "documents",
                      qs: tuple = (0.01, 0.25, 0.5, 0.75, 0.99),
                      col: str = "text") -> str:
    """DuckDB twin of the exact (k ≥ stream size) configuration:
    smallest value at cumulative rank ceil(q·n), zero certified error."""
    qlist = ", ".join(str(q) for q in qs)
    return f"""
WITH __v AS (
  SELECT length(coalesce({col}, ''))::BIGINT AS val FROM {table_expr}),
__s AS (
  SELECT val, row_number() OVER (ORDER BY val) AS rn,
         count(*) OVER () AS n
  FROM __v),
__q AS (SELECT unnest([{qlist}]) AS q)
SELECT q.q AS q, any_value(s.n)::BIGINT AS n, 0::BIGINT AS max_rank_err,
       min(s.val)::BIGINT AS value
FROM __q q JOIN __s s ON s.rn >= greatest(ceil(q.q * s.n), 1)
GROUP BY q.q ORDER BY q"""


def hll_source_algebra(ds: rd.Dataset, text_col: str = "text",
                       source_col: str = "source") -> "pd.DataFrame":
    """Sketch SET ALGEBRA across sources: one HLL per source, pairwise
    union by register max-merge, intersection by inclusion–exclusion
    (est_a + est_b − est_union). This is the question a mixture designer
    asks of a 100-TB corpus — "how much vocabulary do src3 and src7
    share?" — answered from |sources|·m bytes of mergeable state instead
    of the token-bucketed exact shuffle (``stats.source_vocab_overlap``
    is the exact counterpart; this is its constant-memory sibling).

    Distributed shape: one ``map_batches`` pass emits (source, regs)
    partial rows — each block reduces to ≤|sources-in-block| register
    arrays; the driver max-merges |sources|·m int8s and runs the pure
    pair algebra. I-E intersection estimates can go negative for
    near-disjoint sets; the raw value is reported (both sides compute
    the identical double expression, so the twin stays bit-exact).

    Returns (src_a, src_b, est_a, est_b, est_union, est_intersection),
    one row per unordered pair, estimates 6-dp half-away-rounded."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        per_src: dict[str, set] = {}
        for s, t in zip(batch.column(source_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            per_src.setdefault(s, set()).update(
                _TOKEN_RE.findall((t or "").lower()))
        srcs, regs_out = [], []
        for s, toks in per_src.items():
            regs = np.zeros(HLL_M, np.int8)
            _hll_update(regs, toks)
            srcs.append(s)
            regs_out.append(regs.tolist())
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "regs": pa.array(regs_out, pa.list_(pa.int8()))})

    merged: dict[str, np.ndarray] = {}
    for b in ds.select_columns([source_col, text_col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for s, r in zip(b.column("source").to_pylist(),
                        b.column("regs").to_pylist()):
            cur = merged.setdefault(s, np.zeros(HLL_M, np.int64))
            np.maximum(cur, np.asarray(r, np.int64), out=cur)

    def est(regs: np.ndarray) -> float:
        v = int((regs == 0).sum())
        s = float(np.power(2.0, -regs.astype(np.float64)).sum())
        e = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M / s
        if e <= 2.5 * HLL_M and v > 0:
            e = HLL_M * math.log(HLL_M / v)
        return math.floor(e * 1e6 + 0.5) / 1e6

    singles = {s: est(r) for s, r in merged.items()}
    rows = []
    for a in sorted(merged):
        for b in sorted(merged):
            if a >= b:
                continue
            eu = est(np.maximum(merged[a], merged[b]))
            inter = math.floor(
                ((singles[a] + singles[b]) - eu) * 1e6 + 0.5) / 1e6
            rows.append((a, b, singles[a], singles[b], eu, inter))
    return pd.DataFrame(rows, columns=[
        "src_a", "src_b", "est_a", "est_b", "est_union",
        "est_intersection"])


def hll_source_algebra_sql(table_expr: str = "documents",
                           col: str = "text",
                           source_col: str = "source") -> str:
    """DuckDB twin of ``hll_source_algebra``: per-source register state,
    pairwise max-merged registers and both correction branches are all
    re-derived, so a green row pins the whole algebra, not a tolerance."""
    m, wb = HLL_M, _W_BITS
    est = (f"floor((CASE WHEN e_raw <= 2.5 * {m} AND v > 0 "
           f"THEN {m} * ln({m} / v) ELSE e_raw END) * 1e6 + 0.5) / 1e6")
    agg = (f"({m} - count(*)) AS v, "
           f"(0.7213 / (1 + 1.079 / {m})) * {m} * {m} "
           f"/ (sum(power(2.0, -r)) + ({m} - count(*)) * 1.0) AS e_raw")
    return f"""
WITH __toks AS (
  SELECT DISTINCT {source_col} AS source,
         unnest(regexp_extract_all(lower({col}), '\\w+')) AS tok
  FROM {table_expr}),
__jr AS (
  SELECT source,
         (CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) >> {wb}) AS j,
         (CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT)
          & ((1::UBIGINT << {wb}) - 1)) AS w
  FROM __toks),
__regs AS (
  SELECT source, j, max(CASE WHEN w > 0
      THEN {wb} - length(format('{{:b}}', w::BIGINT)) + 1
      ELSE {wb} + 1 END) AS r
  FROM __jr GROUP BY source, j),
__single AS (
  SELECT source, {est} AS e
  FROM (SELECT source, {agg} FROM __regs GROUP BY source)),
__pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM __single a, __single b WHERE a.source < b.source),
__uregs AS (
  SELECT p.src_a, p.src_b, g.j, max(g.r) AS r
  FROM __pairs p JOIN __regs g
    ON g.source = p.src_a OR g.source = p.src_b
  GROUP BY p.src_a, p.src_b, g.j),
__union AS (
  SELECT src_a, src_b, {est} AS e_u
  FROM (SELECT src_a, src_b, {agg} FROM __uregs
        GROUP BY src_a, src_b))
SELECT u.src_a, u.src_b, a.e AS est_a, b.e AS est_b, u.e_u AS est_union,
       floor(((a.e + b.e) - u.e_u) * 1e6 + 0.5) / 1e6
           AS est_intersection
FROM __union u
JOIN __single a ON a.source = u.src_a
JOIN __single b ON b.source = u.src_b
ORDER BY u.src_a, u.src_b"""
