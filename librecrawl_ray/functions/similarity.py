"""Similarity search over an embedding column (list<float>).

- ``topk_bruteforce`` — the baseline: per-batch numpy matmul against a
  broadcast query matrix (ray.put once, read zero-copy per task), partial
  top-k per batch, merge on the driver. One streaming pass, no shuffle.
- ``hyperplane_buckets`` — random-hyperplane LSH bucket assignment
  (signature of sign bits) as the scale path: bucket → groupby → in-bucket
  search, and the blocking key for embedding_neardup_pairs.
- ``ivf_topk`` — IVF-flat: k-means centroids trained on a driver-side
  sample, broadcast; per-batch assignment, search restricted to the
  ``nprobe`` nearest centroids' vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def topk_bruteforce(ds: rd.Dataset, query: np.ndarray, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k: (id, cosine) sorted desc, ties by id asc."""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        sims = m @ qv
        take = min(k, len(ids))
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(ids[idx], pa.int64()),
                         "cosine": pa.array(sims[idx], pa.float64())})

    parts = ds.select_columns([id_col, vec_col]) \
              .map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts["cosine"] = parts["cosine"].round(6)
    parts = parts.sort_values(["cosine", id_col],
                              ascending=[False, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


def hyperplane_buckets(ds: rd.Dataset, num_planes: int = 8, seed: int = 11,
                       vec_col: str = "embedding",
                       dim: int | None = None) -> rd.Dataset:
    """Append an LSH ``bucket`` column: sign-bit signature over
    ``num_planes`` random hyperplanes (same seed ⇒ same planes per task)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(vec_col).to_pylist())
        rng = np.random.RandomState(seed)
        planes = rng.randn(m.shape[1], num_planes)
        bits = (m @ planes) > 0
        keys = (bits.astype(np.uint32)
                * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1)
        return batch.append_column("bucket",
                                   pa.array(keys.astype("int64"), pa.int64()))
    return ds.map_batches(add_bucket, batch_format="pyarrow")


def _deterministic_sample(ds: rd.Dataset, sample_limit: int,
                          id_col: str, vec_col: str) -> np.ndarray:
    """The bounded training sample every index trainer here uses: the
    ``sample_limit`` rows with smallest ``md5(str(id))`` (a fixed random
    permutation — ``limit()`` alone selects rows in Ray's unstable
    block-gather order), pruned per batch before a sort+limit over the
    pruned stream so no full-data shuffle happens, then sorted by id so
    seeded k-means sees a canonical row order. Returns the raw (n, d)
    matrix (caller normalizes if it wants cosine geometry)."""
    import hashlib

    def prune(batch: pa.Table) -> pa.Table:
        keys = pa.array([hashlib.md5(str(i).encode()).hexdigest()
                         for i in batch.column(id_col).to_pylist()])
        batch = batch.append_column("__skey", keys)
        if batch.num_rows > sample_limit:
            idx = pc.sort_indices(batch, sort_keys=[("__skey",
                                                     "ascending")])
            batch = batch.take(idx[:sample_limit])
        return batch

    sample = ds.select_columns([id_col, vec_col]) \
               .map_batches(prune, batch_format="pyarrow") \
               .sort("__skey").limit(sample_limit) \
               .to_pandas().sort_values(id_col)
    return _as_matrix(sample[vec_col].to_numpy())


def train_centroids(ds: rd.Dataset, num_centroids: int = 16,
                    sample_limit: int = 10_000, iters: int = 10,
                    seed: int = 5, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Driver-side mini k-means on a bounded sample (the IVF train step —
    at 100 TB you train on the same bounded sample; assignment streams).

    Both the sampled row SET and its order are deterministic: the set is
    the ``sample_limit`` rows with smallest ``md5(str(id))`` (a fixed
    random permutation — ``limit()`` alone selects rows in Ray's unstable
    block-gather order, so above the limit two processes could train on
    different sets), pruned per batch before a sort+limit over the pruned
    stream so no full-data shuffle happens; the sample is then sorted by
    ``id_col`` because k-means depends on row order via the seeded
    initial pick. Together the centroids are a pure function of the
    input rows, so side-table writers and query paths in different
    processes agree bit-for-bit."""
    m = _normalize(_deterministic_sample(ds, sample_limit, id_col,
                                         vec_col))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(num_centroids, len(m)),
                        replace=False)]
    for _ in range(iters):
        sims = m @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
    return cent


def ivf_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             num_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> pa.Table:
    """IVF-flat approximate top-k: search only vectors assigned to the
    nprobe centroids nearest the query."""
    cent = centroids if centroids is not None else train_centroids(
        ds, num_centroids, vec_col=vec_col)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(cent @ q))[:nprobe].tolist())
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qv = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        assign = (m @ c.T).argmax(axis=1)
        mask = np.isin(assign, list(probe))
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m[mask] @ qv
        sel_ids = ids[mask]
        take = min(k, len(sel_ids))
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(sel_ids[idx], pa.int64()),
                         "cosine": pa.array(sims[idx], pa.float64())})

    parts = ds.select_columns([id_col, vec_col]) \
              .map_batches(partial, batch_format="pyarrow").to_pandas()
    parts["cosine"] = parts["cosine"].round(6)
    parts = parts.sort_values(["cosine", id_col],
                              ascending=[False, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


def top_similar_pairs(ds: rd.Dataset, k: int = 20,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      block_col: str = "label") -> pa.Table:
    """Global top-k most-similar same-block pairs by cosine: per-block
    matmul inside map_groups emits each block's top-k partials, driver
    merges (top-k of top-ks is exact because blocks partition the pairs)."""
    import pandas as pd

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col)
        ids = df[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        m = _normalize(_as_matrix(df[vec_col].to_numpy()))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        vals = sims[ia, ib]
        take = min(k, len(vals))
        idx = np.argpartition(-vals, take - 1)[:take]
        return pd.DataFrame({"id_a": ids[ia[idx]], "id_b": ids[ib[idx]],
                             "cosine": np.round(vals[idx], 6)})

    parts = ds.groupby(block_col).map_groups(
        per_block, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["cosine", "id_a", "id_b"],
                              ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


def label_centroids(ds: rd.Dataset, label_col: str = "label",
                    vec_col: str = "embedding") -> pa.Table:
    """Per-label centroid of an embedding column: per-batch partial
    (sum-vector, count) rows — the combiner, so only #labels × #blocks
    tiny rows leave the map stage, never raw vectors — then a final
    driver-side reduce over the label-sized partials. The k-means update
    step / class-prototype builder of an embedding pipeline. Returns
    (label, n_vectors, centroid list<double>) sorted by label."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(vec_col).to_pylist()) \
            .astype(np.float64)
        uniq = np.unique(labels)
        sums = [m[labels == u].sum(axis=0).tolist() for u in uniq]
        counts = [int((labels == u).sum()) for u in uniq]
        return pa.table({
            "label": pa.array(uniq.tolist(), pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "s": pa.array(sums, pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_l, out_n, out_c = [], [], []
    for lab, grp in parts.groupby("label", sort=True):
        n = int(grp["n"].sum())
        s = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        out_l.append(int(lab))
        out_n.append(n)
        out_c.append((s / n).tolist())
    return pa.table({
        "label": pa.array(out_l, pa.int64()),
        "n_vectors": pa.array(out_n, pa.int64()),
        "centroid": pa.array(out_c, pa.list_(pa.float64())),
    })


LABEL_CENTROIDS_SQL = """
WITH __ex AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings)
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       (sum(v::DOUBLE) / count(*)) AS value
FROM __ex GROUP BY label, dim ORDER BY label, dim"""


def embedding_outliers(ds: rd.Dataset, k: int = 10,
                       label_col: str = "label",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> rd.Dataset:
    """Per-label embedding outliers: the k vectors FARTHEST (lowest
    cosine) from their label's centroid — the mislabeled-example /
    contamination triage pass of an embedding-curation pipeline.

    Shape: centroids come from ``label_centroids`` (partial sum-vectors,
    label-sized driver reduce) and broadcast once; scoring is a stateless
    vectorized matmul per batch; the per-label bottom-k uses the per-key
    top-N discipline (per-batch partial trim → bucketed exact trim), so
    the shuffle moves ≤ k·labels·blocks scored rows, never embeddings.
    Cosines are rounded to 6 dp BEFORE ranking (rank ties break on id) so
    the order is reproducible against the SQL twin despite summation-order
    FP noise."""
    import pandas as pd

    from ..pipelines.reports import bucketed_groups

    cents = label_centroids(ds, label_col, vec_col)
    cmap = {int(lab): np.asarray(c, dtype=np.float64)
            for lab, c in zip(cents.column("label").to_pylist(),
                              cents.column("centroid").to_pylist())}
    cref = ray.put(cmap)

    def score(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(vec_col).to_pylist())
        cos = np.empty(len(labels))
        for lab in np.unique(labels):
            sel = labels == lab
            c = cm[int(lab)]
            sub = m[sel]
            denom = np.linalg.norm(sub, axis=1) * np.linalg.norm(c)
            denom[denom == 0] = 1.0
            cos[sel] = sub @ c / denom
        return pa.table({
            id_col: batch.column(id_col),
            label_col: pa.array([int(x) for x in labels], pa.int64()),
            "cosine": pa.array(np.round(cos, 6), pa.float64()),
        })

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([label_col, "cosine", id_col])
        return df.groupby(label_col, sort=False).head(k)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = trim(df)
        df["rank"] = df.groupby(label_col, sort=False).cumcount() + 1
        return df[[label_col, "rank", id_col, "cosine"]]

    scored = ds.map_batches(score, batch_format="pyarrow") \
        .map_batches(trim, batch_format="pandas")
    return bucketed_groups(scored, label_col, per_bucket)


def embedding_outliers_sql(table: str = "embeddings", k: int = 10,
                           label_col: str = "label",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """DuckDB twin: centroid per (label, dim), cosine per vector,
    round-before-rank."""
    return f"""
WITH ex AS (
  SELECT {id_col}, {label_col},
         unnest({vec_col})::DOUBLE AS v,
         generate_subscripts({vec_col}, 1) AS dim
  FROM {table}
),
cent AS (
  SELECT {label_col}, dim, SUM(v) / COUNT(*) AS c
  FROM ex GROUP BY {label_col}, dim
),
dots AS (
  SELECT e.{id_col}, e.{label_col},
         SUM(e.v * c.c) AS dot, SUM(e.v * e.v) AS vv, SUM(c.c * c.c) AS cc
  FROM ex e JOIN cent c USING ({label_col}, dim)
  GROUP BY e.{id_col}, e.{label_col}
),
scored AS (
  SELECT {id_col}, {label_col},
         ROUND(dot / (CASE WHEN SQRT(vv) * SQRT(cc) = 0 THEN 1
                           ELSE SQRT(vv) * SQRT(cc) END), 6) AS cosine
  FROM dots
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {label_col}
                               ORDER BY cosine, {id_col}) AS rank
  FROM scored
)
SELECT {label_col}::BIGINT AS {label_col}, rank, {id_col}, cosine
FROM ranked WHERE rank <= {k}
ORDER BY {label_col}, rank
"""


def train_pq_codebooks(ds: rd.Dataset, num_subspaces: int = 4,
                       num_codes: int = 16, sample_limit: int = 10_000,
                       iters: int = 10, seed: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the (normalized)
    vector into ``num_subspaces`` contiguous chunks and run an
    independent seeded L2 k-means per chunk on the deterministic bounded
    sample. Returns (M, K, d/M). The memory story at 100 TB: a 768-dim
    float32 vector is 3 KB; M=96 one-byte codes are 96 B — the index
    fits in RAM where the vectors never could."""
    m = _normalize(_deterministic_sample(ds, sample_limit, id_col,
                                         vec_col))
    d = m.shape[1]
    if d % num_subspaces:
        raise ValueError(f"dim {d} not divisible by {num_subspaces}")
    sd = d // num_subspaces
    books = np.empty((num_subspaces, num_codes, sd), dtype=np.float64)
    for s in range(num_subspaces):
        sub = m[:, s * sd:(s + 1) * sd]
        rng = np.random.RandomState(seed + s)
        cent = sub[rng.choice(len(sub), size=min(num_codes, len(sub)),
                              replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s, :len(cent)] = cent
        if len(cent) < num_codes:          # degenerate tiny-sample case
            books[s, len(cent):] = cent[0]
    return books


def pq_encode(ds: rd.Dataset, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> rd.Dataset:
    """Streaming encode: (id, pq_code list<int64>). Broadcast codebooks
    once; one matmul-free argmin per subspace per batch."""
    cb_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        M, K, sd = cb.shape
        m = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        codes = np.empty((len(m), M), dtype=np.int64)
        for s in range(M):
            sub = m[:, s * sd:(s + 1) * sd]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        return pa.table({
            id_col: batch.column(id_col),
            "pq_code": pa.array(codes.tolist(),
                                pa.list_(pa.int64()))})

    return ds.select_columns([id_col, vec_col]) \
        .map_batches(encode, batch_format="pyarrow")


def pq_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
            num_subspaces: int = 4, num_codes: int = 16,
            rerank: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding",
            codebooks: np.ndarray | None = None) -> pa.Table:
    """PQ top-k with asymmetric-distance (ADC) candidate generation and
    exact re-rank: per batch, approx cosine = Σ_s lut[s, code_s] (the
    query×codebook lookup table — M table reads per vector instead of a
    d-dim dot product), keep the ``rerank·k`` best candidates, score
    ONLY those exactly, merge partials on the driver (top-k of exact
    top-ks is exact over the candidate union).

    In this sandbox the exact re-rank reads the vector from the same
    batch; a 100-TB deployment stores codes in RAM and fetches the few
    re-rank vectors from the parquet row group — the scan itself never
    touches raw vectors. ``rerank`` large enough to cover a batch makes
    the result exactly the brute-force top-k (the configuration the
    driver oracle pins, same contract as ivf_topk's exhaustive probe);
    pytest pins the approximate configurations' recall."""
    cb = codebooks if codebooks is not None else train_pq_codebooks(
        ds, num_subspaces, num_codes, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    M, K, sd = cb.shape
    lut = np.stack([q[s * sd:(s + 1) * sd] @ cb[s].T
                    for s in range(M)])           # (M, K)
    cb_ref = ray.put(cb)
    lut_ref = ray.put(lut)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        cbl = ray.get(cb_ref)
        lutl = ray.get(lut_ref)
        qv = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        codes = np.empty((len(m), M), dtype=np.int64)
        for s in range(M):
            sub = m[:, s * sd:(s + 1) * sd]
            d2 = ((sub[:, None, :] - cbl[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        approx = lutl[np.arange(M)[None, :], codes].sum(axis=1)
        cand = min(rerank * k, len(ids))
        idx = np.argpartition(-approx, cand - 1)[:cand]
        sims = m[idx] @ qv                      # exact re-rank, cands only
        take = min(k, len(idx))
        best = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(ids[idx][best], pa.int64()),
                         "cosine": pa.array(sims[best], pa.float64())})

    parts = ds.select_columns([id_col, vec_col]) \
              .map_batches(partial, batch_format="pyarrow").to_pandas()
    parts["cosine"] = parts["cosine"].round(6)
    parts = parts.sort_values(["cosine", id_col],
                              ascending=[False, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


def cluster_stats(ds: rd.Dataset, assignments: rd.Dataset,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> "pd.DataFrame":
    """Per-cluster quality report over a k-means assignment: (cluster,
    n_vectors, mean_cos) where mean_cos is the average cosine of each
    member to its cluster's MEAN vector — the cohesion diagnostic read
    before trusting a SemDedup pass or an IVF index built on these
    clusters (a low-cohesion cluster means the ANN probe budget or the
    dedup threshold is wrong for that region).

    Shape: one ``hash_join`` attaches cluster ids to vectors (at 10^10
    both sides are corpus-sized — never a broadcast), pass 1 reduces
    each batch to per-cluster (sum-vector, count) partials (k × dim
    driver state), the means broadcast back via ``ray.put``, pass 2
    reduces each batch to per-cluster (Σcos, n) partials. Raw vectors
    never cross a shuffle. Numeric contract: cos = dot/(√nv·√nm), zero
    vectors score 0, mean_cos half-away-rounds to 6 dp — mirrored
    term-for-term in the SQL twin."""
    import math

    import numpy as np
    import pandas as pd
    import ray

    from ..pipelines.reports import hash_join

    joined = hash_join(
        ds.select_columns([id_col, vec_col]),
        assignments.select_columns([id_col, "cluster"]), key=id_col)

    def sum_partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("cluster").to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(vec_col).to_pylist()) \
            .astype(np.float64)
        uniq = np.unique(labels)
        return pa.table({
            "cluster": pa.array(uniq.tolist(), pa.int64()),
            "n": pa.array([int((labels == u).sum()) for u in uniq],
                          pa.int64()),
            "s": pa.array([m[labels == u].sum(axis=0).tolist()
                           for u in uniq], pa.list_(pa.float64())),
        })

    parts = joined.map_batches(sum_partial,
                               batch_format="pyarrow").to_pandas()
    means = {}
    counts = {}
    for cl, grp in parts.groupby("cluster", sort=True):
        n = int(grp["n"].sum())
        s = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        means[int(cl)] = s / n
        counts[int(cl)] = n
    means_ref = ray.put(means)

    def cos_partial(batch: pa.Table) -> pa.Table:
        mdict = ray.get(means_ref)
        labels = batch.column("cluster").to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(vec_col).to_pylist()) \
            .astype(np.float64)
        out_c, out_s, out_n = [], [], []
        for u in np.unique(labels):
            sel = m[labels == u]
            mv = mdict[int(u)]
            nm = float(mv @ mv)
            dots = sel @ mv
            nvs = (sel * sel).sum(axis=1)
            cs = [d / (math.sqrt(nv) * math.sqrt(nm))
                  if nv > 0 and nm > 0 else 0.0
                  for d, nv in zip(dots.tolist(), nvs.tolist())]
            out_c.append(int(u))
            out_s.append(float(sum(cs)))
            out_n.append(len(cs))
        return pa.table({
            "cluster": pa.array(out_c, pa.int64()),
            "sc": pa.array(out_s, pa.float64()),
            "n": pa.array(out_n, pa.int64())})

    cparts = joined.map_batches(cos_partial,
                                batch_format="pyarrow").to_pandas()
    rows = []
    for cl, grp in cparts.groupby("cluster", sort=True):
        n = int(grp["n"].sum())
        mc = math.floor(float(grp["sc"].sum()) / n * 1e6 + 0.5) / 1e6
        rows.append((int(cl), n, mc))
    return pd.DataFrame(rows, columns=["cluster", "n_vectors",
                                       "mean_cos"])


def cluster_stats_sql(assignments_parquet: str,
                      table_expr: str = "embeddings") -> str:
    """DuckDB twin of ``cluster_stats`` over the persisted assignment
    side-table (same pattern as the semantic_dedup oracle: the k-means
    itself is pinned by determinism pytest; the join, the mean vectors,
    the cosine cohesion and the rounding are all re-derived in SQL)."""
    return f"""
WITH __a AS (SELECT vec_id, cluster
             FROM read_parquet('{assignments_parquet}')),
__x AS (
  SELECT a.cluster, e.vec_id, unnest(e.embedding)::DOUBLE AS v,
         generate_subscripts(e.embedding, 1) AS dim
  FROM {table_expr} e JOIN __a a USING (vec_id)),
__m AS (
  SELECT cluster, dim, sum(v) / count(*) AS mv
  FROM __x GROUP BY cluster, dim),
__d AS (
  SELECT x.cluster, x.vec_id, sum(x.v * m.mv) AS dot,
         sum(x.v * x.v) AS nv, sum(m.mv * m.mv) AS nm
  FROM __x x JOIN __m m ON x.cluster = m.cluster AND x.dim = m.dim
  GROUP BY x.cluster, x.vec_id),
__c AS (
  SELECT cluster,
         CASE WHEN nv > 0 AND nm > 0
              THEN dot / (sqrt(nv) * sqrt(nm)) ELSE 0.0 END AS c
  FROM __d)
SELECT cluster, count(*)::BIGINT AS n_vectors,
       floor(sum(c) / count(*) * 1e6 + 0.5) / 1e6 AS mean_cos
FROM __c GROUP BY cluster ORDER BY cluster"""


def embedding_covariance(ds: rd.Dataset, vec_col: str = "embedding",
                         dim: int = 64) -> "pd.DataFrame":
    """Full covariance matrix of an embedding column in ONE streaming
    pass: each block reduces to the mergeable moment triple (n, Σx,
    XᵀX) — d + d² doubles, never raw vectors — and the partials add
    associatively (tree-reducible at cluster scale; here the driver
    sums block-count-bounded rows). This is the whitening /
    feature-decorrelation input every embedding-hygiene pipeline wants,
    and the canonical distributed-dense-linear-algebra shape.

    cov(i,j) = G_ij/n − (s_i/n)(s_j/n), computed in that exact float-op
    order (inputs widened float32→float64, exact) so the SQL twin
    reproduces it; values floor(x·1e6+0.5)/1e6-rounded — summation-order
    FP noise is ~1e-12 relative, far inside the 6-dp margin. Returns the
    upper triangle (dim_i, dim_j, cov), 1-based dims, d(d+1)/2 rows."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = col.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, dim)
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "g": pa.array([(X.T @ X).ravel().tolist()],
                          pa.list_(pa.float64()))})

    n, s, g = 0, np.zeros(dim), np.zeros((dim, dim))
    for b in ds.select_columns([vec_col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for bn, bs, bg in zip(b.column("n").to_pylist(),
                              b.column("s").to_pylist(),
                              b.column("g").to_pylist()):
            n += bn
            s += np.asarray(bs)
            g += np.asarray(bg).reshape(dim, dim)

    import math
    rows = []
    for i in range(dim):
        for j in range(i, dim):
            c = g[i, j] / n - (s[i] / n) * (s[j] / n)
            rows.append((i + 1, j + 1,
                         math.floor(c * 1e6 + 0.5) / 1e6))
    return pd.DataFrame(rows, columns=["dim_i", "dim_j", "cov"])


def embedding_covariance_sql(table_expr: str = "embeddings",
                             vec_col: str = "embedding") -> str:
    """DuckDB twin of ``embedding_covariance``: identical float64
    widening, identical G/n − mean·mean op order, identical
    floor(x·1e6+0.5) rounding (NOT ROUND — covariances go negative and
    the two conventions differ there; floor is what both sides run)."""
    return f"""
WITH __e AS (
  SELECT vec_id, generate_subscripts({vec_col}, 1) AS i,
         unnest({vec_col})::DOUBLE AS x
  FROM {table_expr}),
__n AS (SELECT COUNT(*)::BIGINT AS n FROM {table_expr}),
__s AS (SELECT i, SUM(x) AS s FROM __e GROUP BY i),
__g AS (
  SELECT a.i AS dim_i, b.i AS dim_j, SUM(a.x * b.x) AS g
  FROM __e a JOIN __e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i)
SELECT g.dim_i, g.dim_j,
       floor((g.g / n.n - (sa.s / n.n) * (sb.s / n.n)) * 1e6 + 0.5)
           / 1e6 AS cov
FROM __g g CROSS JOIN __n n
JOIN __s sa ON sa.i = g.dim_i
JOIN __s sb ON sb.i = g.dim_j
ORDER BY g.dim_i, g.dim_j"""


def pca_project(ds: rd.Dataset, k: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding",
                dim: int = 64) -> rd.Dataset:
    """Project embeddings onto their top-k principal components — the
    whitening / compaction step downstream of ``embedding_covariance``,
    and the standard preprocessing before IVF/PQ indexing.

    Scale shape: the covariance comes from the one-pass mergeable
    moment partials (never gathers vectors); the d×d eigendecomposition
    runs on the driver (metadata-sized — 64×64 here, 4096 floats at
    d=1024); the component matrix broadcasts once via ``ray.put`` and a
    stateless ``map_batches`` streams the corpus through a single
    matmul per batch. Eigenvector sign is fixed per component (largest
    |loading| made positive) so the output is deterministic across
    LAPACK builds; components are eigenvalue-descending.

    No SQL twin — eigendecomposition is not SQL-expressible; the
    covariance input IS oracled (``embedding_covariance``), which pins
    everything upstream of the eigensolve. Returns (vec_id, proj:
    list<double> of length k), centered before projection."""
    cov_rows = embedding_covariance(ds, vec_col=vec_col, dim=dim)
    C = np.zeros((dim, dim))
    for _, r in cov_rows.iterrows():
        C[int(r.dim_i) - 1, int(r.dim_j) - 1] = r["cov"]
        C[int(r.dim_j) - 1, int(r.dim_i) - 1] = r["cov"]

    # the mean re-derives from a cheap second aggregate pass (the moment
    # partials don't return it); metadata-sized
    def mean_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = col.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, dim)
        return pa.table({"n": pa.array([X.shape[0]], pa.int64()),
                         "s": pa.array([X.sum(axis=0).tolist()],
                                       pa.list_(pa.float64()))})

    n, s = 0, np.zeros(dim)
    for b in ds.select_columns([vec_col]) \
            .map_batches(mean_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for bn, bs in zip(b.column("n").to_pylist(),
                          b.column("s").to_pylist()):
            n += bn
            s += np.asarray(bs)
    mu = s / n

    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]                       # d × k
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(W.shape[1])])
    W = W * np.where(flip == 0, 1.0, flip)
    w_ref = ray.put(W)
    mu_ref = ray.put(mu)

    def project(batch: pa.Table) -> pa.Table:
        Wm = ray.get(w_ref)
        m = ray.get(mu_ref)
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = col.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, dim)
        P = (X - m) @ Wm
        return pa.table({
            "vec_id": batch.column(id_col),
            "proj": pa.array([row.tolist() for row in P],
                             pa.list_(pa.float64()))})

    return ds.select_columns([id_col, vec_col]) \
        .map_batches(project, batch_format="pyarrow")
