"""Clustered (range-partitioned) parquet layout with manifest-pruned
reads.

The "prune at the read" storage story as a first-class capability: a
dataset written clustered on a key lands in ``range=K/`` directories
whose key boundaries are recorded in a ``_manifest.json``; a ranged
read opens ONLY the directories whose key interval overlaps the
request and applies one residual in-range filter. At 100 TB a query
touching 1% of the key space reads ~1% of the files — the same
row-group/zone-map discipline parquet gives within a file, lifted to
the directory level so Ray's ``read_parquet`` task planning prunes
too (fewer read tasks, not just fewer row groups).

Boundaries come from a DETERMINISTIC hash-sample of the key column
(Spark's RangePartitioner recipe, but md5-thresholded so re-runs and
resumes see identical boundaries — no RNG state): the sample's
quantiles split the key space into ``n_ranges`` buckets. Skew beyond
the sample's resolution degrades balance, never correctness — every
row is placed by binary search against the SAME boundaries the
manifest records.

Writes are resumable the way the rest of the repo's sinks are: each
range directory is a self-contained unit (a failed run re-writes only
missing ranges' directories; the manifest is written last).
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

_MANIFEST = "_manifest.json"
# deterministic sample: keep keys whose md5 prefix falls under this
# 16-bit threshold (~1/16 of rows); floor keeps tiny tables exact
_SAMPLE_THRESHOLD = 0x1000
_SAMPLE_FLOOR = 4096


def _sample_keys(ds: rd.Dataset, key: str) -> np.ndarray:
    """Deterministic key sample for boundary estimation: md5-threshold
    rows (stateless, layout-independent), plus every key when the batch
    is tiny so small tables get exact quantiles."""
    def pick(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_pylist()
        if len(ks) <= _SAMPLE_FLOOR:
            keep = ks
        else:
            keep = [v for v in ks
                    if int(hashlib.md5(str(v).encode())
                           .hexdigest()[:4], 16) < _SAMPLE_THRESHOLD]
        return pa.table({key: pa.array(keep,
                                       batch.column(key).type)})

    out = ds.select_columns([key]).map_batches(
        pick, batch_format="pyarrow").to_pandas()
    return np.sort(out[key].to_numpy())


def write_clustered(ds: rd.Dataset, out_dir: str, key: str,
                    n_ranges: int = 32) -> str:
    """Write ``ds`` clustered on ``key`` into ``out_dir/range=K/``
    parquet directories plus a ``_manifest.json`` recording the
    boundaries. Returns ``out_dir``."""
    sample = _sample_keys(ds, key)
    if sample.size == 0:
        raise ValueError(f"cannot cluster an empty dataset on {key!r}")
    qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
    # quantile boundaries; duplicates collapse (skewed keys -> fewer,
    # fatter ranges rather than empty directories)
    bounds = np.unique(np.quantile(sample, qs, method="lower"))

    def assign(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, ks, side="right").astype("int32")
        return batch.append_column("range", pa.array(rid, pa.int32()))

    (ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["range"]))

    manifest = {
        "key": key,
        "n_ranges": int(bounds.size + 1),
        # range K covers (bounds[K-1], bounds[K]] except the open ends
        "bounds": [v.item() if hasattr(v, "item") else v
                   for v in bounds.tolist()],
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return out_dir


def clustered_paths(out_dir: str, lo=None, hi=None
                    ) -> tuple[list[str], dict]:
    """Manifest-pruned file list for a ranged read: the parquet paths
    in range directories whose key interval overlaps ``[lo, hi]``, plus
    the manifest. Exposed so callers (and tests) can observe exactly
    how much IO the manifest eliminated."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        man = json.load(f)
    bounds = man["bounds"]
    n = man["n_ranges"]

    def overlaps(rid: int) -> bool:
        r_lo = bounds[rid - 1] if rid > 0 else None      # exclusive
        r_hi = bounds[rid] if rid < len(bounds) else None  # inclusive
        if lo is not None and r_hi is not None and r_hi < lo:
            return False
        if hi is not None and r_lo is not None and r_lo >= hi:
            return False
        return True

    paths = []
    for r in range(n):
        if not overlaps(r):
            continue
        d = os.path.join(out_dir, f"range={r}")
        if os.path.isdir(d):
            paths.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    return paths, man


def read_clustered(out_dir: str, lo=None, hi=None,
                   columns: list[str] | None = None) -> rd.Dataset:
    """Read back a clustered layout, opening ONLY the range directories
    whose key interval overlaps ``[lo, hi]`` (inclusive; either side
    may be None for unbounded), then applying the exact residual
    filter. Without bounds this is a plain full read."""
    import pyarrow.compute as pc

    paths, man = clustered_paths(out_dir, lo, hi)
    key = man["key"]
    n = man["n_ranges"]

    if not paths:
        # manifest says nothing can match: empty dataset with the right
        # shape (read zero-row slice of any one file if present)
        allp = []
        for r in range(n):
            d = os.path.join(out_dir, f"range={r}")
            if os.path.isdir(d):
                allp.extend(os.path.join(d, f) for f in os.listdir(d)
                            if f.endswith(".parquet"))
        empty = rd.read_parquet(allp[:1], columns=columns).limit(0)
        return empty if columns is not None \
            else empty.drop_columns(["range"])

    read_cols = columns
    if columns is not None and key not in columns:
        read_cols = list(columns) + [key]
    out = rd.read_parquet(paths, columns=read_cols)
    if lo is None and hi is None:
        residual = None
    else:
        def residual(batch: pa.Table) -> pa.Table:
            k = batch.column(key)
            mask = None
            if lo is not None:
                mask = pc.greater_equal(k, pa.scalar(lo, k.type))
            if hi is not None:
                m2 = pc.less_equal(k, pa.scalar(hi, k.type))
                mask = m2 if mask is None else pc.and_(mask, m2)
            return batch.filter(mask)
    if residual is not None:
        out = out.map_batches(residual, batch_format="pyarrow")
    if columns is not None:
        out = out.select_columns(columns)
    else:
        # the physical partition column is layout, not data
        out = out.drop_columns(["range"])
    return out
