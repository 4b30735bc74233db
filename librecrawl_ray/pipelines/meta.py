"""Crawl history / status metadata surface (reference crawl_db.py:28-66
``crawls`` table and :505-530 list view).

The reference keeps a SQL row per crawl (status, URL counters, config
snapshot, resume checkpoint). Here every crawl directory is self-describing
— ``crawl_config.json`` + the lineage commit chain — so the same surface is
derived by reading lineage, no database:

- ``crawl_status(out_dir)``  → one status snapshot dict
- ``list_crawls(out_root)``  → list-view dicts, most recent wave first

Both touch only lineage JSON + admitted-file parquet metadata (frontier-
sized), never pages/links data, so they are cheap at any corpus scale.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def _lineage_waves(out_dir: str) -> list[int]:
    ldir = os.path.join(out_dir, "lineage")
    if not os.path.isdir(ldir):
        return []
    waves = []
    for f in os.listdir(ldir):
        if f.startswith("wave-") and f.endswith(".json"):
            tag = f[len("wave-"):-len(".json")]
            if tag.isdigit():
                waves.append(int(tag))
    return sorted(waves)


def crawl_status(out_dir: str) -> dict | None:
    """Status snapshot for one crawl directory (reference ``crawls`` row).

    ``status``: 'complete' when the terminal lineage marker exists,
    'running' while committed waves exist without it, 'empty' otherwise.
    ``urls_discovered`` counts every admitted frontier row (seeds included);
    ``urls_crawled`` is the committed fetched_total; ``can_resume`` mirrors
    the resume() precondition (a committed init state).
    """
    ldir = os.path.join(out_dir, "lineage")
    init = os.path.join(ldir, "wave-init.json")
    if not os.path.exists(init):
        return None
    with open(init) as f:
        init_state = json.load(f)
    waves = _lineage_waves(out_dir)
    final_p = os.path.join(ldir, "wave-final.json")
    complete = os.path.exists(final_p)
    last_state = init_state
    if waves:
        with open(os.path.join(ldir, f"wave-{waves[-1]}.json")) as f:
            last_state = json.load(f)
    cfg = {}
    cfg_p = os.path.join(out_dir, "crawl_config.json")
    if os.path.exists(cfg_p):
        with open(cfg_p) as f:
            cfg = json.load(f)
    max_depth = 0
    adir = os.path.join(out_dir, "admitted")
    if os.path.isdir(adir):
        for f in sorted(os.listdir(adir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(adir, f), columns=["depth"])
            if t.num_rows:
                import pyarrow.compute as pc
                max_depth = max(max_depth,
                                int(pc.max(t.column("depth")).as_py()))
    return {
        "out_dir": out_dir,
        "status": "complete" if complete
        else ("running" if waves or init_state else "empty"),
        "base_domain": cfg.get("base_domain", ""),
        "config_snapshot": cfg,
        "urls_crawled": int(last_state.get("fetched_total", 0)),
        "urls_discovered": int(last_state.get("next_seq", 0)),
        "max_depth_reached": max_depth,
        "num_waves_committed": len(waves),
        "can_resume": True,
        "resume_checkpoint": (f"wave-{waves[-1]}" if waves
                              else "wave-init"),
    }


def list_crawls(out_root: str, status_filter: str | None = None,
                limit: int = 100, offset: int = 0) -> list[dict]:
    """List-view over every crawl directory under ``out_root`` (reference
    crawl_db.py:505-530): config snapshots omitted, newest (most committed
    waves, then name) first, with status filter + limit/offset paging."""
    if not os.path.isdir(out_root):
        return []
    out = []
    for name in sorted(os.listdir(out_root)):
        st = crawl_status(os.path.join(out_root, name))
        if st is None:
            continue
        if status_filter and st["status"] != status_filter:
            continue
        st = dict(st, config_snapshot=None)
        out.append(st)
    out.sort(key=lambda s: (-s["num_waves_committed"], s["out_dir"]))
    return out[offset:offset + limit]


DIFF_SIGNAL_COLUMNS = ("status_code", "size", "word_count", "title")
# canonical per-column dtypes (numeric sides may carry nulls when a URL is
# only in one crawl, so numerics are float64; titles stay object/string)
DIFF_SIGNAL_DTYPES = {"status_code": "float64", "size": "float64",
                      "word_count": "float64", "title": "object"}


def crawl_diff(prev_pages, new_pages):
    """Crawl-over-crawl comparison: one row per URL seen in either crawl,
    classified added / removed / changed / unchanged (changed = any of
    ``DIFF_SIGNAL_COLUMNS`` differs). The recrawl-monitoring surface on
    top of the reference's crawl history (crawl_db.py:505-530 lists
    crawls; this compares two of them).

    Both sides are projected to url + the four signal columns before the
    join — the join ships a handful of scalars per URL, never spans or
    meta maps — and the classification is one vectorized pandas pass per
    joined batch. Scale: ``hash_join`` broadcast under threshold,
    bucketed shuffle above.
    """
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from .reports import _add_norm, hash_join

    cols = ["url", *DIFF_SIGNAL_COLUMNS]

    def keyed(ds, prefix):
        ds = _add_norm(ds.select_columns(cols), "url", "__n")
        return ds.map_batches(
            lambda b: b.rename_columns(
                ["__n" if c == "__n" else prefix + c
                 for c in b.column_names]),
            batch_format="pyarrow")

    prev = keyed(prev_pages, "prev_")
    new = keyed(new_pages, "new_")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        present_prev = df["prev_url"].notna() if "prev_url" in df \
            else pd.Series(False, index=df.index)
        if "new_url" in df:
            present_new = df["new_url"].notna()
        else:
            present_new = pd.Series(False, index=df.index)
        changed = pd.Series(False, index=df.index)
        for c in DIFF_SIGNAL_COLUMNS:
            pc_, nc = "prev_" + c, "new_" + c
            if pc_ in df and nc in df:
                a = df[pc_].astype("object")
                b = df[nc].astype("object")
                # null-safe: two missing values are equal, not a change
                changed |= a.ne(b) & ~(a.isna() & b.isna())
        change = np.where(
            present_prev & present_new,
            np.where(changed, "changed", "unchanged"),
            np.where(present_new, "added", "removed"))
        url = df["new_url"].where(present_new, df.get("prev_url")) \
            if "new_url" in df else df["prev_url"]
        out = pd.DataFrame({"url": url, "change": change})
        # every block emits the full prev_*/new_* signal schema with one
        # canonical dtype per column (null-filled when the side is
        # absent) so union blocks are homogeneous
        for c in DIFF_SIGNAL_COLUMNS:
            dt = DIFF_SIGNAL_DTYPES[c]
            for side in ("prev_", "new_"):
                col = side + c
                src = df[col] if col in df \
                    else pd.Series(None, index=df.index, dtype="object")
                out[col] = src.astype(dt)
        return out

    both = hash_join(new, prev, "__n", how="left_outer")
    fwd = both.map_batches(classify, batch_format="pandas")
    # URLs only in prev (removed): prev anti-join new
    import pyarrow.compute as pc

    removed = hash_join(prev, new.select_columns(["__n", "new_url"]),
                        "__n", how="left_outer") \
        .map_batches(lambda b: b.filter(pc.is_null(b.column("new_url"))),
                     batch_format="pyarrow") \
        .map_batches(classify, batch_format="pandas")
    return fwd.union(removed)


def crawl_diff_dirs(prev_dir: str, new_dir: str):
    from .reports import load_pages
    cols = ["url", *DIFF_SIGNAL_COLUMNS]
    return crawl_diff(load_pages(prev_dir, columns=cols),
                      load_pages(new_dir, columns=cols))
