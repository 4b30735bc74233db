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
