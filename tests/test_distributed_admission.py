"""Fully distributed admission path (VERDICT r2 #4) vs the sequential
oracle: trap counts in shard actors, politeness gating in per-cell tasks,
seq by block-offset cumsum, checkpoints written by finalize tasks — the
driver holds only per-cell/per-host/per-range summaries. Forced active on
every wave via distributed_dedup_threshold=0 + small_wave_threshold=0."""

from __future__ import annotations

import dataclasses
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from librecrawl_ray.engine.crawl import WaveCrawler
from librecrawl_ray.oracle import simulate

SEEDS = ["https://site.example/"]


def _pages(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "pages", "wave=*",
                                          "*.parquet")))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["url", "depth", "seq", "wave"])
         for f in files], promote_options="default")
    return sorted(zip(t.column("url").to_pylist(),
                      t.column("depth").to_pylist(),
                      t.column("seq").to_pylist(),
                      t.column("wave").to_pylist()),
                  key=lambda r: (r[3], r[1], r[2]))


def _engine(cdir, out, cfg):
    eng = WaveCrawler(cdir, out, cfg, fetch_concurrency=2,
                      small_wave_threshold=0)
    eng.distributed_dedup_threshold = 0
    return eng


def test_distributed_politeness_and_order(ray_session, t1_fixture,
                                          t1_corpus_dir, t1_cfg, tmp_path):
    """Distributed cells path with per-host caps: crawl order, deferrals
    and wave admission mode all match the oracle."""
    cfg = dataclasses.replace(t1_cfg, per_host_wave_cap=20, max_depth=2)
    oracle = simulate(t1_fixture["documents"], t1_fixture["robots"],
                      SEEDS, cfg)
    eng = _engine(t1_corpus_dir, str(tmp_path / "out"), cfg)
    s = eng.run(SEEDS)
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert _pages(s["out_dir"]) == want
    assert any(w["deferred"] > 0 for w in s["waves"])
    assert all(w.get("admission") == "distributed" for w in s["waves"])


def test_distributed_max_urls_stop(ray_session, t1_fixture, t1_corpus_dir,
                                   t1_cfg, tmp_path):
    cfg = dataclasses.replace(t1_cfg, max_urls=50)
    oracle = simulate(t1_fixture["documents"], t1_fixture["robots"],
                      SEEDS, cfg)
    eng = _engine(t1_corpus_dir, str(tmp_path / "out"), cfg)
    s = eng.run(SEEDS)
    assert s["fetched_total"] == 50
    got = sorted((u, q) for (u, d, q, w) in _pages(s["out_dir"]))
    want = sorted((c["url"], c["seq"]) for c in oracle.crawl_order)
    assert got == want


def test_distributed_kill_resume(ray_session, t1_fixture, t1_corpus_dir,
                                 t1_cfg, t1_oracle, tmp_path):
    """Kill after two distributed waves (+ planted garbage), resume with a
    fresh engine on the distributed path: pages and seen set equal the
    oracle's (task-written multi-part admitted/deferred checkpoints
    replay correctly)."""
    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.state.filters import sha1_to_u64
    out = str(tmp_path / "out")
    e1 = _engine(t1_corpus_dir, out, t1_cfg)
    e1.start(SEEDS)
    e1.run_wave()
    e1.run_wave()
    os.makedirs(os.path.join(out, "pages", "wave=2"), exist_ok=True)
    with open(os.path.join(out, "pages", "wave=2", "junk.parquet"),
              "w") as f:
        f.write("partial garbage")
    e2 = _engine(t1_corpus_dir, out, t1_cfg)
    e2.run(resume=True)
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in t1_oracle.crawl_order]
    assert _pages(out) == want
    assert e2.seen_sha1s() == \
        {sha1_to_u64(url_sha1(u)) for u in t1_oracle.seen}
