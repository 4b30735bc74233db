"""Politeness budget, max_urls stop, and kill+resume invariants."""

from __future__ import annotations

import dataclasses
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from librecrawl_ray.engine.crawl import WaveCrawler
from librecrawl_ray.oracle import simulate

SEEDS = ["https://site.example/"]


def _pages(out_dir, cols=("url", "depth", "seq", "wave")):
    files = sorted(glob.glob(os.path.join(out_dir, "pages", "wave=*", "*.parquet")))
    return pa.concat_tables([pq.read_table(f, columns=list(cols)) for f in files],
                            promote_options="default")


def test_politeness_caps_and_order(ray_session, t1_fixture, t1_corpus_dir,
                                   t1_cfg, tmp_path):
    """Per-host wave caps (with robots Crawl-delay scaling) defer fetches;
    engine order still matches the oracle's politeness-gated order, and no
    wave exceeds any host's cap."""
    cfg = dataclasses.replace(t1_cfg, per_host_wave_cap=20, max_depth=2)
    oracle = simulate(t1_fixture["documents"], t1_fixture["robots"], SEEDS, cfg)
    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), cfg,
                      fetch_concurrency=2)
    s = eng.run(SEEDS)
    pages = _pages(s["out_dir"])
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("depth").to_pylist(),
                     pages.column("seq").to_pylist(),
                     pages.column("wave").to_pylist()),
                 key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert got == want
    assert any(w["deferred"] > 0 for w in s["waves"])
    # cap accounting: sub0 has Crawl-delay 2 → cap 10; others cap 20
    from collections import Counter
    from librecrawl_ray.canonical import url_host
    for w in sorted({r[3] for r in got}):
        per_host = Counter(url_host(u) for (u, d, q, wv) in got if wv == w)
        for h, n in per_host.items():
            cap = 10 if h.startswith("sub0.") else 20
            assert n <= cap, (w, h, n)


def test_max_urls_budget_stop(ray_session, t1_fixture, t1_corpus_dir,
                              t1_cfg, tmp_path):
    cfg = dataclasses.replace(t1_cfg, max_urls=50)
    oracle = simulate(t1_fixture["documents"], t1_fixture["robots"], SEEDS, cfg)
    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), cfg,
                      fetch_concurrency=2)
    s = eng.run(SEEDS)
    assert s["fetched_total"] == 50
    pages = _pages(s["out_dir"])
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("seq").to_pylist()))
    want = sorted((c["url"], c["seq"]) for c in oracle.crawl_order)
    assert got == want


def test_kill_resume_identical(ray_session, t1_fixture, t1_corpus_dir,
                               t1_cfg, t1_oracle, tmp_path):
    """Kill after wave 1 (plus a planted partial wave-2 file), resume with a
    fresh engine; final pages and URL-seen set equal the oracle's."""
    out = str(tmp_path / "out")
    eng1 = WaveCrawler(t1_corpus_dir, out, t1_cfg, fetch_concurrency=2)
    eng1.start(SEEDS)
    eng1.run_wave()
    eng1.run_wave()
    os.makedirs(os.path.join(out, "pages", "wave=2"), exist_ok=True)
    with open(os.path.join(out, "pages", "wave=2", "junk.parquet"), "w") as f:
        f.write("partial garbage")
    # fresh engine: new shard actors, resume from committed state
    eng2 = WaveCrawler(t1_corpus_dir, out, t1_cfg, fetch_concurrency=2)
    eng2.run(resume=True)
    pages = _pages(out)
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("depth").to_pylist(),
                     pages.column("seq").to_pylist(),
                     pages.column("wave").to_pylist()),
                 key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in t1_oracle.crawl_order]
    assert got == want
    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.state.filters import sha1_to_u64
    assert eng2.seen_sha1s() == \
        {sha1_to_u64(url_sha1(u)) for u in t1_oracle.seen}


def test_t2_kill_resume(ray_session, tmp_path_factory):
    """Kill+resume at t2 scale (~17.8k pages), including a kill BETWEEN
    the checkpoint write and the (deferred) lineage commit — the replayed
    wave must be idempotent."""
    from librecrawl_ray.corpus import generate_corpus, write_corpus
    from librecrawl_ray.policy import CrawlConfig

    cdir = write_corpus("t2")
    cfg = CrawlConfig.from_fixture(generate_corpus("t2")["config"],
                                   "site.example")
    out = str(tmp_path_factory.mktemp("t2_resume"))
    eng1 = WaveCrawler(cdir, out, cfg, fetch_concurrency=4,
                       small_wave_threshold=256)
    eng1.start(SEEDS)
    eng1.run_wave()
    eng1.run_wave()
    eng1.run_wave()          # wave 2's lineage commit is still pending here
    # abandon eng1 without flushing — simulates a crash after the wave's
    # data writes started but before its commit sealed
    eng2 = WaveCrawler(cdir, out, cfg, fetch_concurrency=4,
                       small_wave_threshold=256)
    s = eng2.run(resume=True)
    ref_out = str(tmp_path_factory.mktemp("t2_ref"))
    eng3 = WaveCrawler(cdir, ref_out, cfg, fetch_concurrency=4,
                       small_wave_threshold=256)
    s3 = eng3.run(SEEDS)
    assert eng2.fetched_total == eng3.fetched_total
    a = _pages(out).to_pylist()
    b = _pages(ref_out).to_pylist()
    ka = sorted((r["url"], r["depth"], r["seq"]) for r in a)
    kb = sorted((r["url"], r["depth"], r["seq"]) for r in b)
    assert ka == kb
    assert eng2.seen_sha1s() == eng3.seen_sha1s()


def test_gate_table_equals_gate(t1_cfg):
    """Vectorized politeness gate == sequential row-loop spec on a skewed
    synthetic frontier (many hosts, hot keys, interleaved order)."""
    import pyarrow as pa
    from librecrawl_ray.state.politeness import PolitenessScheduler
    rows = []
    seq = 0
    for d in range(3):
        for i in range(400):
            host = ["hot.example", "warm.example",
                    f"cold-{i % 37}.example"][i % 3]
            rows.append({"url": f"https://{host}/p{seq}", "depth": d,
                         "seq": seq, "wave": 0, "host": host,
                         "sha64": seq, "part": 0, "signature": ""})
            seq += 1
    schema = pa.schema([("url", pa.string()), ("depth", pa.int32()),
                        ("seq", pa.int64()), ("wave", pa.int32()),
                        ("host", pa.string()), ("sha64", pa.uint64()),
                        ("part", pa.int32()), ("signature", pa.string())])
    tbl = pa.Table.from_pylist(rows, schema=schema)
    a = PolitenessScheduler(t1_cfg, None)
    b = PolitenessScheduler(t1_cfg, None)
    g_rows, d_rows = a.gate(rows)
    g_tbl, d_tbl = b.gate_table(tbl)
    assert [r["url"] for r in g_rows] == g_tbl.column("url").to_pylist()
    want_def = [r["url"] for r in d_rows]
    got_def = d_tbl.column("url").to_pylist() if d_tbl is not None else []
    assert want_def == got_def
    assert a.deferred_total == b.deferred_total


def test_resume_after_complete_is_stable(ray_session, t1_corpus_dir, t1_cfg,
                                         tmp_path_factory):
    """Resuming a COMPLETED crawl (terminal lineage marker present) is a
    no-op: no extra waves, identical fetched_total, marker still there."""
    import os
    from librecrawl_ray.engine.crawl import WaveCrawler
    out = str(tmp_path_factory.mktemp("resume_done"))
    eng = WaveCrawler(t1_corpus_dir, out, t1_cfg, fetch_concurrency=2)
    s1 = eng.run(["https://site.example/"])
    assert os.path.exists(os.path.join(out, "lineage", "wave-final.json"))
    eng2 = WaveCrawler(t1_corpus_dir, out, t1_cfg, fetch_concurrency=2)
    s2 = eng2.run(resume=True)
    assert s2["fetched_total"] == s1["fetched_total"]
    assert s2["num_waves"] == 0
    assert os.path.exists(os.path.join(out, "lineage", "wave-final.json"))
