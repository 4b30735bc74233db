"""S1 retry/backoff fault model (reference crawler.py:941-976): 429
responses retried with Retry-After / exponential backoff; exhausted
retries record the 429 row. Engine == oracle on a fault-injected corpus."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from librecrawl_ray.corpus import generate_corpus, write_corpus
from librecrawl_ray.oracle import simulate
from librecrawl_ray.policy import CrawlConfig, resolve_retry

SEEDS = ["https://site.example/"]


def test_resolve_retry_spec():
    # no fault
    assert resolve_retry(0, "", 3, 1.0) == (False, 0, 0.0)
    # exponential backoff 1+2+4 for three 429s, no header
    assert resolve_retry(3, "", 3, 1.0) == (False, 3, 7.0)
    # numeric Retry-After honoured per attempt
    assert resolve_retry(2, "2", 3, 1.0) == (False, 2, 4.0)
    # malformed header falls back to exponential (reference ValueError path)
    assert resolve_retry(2, "soon", 3, 1.0) == (False, 2, 3.0)
    # give-up: only `retries` waits happen, then the 429 is recorded
    gave_up, rc, wait = resolve_retry(5, "", 3, 1.0)
    assert gave_up and rc == 3 and wait == 7.0
    # per-wait 30 s cap (reference min(wait, 30))
    _, _, w = resolve_retry(6, "", 6, 1.0)
    assert w == 1 + 2 + 4 + 8 + 16 + 30
    _, _, w2 = resolve_retry(1, "99", 3, 1.0)
    assert w2 == 30.0


def test_fault_injection_deterministic():
    a = generate_corpus("t1", faults=True)["documents"]
    b = generate_corpus("t1", faults=True)["documents"]
    assert a.equals(b)
    rows = a.to_pylist()
    faulted = [r for r in rows if r["fault_429"]]
    assert len(faulted) > 20
    assert any(r["fault_429"] > 3 for r in faulted)          # give-ups
    assert {r["retry_after"] for r in faulted} >= {"", "2", "soon"}
    # never on the seed, 3xx rows, or redirect targets
    targets = {r["redirect_to"] for r in rows if r["redirect_to"]}
    for r in faulted:
        assert r["doc_id"] != "https://site.example/"
        assert not r["redirect_to"]
        assert r["doc_id"] not in targets
    # the default corpus is untouched (column present, all zero)
    clean = generate_corpus("t1")["documents"]
    assert not any(r["fault_429"] for r in clean.to_pylist())


@pytest.fixture(scope="module")
def faulted_run(ray_session, tmp_path_factory):
    fix = generate_corpus("t1", faults=True)
    cdir = write_corpus("t1", faults=True)
    cfg = CrawlConfig.from_fixture(fix["config"], "site.example")
    oracle = simulate(fix["documents"], fix["robots"], SEEDS, cfg)
    from librecrawl_ray.engine.crawl import WaveCrawler
    out = str(tmp_path_factory.mktemp("crawl_faults"))
    eng = WaveCrawler(cdir, out, cfg, fetch_concurrency=2,
                      small_wave_threshold=64)
    summary = eng.run(SEEDS)
    return fix, cfg, oracle, eng, summary


def _pages(summary):
    files = sorted(glob.glob(os.path.join(
        summary["out_dir"], "pages", "wave=*", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="default")


def test_faulted_crawl_matches_oracle(faulted_run):
    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.state.filters import sha1_to_u64
    _, _, oracle, eng, summary = faulted_run
    pages = _pages(summary)
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("depth").to_pylist(),
                     pages.column("seq").to_pylist(),
                     pages.column("wave").to_pylist()),
                 key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert got == want
    assert eng.seen_sha1s() == \
        {sha1_to_u64(url_sha1(u)) for u in oracle.seen}


def test_429_pages_recorded_without_outlinks(faulted_run):
    fix, cfg, oracle, _, summary = faulted_run
    pages = _pages(summary)
    crawled_429 = {u for u, s in zip(pages.column("url").to_pylist(),
                                     pages.column("status_code").to_pylist())
                   if s == 429}
    # the fixture's give-up docs that the crawl reached ARE recorded as 429
    giveups = {r["doc_id"] for r in fix["documents"].to_pylist()
               if r["fault_429"] > cfg.retries}
    assert crawled_429 and crawled_429 <= giveups
    # ...and contribute no edges (empty content recorded)
    files = sorted(glob.glob(os.path.join(
        summary["out_dir"], "links", "wave=*", "*.parquet")))
    links = pa.concat_tables([pq.read_table(f) for f in files],
                             promote_options="default")
    assert not crawled_429 & set(links.column("source_url").to_pylist())
    # oracle agrees page-for-page
    assert crawled_429 == {p["url"] for p in oracle.pages
                           if p["status_code"] == 429}


def test_backoff_waits_in_response_time(faulted_run):
    """Retried-then-succeeded pages carry corpus response_time plus the
    exact backoff schedule; counters roll up into the run summary."""
    fix, cfg, _, _, summary = faulted_run
    pages = _pages(summary)
    by_url = dict(zip(pages.column("url").to_pylist(),
                      pages.column("response_time").to_pylist()))
    docs = {r["doc_id"]: r for r in fix["documents"].to_pylist()}
    checked = retries_want = 0
    wait_want = 0.0
    kinds = set()
    for url, rt in by_url.items():
        d = docs.get(url)
        if not d or not d["fault_429"]:
            continue
        gave_up, rc, wait = resolve_retry(
            d["fault_429"], d["retry_after"], cfg.retries,
            cfg.retry_base_delay)
        assert rt == pytest.approx(d["response_time_ms"] + wait * 1000.0)
        retries_want += rc
        wait_want += wait
        if not gave_up:
            checked += 1
            kinds.add(d["retry_after"])
    assert checked >= 10
    assert kinds >= {"", "2", "soon"}      # all header variants exercised
    assert summary["retries_total"] == retries_want
    assert summary["retry_wait_s"] == pytest.approx(wait_want)
    assert summary["rate_limited"] == \
        sum(1 for u in by_url
            if docs.get(u, {}).get("fault_429", 0) > cfg.retries)
    assert summary["rate_limited"] > 0


def test_faulted_kill_resume(ray_session, tmp_path):
    """Kill after wave 1 and resume on the FAULTED corpus: pages (incl.
    the recorded 429 rows) and the seen set equal an uninterrupted
    oracle run — retry semantics are a pure function of the row, so a
    replayed wave reproduces them exactly."""
    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.engine.crawl import WaveCrawler
    from librecrawl_ray.state.filters import sha1_to_u64

    fix = generate_corpus("t1", faults=True)
    cdir = write_corpus("t1", faults=True)
    cfg = CrawlConfig.from_fixture(fix["config"], "site.example")
    oracle = simulate(fix["documents"], fix["robots"], SEEDS, cfg)
    out = str(tmp_path / "out")
    eng1 = WaveCrawler(cdir, out, cfg, fetch_concurrency=2)
    eng1.start(SEEDS)
    eng1.run_wave()
    eng1.run_wave()
    # abandon eng1 (no flush) and resume with a fresh engine
    eng2 = WaveCrawler(cdir, out, cfg, fetch_concurrency=2)
    eng2.run(resume=True)
    pages = _pages({"out_dir": out})
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("depth").to_pylist(),
                     pages.column("seq").to_pylist(),
                     pages.column("wave").to_pylist()),
                 key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert got == want
    assert eng2.seen_sha1s() == \
        {sha1_to_u64(url_sha1(u)) for u in oracle.seen}
    # the 429 give-up set survives the resume
    got_429 = {u for u, s in zip(pages.column("url").to_pylist(),
                                 pages.column("status_code").to_pylist())
               if s == 429}
    assert got_429 == {p["url"] for p in oracle.pages
                       if p["status_code"] == 429}
    assert got_429
