"""Distributed wave engine vs sequential oracle: the BASELINE.md
correctness gate — crawl ordering, URL-seen set, span-sequence equality."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from librecrawl_ray.engine.crawl import WaveCrawler
from librecrawl_ray.state.filters import sha1_to_u64

SEEDS = ["https://site.example/"]


@pytest.fixture(scope="module")
def crawl_result(t1_crawl):
    return t1_crawl


def _read_pages(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "pages", "wave=*", "*.parquet")))
    tables = [pq.read_table(f) for f in files]
    import pyarrow as pa
    return pa.concat_tables(tables, promote_options="default")


def test_crawl_order_matches_oracle(crawl_result, t1_oracle):
    eng, summary = crawl_result
    pages = _read_pages(summary["out_dir"])
    got = sorted(
        zip(pages.column("url").to_pylist(), pages.column("depth").to_pylist(),
            pages.column("seq").to_pylist(), pages.column("wave").to_pylist()),
        key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in t1_oracle.crawl_order]
    assert len(got) == len(want)
    assert got == want


def test_seen_set_matches_oracle(crawl_result, t1_oracle):
    from librecrawl_ray.canonical import url_sha1
    eng, _ = crawl_result
    got = eng.seen_sha1s()
    want = {sha1_to_u64(url_sha1(u)) for u in t1_oracle.seen}
    assert got == want


def test_span_sequence_equality(crawl_result, t1_fixture):
    """Per-row invariant (input_hint): engine output spans reproduce the
    corpus span sequence — (kind, text, media_ref, order) per doc."""
    _, summary = crawl_result
    pages = _read_pages(summary["out_dir"])
    corpus = {r["doc_id"]: r["spans"]
              for r in t1_fixture["documents"].to_pylist()}
    checked = 0
    for row in pages.to_pylist():
        if row["status_code"] == 0 or row["redirect_count"] > 0:
            continue
        want = corpus.get(row["url"])
        if want is None:
            continue
        got = row["spans"]
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in got] == \
               [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in want], f"span mismatch for {row['url']}"
        checked += 1
    assert checked > 300


def test_links_match_oracle(crawl_result, t1_oracle):
    _, summary = crawl_result
    files = sorted(glob.glob(os.path.join(summary["out_dir"], "links",
                                          "wave=*", "*.parquet")))
    import pyarrow as pa
    links = pa.concat_tables([pq.read_table(f) for f in files],
                             promote_options="default")
    got = sorted(zip(links.column("source_url").to_pylist(),
                     links.column("target_url").to_pylist(),
                     links.column("anchor_text").to_pylist(),
                     links.column("placement").to_pylist(),
                     links.column("nofollow").to_pylist()))
    want = sorted((e["source_url"], e["target_url"], e["anchor_text"],
                   e["placement"], e["nofollow"]) for e in t1_oracle.links)
    assert got == want


def test_trap_rejections_match(crawl_result, t1_oracle):
    eng, summary = crawl_result
    assert sum(w["trap_rejected"] for w in summary["waves"]) == \
        len(t1_oracle.trap_rejected)
    cal = [u for u in t1_oracle.seen if "/calendar/" in u]
    assert len(cal) == eng.cfg.trap_threshold


def test_robots_excluded(crawl_result):
    _, summary = crawl_result
    pages = _read_pages(summary["out_dir"])
    assert not any("/private/" in u for u in pages.column("url").to_pylist())


def test_t2_scale_conformance(ray_session, tmp_path_factory):
    """Engine == oracle at t2 scale (~17.8k pages, 26-way fanout): crawl
    order, seen set and trap accounting hold beyond the smoke corpus."""
    from librecrawl_ray.corpus import generate_corpus, write_corpus
    from librecrawl_ray.oracle import simulate
    from librecrawl_ray.policy import CrawlConfig

    fix = generate_corpus("t2")
    cdir = write_corpus("t2")
    cfg = CrawlConfig.from_fixture(fix["config"], "site.example")
    oracle = simulate(fix["documents"], fix["robots"], SEEDS, cfg)
    out = str(tmp_path_factory.mktemp("crawl_t2"))
    eng = WaveCrawler(cdir, out, cfg, fetch_concurrency=4,
                      small_wave_threshold=256)
    summary = eng.run(SEEDS)
    assert summary["fetched_total"] == len(oracle.crawl_order)
    pages = _read_pages(summary["out_dir"])
    got = sorted(
        zip(pages.column("url").to_pylist(), pages.column("depth").to_pylist(),
            pages.column("seq").to_pylist(), pages.column("wave").to_pylist()),
        key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert got == want
    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.state.filters import sha1_to_u64
    assert eng.seen_sha1s() == \
        {sha1_to_u64(url_sha1(u)) for u in oracle.seen}
