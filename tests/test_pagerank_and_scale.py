"""PageRank-lite correctness, bloom-mode crawl, exports over engine output."""

from __future__ import annotations

from collections import defaultdict

import pytest

from librecrawl_ray.canonical import norm_url
from librecrawl_ray.pipelines import reports


def _reference_pagerank(nodes, edges, iterations=5, damping=0.85):
    """Independent dict-based power iteration (the spec)."""
    nodes = sorted(set(nodes))
    n = len(nodes)
    out_edges = defaultdict(list)
    for s, d in edges:
        out_edges[s].append(d)
    ranks = {u: 1.0 / n for u in nodes}
    for _ in range(iterations):
        sums = defaultdict(float)
        dangling = 0.0
        for u in nodes:
            targets = out_edges.get(u)
            if not targets:
                dangling += ranks[u]
                continue
            share = ranks[u] / len(targets)
            for t in targets:
                sums[t] += share
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = {u: base + damping * sums.get(u, 0.0) for u in nodes}
    return ranks


def test_pagerank_lite_matches_reference(ray_session, t1_crawl, t1_oracle):
    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"])
    links = reports.load_links(summary["out_dir"])
    got = reports.pagerank_lite(pages, links).to_pandas()
    got_map = dict(zip(got["url"], got["rank"]))

    node_norms = {norm_url(p["url"]) for p in t1_oracle.pages}
    edges = set()
    for e in t1_oracle.links:
        if not e["is_internal"]:
            continue
        s, d = norm_url(e["source_url"]), norm_url(e["target_url"])
        if s in node_norms and d in node_norms:
            edges.add((s, d))
    want = _reference_pagerank(node_norms, edges)
    assert len(got_map) == len(t1_oracle.pages)
    for p in t1_oracle.pages:
        assert abs(got_map[p["url"]] - want[norm_url(p["url"])]) < 1e-9, \
            p["url"]
    # the homepage out-ranks a leaf page
    leaf = max(t1_oracle.pages, key=lambda p: p["depth"])
    assert got_map["https://site.example/"] > got_map[leaf["url"]]


def test_bloom_only_crawl(ray_session, t1_corpus_dir, t1_cfg, t1_oracle,
                          tmp_path):
    """exact_seen=False: shards run on the bloom filter alone (the 10^10
    memory representation). At fixture scale the FP probability is ~0, so
    results still match the oracle exactly."""
    from librecrawl_ray.engine.crawl import WaveCrawler
    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), t1_cfg,
                      fetch_concurrency=2, exact_seen=False)
    s = eng.run(["https://site.example/"])
    assert s["fetched_total"] == len(t1_oracle.crawl_order)
    import glob
    import os
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = sorted(glob.glob(os.path.join(s["out_dir"], "pages",
                                          "wave=*", "*.parquet")))
    pages = pa.concat_tables([pq.read_table(f, columns=["url", "seq"])
                              for f in files], promote_options="default")
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("seq").to_pylist()))
    want = sorted((c["url"], c["seq"]) for c in t1_oracle.crawl_order)
    assert got == want


def test_exports_over_engine_output(ray_session, t1_crawl):
    from librecrawl_ray.exports.formats import export_pages_ds
    _, summary = t1_crawl
    pages = reports.load_pages(
        summary["out_dir"],
        columns=["url", "status_code", "title", "meta_description", "h1",
                 "word_count", "depth", "seq", "wave", "internal_links",
                 "external_links", "canonical_url", "response_time",
                 "size", "og_tags", "twitter_tags", "json_ld", "images",
                 "h2", "h3"])
    csv_text = export_pages_ds(pages, "csv")
    lines = csv_text.strip().splitlines()
    assert len(lines) == summary["fetched_total"] + 1
    assert lines[1].startswith("https://site.example/,200,")

    # the streamed sink is byte-identical to formatting driver-side rows
    from librecrawl_ray.exports.formats import (pages_csv, pages_json,
                                                pages_xml)
    rows = pages.to_pandas().sort_values(["wave", "depth", "seq"]) \
        .to_dict("records")
    assert csv_text == pages_csv(rows)
    ed = "2026-01-01 00:00:00"
    assert export_pages_ds(pages, "json", export_date=ed) == \
        pages_json(rows, export_date=ed)
    assert export_pages_ds(pages, "xml", export_date=ed) == \
        pages_xml(rows, export_date=ed)


def test_export_out_path_and_sharded(ray_session, t1_crawl, tmp_path):
    import glob

    from librecrawl_ray.exports.formats import (export_pages_ds,
                                                export_pages_sharded)
    _, summary = t1_crawl
    pages = reports.load_pages(
        summary["out_dir"], columns=["url", "status_code", "title",
                                     "word_count", "depth", "seq", "wave"])
    fields = ["url", "status_code", "title", "word_count", "depth"]
    p = export_pages_ds(pages, "csv", fields=fields,
                        out_path=str(tmp_path / "pages.csv"))
    text = open(p, newline="").read()
    assert text == export_pages_ds(pages, "csv", fields=fields)
    # sharded mode: same row count across parts, one header line each
    out_dir = str(tmp_path / "parts")
    export_pages_sharded(pages, out_dir, fields=fields)
    n = 0
    for f in glob.glob(out_dir + "/*"):
        lines = open(f).read().strip().splitlines()
        assert lines[0].split(",")[0].strip('"') == "url"
        n += len(lines) - 1
    assert n == summary["fetched_total"]


def test_pagerank_distributed_equals_pandas(ray_session, t1_crawl):
    """The scale path (Datasets end-to-end) matches the driver-resident
    pandas path on the t1 crawl graph."""
    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"], columns=["url"])
    links = reports.load_links(summary["out_dir"])
    a = (reports.pagerank_lite(pages, links, distributed_threshold=0)
         .to_pandas().sort_values("url").reset_index(drop=True))
    b = (reports.pagerank_distributed(pages, links)
         .to_pandas().sort_values("url").reset_index(drop=True))
    assert a["url"].tolist() == b["url"].tolist()
    import numpy as np
    assert np.allclose(a["rank"], b["rank"], atol=1e-11)


def test_cuckoo_only_crawl(ray_session, t1_corpus_dir, t1_cfg, t1_oracle,
                           tmp_path):
    """seen_filter_kind="cuckoo" with exact_seen=False: shards admit on
    the cuckoo filter alone (the deletion-capable 10^10 representation).
    At fixture scale fingerprint collisions are ~0, so the crawl matches
    the oracle exactly — same contract as the bloom-only mode."""
    from librecrawl_ray.engine.crawl import WaveCrawler
    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), t1_cfg,
                      fetch_concurrency=2, exact_seen=False,
                      seen_filter_kind="cuckoo")
    s = eng.run(["https://site.example/"])
    assert s["fetched_total"] == len(t1_oracle.crawl_order)
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(s["out_dir"], "pages",
                                          "wave=*", "*.parquet")))
    pages = pa.concat_tables([pq.read_table(f, columns=["url", "seq"])
                              for f in files], promote_options="default")
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("seq").to_pylist()))
    want = sorted((c["url"], c["seq"]) for c in t1_oracle.crawl_order)
    assert got == want


def test_seen_retraction(ray_session, t1_corpus_dir, t1_cfg, tmp_path):
    """Mid-crawl policy flip: retract_urls removes admitted URLs from the
    seen shards (cuckoo/exact modes), they become re-admittable, and
    bloom-probabilistic shards refuse (bits cannot be unset)."""
    import pytest as _pytest
    import ray as _ray

    from librecrawl_ray.canonical import url_sha1
    from librecrawl_ray.engine.crawl import WaveCrawler
    from librecrawl_ray.state.seen_filter import SeenShard

    # shard-level: cuckoo without exact set deletes truly
    sh = SeenShard.remote(0, 10_000, exact=False, filter_kind="cuckoo")
    sha = [url_sha1(f"https://site.example/p{i}") for i in range(50)]
    assert all(_ray.get(sh.admit.remote(sha)))
    assert all(_ray.get(sh.contains.remote(sha)))
    assert _ray.get(sh.retract.remote(sha[:20])) == 20
    assert not any(_ray.get(sh.contains.remote(sha[:20])))
    assert all(_ray.get(sh.contains.remote(sha[20:])))
    assert all(_ray.get(sh.admit.remote(sha[:20])))  # re-admittable

    # bloom-probabilistic shard refuses retraction
    bl = SeenShard.remote(0, 10_000, exact=False, filter_kind="bloom")
    _ray.get(bl.admit.remote(sha))
    with _pytest.raises(_ray.exceptions.RayTaskError):
        _ray.get(bl.retract.remote(sha[:5]))

    # engine-level routing across shards (exact mode)
    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), t1_cfg,
                      fetch_concurrency=1)
    urls = [f"https://site.example/page/{c}" for c in "abcdefgh"]
    from librecrawl_ray.canonical import shard_of
    for u in urls:
        s = shard_of(url_sha1(u), t1_cfg.num_shards)
        _ray.get(eng.shards[s].admit.remote([url_sha1(u)]))
    assert eng.retract_urls(urls[:5]) == 5
    assert eng.retract_urls(urls[:5]) == 0   # already gone
    for u in urls[5:]:
        s = shard_of(url_sha1(u), t1_cfg.num_shards)
        assert _ray.get(eng.shards[s].contains.remote([url_sha1(u)]))[0]


def _reference_hits(nodes, edges, iterations=5):
    """Independent dict-based HITS (L1-normalized, hub_0 = 1/n)."""
    nodes = sorted(set(nodes))
    n = len(nodes)
    hub = {u: 1.0 / n for u in nodes}
    auth = {u: 0.0 for u in nodes}
    for _ in range(iterations):
        raw_a = defaultdict(float)
        for s, d in edges:
            raw_a[d] += hub[s]
        t = sum(raw_a.values())
        auth = {u: (raw_a.get(u, 0.0) / t if t else 0.0) for u in nodes}
        raw_h = defaultdict(float)
        for s, d in edges:
            raw_h[s] += auth[d]
        t = sum(raw_h.values())
        hub = {u: (raw_h.get(u, 0.0) / t if t else 0.0) for u in nodes}
    return auth, hub


def test_hits_scores_match_reference(ray_session, t1_crawl, t1_oracle):
    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"])
    links = reports.load_links(summary["out_dir"])
    got = reports.hits_scores(pages, links)
    a_map = dict(zip(got["url"], got["authority"]))
    h_map = dict(zip(got["url"], got["hub"]))

    node_norms = {norm_url(p["url"]) for p in t1_oracle.pages}
    edges = set()
    for e in t1_oracle.links:
        if not e["is_internal"]:
            continue
        s, d = norm_url(e["source_url"]), norm_url(e["target_url"])
        if s in node_norms and d in node_norms:
            edges.add((s, d))
    want_a, want_h = _reference_hits(node_norms, edges)
    assert len(a_map) == len(t1_oracle.pages)
    for p in t1_oracle.pages:
        nu = norm_url(p["url"])
        assert abs(a_map[p["url"]] - want_a[nu]) < 1e-9, p["url"]
        assert abs(h_map[p["url"]] - want_h[nu]) < 1e-9, p["url"]
    # scores are probability vectors: each L1 sum is 1 (or 0 if no edges)
    assert abs(sum(want_a.values()) - 1.0) < 1e-9
    # the homepage is a stronger hub than a leaf page
    leaf = max(t1_oracle.pages, key=lambda p: p["depth"])
    assert h_map["https://site.example/"] > h_map[leaf["url"]]


def test_degree_histogram_matches_reference(ray_session, t1_crawl,
                                            t1_oracle):
    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"])
    links = reports.load_links(summary["out_dir"])
    got = reports.degree_histogram(pages, links)

    node_norms = {norm_url(p["url"]) for p in t1_oracle.pages}
    edges = set()
    for e in t1_oracle.links:
        if not e["is_internal"]:
            continue
        s, d = norm_url(e["source_url"]), norm_url(e["target_url"])
        if s in node_norms and d in node_norms:
            edges.add((s, d))
    want = []
    for direction, pos in (("in", 1), ("out", 0)):
        deg = defaultdict(int)
        for edge in edges:
            deg[edge[pos]] += 1
        hist = defaultdict(int)
        for n in node_norms:
            d = deg.get(n, 0)
            hist[d.bit_length() - 1 if d else -1] += 1
        want.extend((direction, k, c) for k, c in sorted(hist.items())
                    if c > 0)
    got_rows = list(got.itertuples(index=False, name=None))
    assert got_rows == want
    # sanity: every crawled page is accounted for in each direction
    per_dir = got.groupby("direction")["n_nodes"].sum()
    assert (per_dir == len(node_norms)).all()


def test_triangle_counts_match_reference(ray_session, t1_crawl, t1_oracle):
    """triangle_counts == a brute-force set recount over the oracle's
    own undirected node-filtered edge list (counts, degrees AND the
    half-away-rounded local clustering coefficient)."""
    import math
    from itertools import combinations

    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"])
    links = reports.load_links(summary["out_dir"])
    got = reports.triangle_counts(pages, links)

    node_norms = {norm_url(p["url"]) for p in t1_oracle.pages}
    und = set()
    for e in t1_oracle.links:
        if not e["is_internal"]:
            continue
        s, d = norm_url(e["source_url"]), norm_url(e["target_url"])
        if s != d and s in node_norms and d in node_norms:
            und.add((min(s, d), max(s, d)))
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = defaultdict(int)
    for u, v in und:
        for w in adj[u] & adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    # each triangle is discovered once per edge (3×); undo
    assert all(c % 3 == 0 for c in tri.values())
    tri = {n: c // 3 for n, c in tri.items()}

    want = {}
    for n, c in tri.items():
        d = len(adj[n])
        want[n] = (d, c, math.floor(2.0 * c / (d * (d - 1.0)) * 1e6
                                    + 0.5) / 1e6)
    got_map = {norm_url(r.url): (r.degree, r.triangles, r.lcc)
               for r in got.itertuples(index=False)}
    assert got_map == want
    assert (got["lcc"] <= 1.0).all() and (got["lcc"] > 0.0).all()
    assert list(got["url"]) == sorted(got["url"])


def test_cocitation_pairs_match_reference(ray_session, t1_crawl,
                                          t1_oracle):
    """cocitation_pairs == brute-force pair recount over the oracle's
    directed node-filtered edge list (threshold, ordering, cap)."""
    from itertools import combinations

    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"])
    links = reports.load_links(summary["out_dir"])
    got = reports.cocitation_pairs(pages, links, min_common=2, top=200)

    node_norms = {norm_url(p["url"]) for p in t1_oracle.pages}
    by_src = defaultdict(set)
    for e in t1_oracle.links:
        if not e["is_internal"]:
            continue
        s, d = norm_url(e["source_url"]), norm_url(e["target_url"])
        if s in node_norms and d in node_norms:
            by_src[s].add(d)
    cnt = defaultdict(int)
    for s, dsts in by_src.items():
        for a, b in combinations(sorted(dsts), 2):
            cnt[(a, b)] += 1
    want = sorted(((a, b, n) for (a, b), n in cnt.items() if n >= 2),
                  key=lambda r: (-r[2], r[0], r[1]))[:200]
    got_rows = list(got.itertuples(index=False, name=None))
    assert got_rows == want
    assert len(want) > 0
