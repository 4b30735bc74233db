"""Sitemap seeding (S5), llms.txt validation (S7), robots validator (M5)."""

from __future__ import annotations

import dataclasses
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from librecrawl_ray.engine.crawl import WaveCrawler
from librecrawl_ray.oracle import simulate
from librecrawl_ray.sources.llms import fetch_llms, validate_llms
from librecrawl_ray.sources.robots import parse_robots, validate_robots

SEEDS = ["https://site.example/"]


def test_robots_parse_and_validate(t1_fixture):
    rows = t1_fixture["robots"].to_pylist()
    by_host = {r["host"]: r["content"] for r in rows}
    main = parse_robots(by_host["site.example"])
    assert "/private/" in main.disallow
    assert main.sitemaps == ["https://site.example/sitemap_index.xml"]
    assert not main.is_allowed("https://site.example/private/x")
    assert main.is_allowed("https://site.example/page/a")
    sub0 = parse_robots(by_host["sub0.site.example"])
    assert sub0.crawl_delay == 2
    problems = validate_robots(by_host["broken-robots.example"])
    kinds = {p["problem"] for p in problems}
    assert "missing_colon" in kinds          # "User-agent *"
    assert "unknown_directive" in kinds      # "Disalow"


def test_llms_validation(t1_fixture):
    from librecrawl_ray.oracle import build_lookup
    from librecrawl_ray.canonical import norm_url
    lookup_map = build_lookup(t1_fixture["documents"])
    res = fetch_llms(lambda u: lookup_map.get(norm_url(u)), "site.example")
    assert res["present"] and res["valid"]
    assert res["title"] == "Site Example"
    assert validate_llms(None) == {"present": False, "valid": False,
                                   "title": "", "problems": ["missing"]}
    bad = validate_llms({"content_type": "text/html", "spans": []})
    assert not bad["valid"] and len(bad["problems"]) == 2


def test_sitemap_seeded_crawl(ray_session, t1_fixture, t1_corpus_dir,
                              t1_cfg, tmp_path):
    """use_sitemap admits sitemap URLs at depth 0; the orphan page (only in
    the sitemap) is crawled; engine order still equals the oracle's."""
    cfg = dataclasses.replace(t1_cfg, use_sitemap=True, max_depth=1)
    oracle = simulate(t1_fixture["documents"], t1_fixture["robots"], SEEDS,
                      cfg, sitemaps_table=t1_fixture["sitemaps"])
    oracle_urls = {c["url"] for c in oracle.crawl_order}
    assert "https://site.example/orphan/a" in oracle_urls
    depth0 = [c for c in oracle.crawl_order if c["depth"] == 0]
    assert len(depth0) > 5                      # seed + sitemap entries

    eng = WaveCrawler(t1_corpus_dir, str(tmp_path / "out"), cfg,
                      fetch_concurrency=2)
    summary = eng.run(SEEDS)
    files = sorted(glob.glob(os.path.join(summary["out_dir"], "pages",
                                          "wave=*", "*.parquet")))
    pages = pa.concat_tables([pq.read_table(f, columns=["url", "depth",
                                                        "seq", "wave"])
                              for f in files], promote_options="default")
    got = sorted(zip(pages.column("url").to_pylist(),
                     pages.column("depth").to_pylist(),
                     pages.column("seq").to_pylist(),
                     pages.column("wave").to_pylist()),
                 key=lambda r: (r[3], r[1], r[2]))
    want = [(c["url"], c["depth"], c["seq"], c["wave"])
            for c in oracle.crawl_order]
    assert got == want


def test_pagespeed_stage_with_fake_client(ray_session, t1_crawl):
    """S8 plumbing: selection heuristic + actor-pool PSI stage with an
    injected client; strict (no client) raises at the call point."""
    import pytest
    from librecrawl_ray.pipelines import reports
    from librecrawl_ray.sources.pagespeed import (PageSpeedAuditor,
                                                  pagespeed_report,
                                                  select_pagespeed_pages)
    _, summary = t1_crawl
    pages = reports.load_pages(summary["out_dir"], columns=["url"])

    def fake_client(url, strategy):
        return {"performance_score": 0.5 if strategy == "mobile" else 0.7,
                "lcp_ms": float(len(url))}

    out = pagespeed_report(pages, client=fake_client,
                           max_pages=3).to_pandas()
    assert len(out) == 6                       # 3 pages x 2 strategies
    assert set(out["strategy"]) == {"mobile", "desktop"}
    assert (out["lcp_ms"] == out["url"].str.len()).all()
    # homepage-first selection
    assert "https://site.example/" in set(out["url"])
    assert select_pagespeed_pages([]) == []
    # distributed selection == driver-list heuristic on the same pages
    from librecrawl_ray.sources.pagespeed import select_pages_ds
    all_urls = [r["url"] for r in pages.take_all()]
    assert select_pages_ds(pages, max_pages=5) == \
        select_pagespeed_pages(all_urls, max_pages=5)
    import pyarrow as pa
    with pytest.raises(NotImplementedError):
        PageSpeedAuditor()(pa.table({"url": ["https://x.example/"]}))


def test_ingest_jsonl_and_csv_normalize(ray_session, tmp_path):
    import json as _json

    import pyarrow as pa

    from librecrawl_ray.sources.ingest import (DOCUMENT_SCHEMA,
                                               read_documents_csv,
                                               read_documents_jsonl)

    rows = [
        {"content": "hello world one", "language": "en", "subset": "webA"},
        {"content": "bonjour le monde", "language": "fr", "subset": "webB"},
        {"content": "hello world one", "language": "en", "subset": "webA"},
    ]
    jl = tmp_path / "dump.jsonl"
    jl.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    ds = read_documents_jsonl(str(jl))
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert tbl.schema.equals(DOCUMENT_SCHEMA)
    got = sorted(tbl.to_pylist(), key=lambda r: (r["lang"], r["doc_id"]))
    assert [r["lang"] for r in got] == ["en", "en", "fr"]
    assert got[0]["n_chars"] == len("hello world one")
    # fingerprint-derived ids: identical content -> identical id,
    # stable across re-ingestion
    assert got[0]["doc_id"] == got[1]["doc_id"]
    ds2 = read_documents_jsonl(str(jl))
    assert sorted(r["doc_id"] for r in ds2.to_pandas().to_dict("records")) \
        == sorted(r["doc_id"] for r in got)

    csvp = tmp_path / "dump.csv"
    csvp.write_text("id,text,lang,source\n7,alpha beta,en,s1\n"
                    "9,gamma,de,s2\n")
    t2 = pa.Table.from_pandas(read_documents_csv(str(csvp)).to_pandas(),
                              preserve_index=False)
    assert t2.schema.equals(DOCUMENT_SCHEMA)
    recs = {r["doc_id"]: r for r in t2.to_pylist()}
    assert recs[7]["text"] == "alpha beta" and recs[9]["lang"] == "de"


def test_blocklist_filter_and_jsonl_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from librecrawl_ray.sources.ingest import (filter_blocklist,
                                               read_documents_jsonl,
                                               write_documents_jsonl)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    srcs = set(ds.to_pandas()["source"])
    drop = set(sorted(srcs)[:2])
    kept = filter_blocklist(ds, drop).to_pandas()
    assert set(kept["source"]) == srcs - drop
    assert len(kept) == sum(1 for s in ds.to_pandas()["source"]
                            if s not in drop)

    # JSONL export → re-ingest roundtrip preserves the document table
    out = str(tmp_path / "jsonl")
    write_documents_jsonl(rd.from_pandas(kept), out)
    back = read_documents_jsonl(out).to_pandas()
    a = kept.sort_values("doc_id").reset_index(drop=True)
    b = back[a.columns].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_clustered_layout_roundtrip_and_pruning(ray_session, tmp_path):
    """Clustered parquet layout: full read == original; a ranged read
    == a DuckDB BETWEEN filter; the manifest actually PRUNES (a narrow
    slice opens strictly fewer files than the layout holds); column
    projection and open-ended/empty slices behave."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from librecrawl_ray.sources.clustered import (clustered_paths,
                                                  read_clustered,
                                                  write_clustered)

    src = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(src)
    out = str(tmp_path / "clustered")
    write_clustered(ds, out, key="n_chars", n_ranges=8)

    full = read_clustered(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(full[sorted(full.columns)],
                                  orig[sorted(orig.columns)])

    sl = read_clustered(out, lo=100, hi=200).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT * FROM read_parquet('{src}') "
        f"WHERE n_chars BETWEEN 100 AND 200 ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(sl[sorted(sl.columns)],
                                  want[sorted(want.columns)])

    pruned, _ = clustered_paths(out, 100, 200)
    everything, _ = clustered_paths(out)
    assert 0 < len(pruned) < len(everything)

    proj = read_clustered(out, lo=100, hi=200,
                          columns=["doc_id"]).to_pandas()
    assert sorted(proj.columns) == ["doc_id"] and len(proj) == len(sl)

    lo_only = read_clustered(out, lo=400).to_pandas()
    assert (lo_only["n_chars"] >= 400).all()
    assert read_clustered(out, lo=10 ** 9).to_pandas().empty


def test_warc_roundtrip_and_foreign_parse(ray_session, tmp_path):
    """WARC writer → reader roundtrip is lossless on the canonical
    document columns (incl. CRLFCRLF and unicode bodies, which break
    split-on-blank-line parsers), and a foreign archive without the
    X-Source/X-Lang headers falls back to fingerprint ids + defaults."""
    import ray.data as rd

    from librecrawl_ray.sources.warc import (_record_bytes, read_warc,
                                             read_warc_documents,
                                             write_warc)

    rows = [
        {"doc_id": 7, "text": "plain body", "source": "web",
         "lang": "en", "n_chars": 10},
        {"doc_id": 3, "text": "tricky\r\n\r\nbody with blank line",
         "source": "forum", "lang": "de", "n_chars": 30},
        {"doc_id": 11, "text": "unicodé ünïcode — ✓", "source": "web",
         "lang": "fr", "n_chars": 19},
        {"doc_id": 5, "text": "", "source": "web", "lang": "en",
         "n_chars": 0},
    ]
    ds = rd.from_items(rows)
    out = str(tmp_path / "arc")
    write_warc(ds, out, records_per_shard=2)   # forces multiple shards
    import glob
    shards = sorted(glob.glob(out + "/*.warc"))
    assert len(shards) == 2

    got = read_warc_documents(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    want = pd.DataFrame(rows).sort_values("doc_id") \
        .reset_index(drop=True)
    want["n_chars"] = want["text"].str.len().astype("int64")
    for c in ("doc_id", "text", "source", "lang", "n_chars"):
        assert got[c].tolist() == want[c].tolist(), c
    # raw record surface: status + target URI parsed
    raw = read_warc(out).to_pandas()
    assert (raw["status"] == 200).all()
    assert raw["url"].str.startswith("https://warc.example/").all()

    # foreign archive: strip the X- headers → fingerprint ids, defaults
    rec = _record_bytes(1, "foreign body text", "s", "l")
    stripped = rec.replace(b"WARC-X-Source: s\r\n", b"") \
        .replace(b"WARC-X-Lang: l\r\n", b"") \
        .replace(b"WARC-Record-ID: <urn:doc:1>\r\n",
                 b"WARC-Record-ID: <urn:uuid:abc>\r\n")
    f = tmp_path / "foreign.warc"
    f.write_bytes(stripped)
    fdoc = read_warc_documents(str(f)).to_pandas()
    from librecrawl_ray.sources.ingest import _fingerprint_id
    assert fdoc["doc_id"].tolist() == _fingerprint_id(
        ["foreign body text"])
    assert fdoc["source"].tolist() == ["warc"]
    assert fdoc["lang"].tolist() == ["und"]


def test_robots_audit_sql_twin_parity(tmp_path):
    """The robots-audit SQL twin reproduces the Python parser on
    adversarial content the fixture does not cover: multiple UA groups,
    rules before any group, empty-value directives, unparsable delays,
    comments, missing colons, unknown directives."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from librecrawl_ray.pipelines.crawl_queries import (
        crawl_robots_audit_sql)

    cases = {
        "pregroup.example":
            "Disallow: /early/\nUser-agent: bot\nDisallow: /hidden/\n"
            "User-agent: *\nAllow: /ok/\nCrawl-delay: nope\n"
            "Crawl-delay: 3.5\nSitemap: https://x/s.xml\n",
        "comments.example":
            "# top\nUser-agent: * # star\nDisallow: /a/ # note\n"
            "Disallow:\nAllow:\nSitemap:\n",
        "broken.example":
            "User-agent *\nDisalow: /x\nUser-agent:\nDisallow: /y\n",
        "multi.example":
            "User-agent: a\nCrawl-delay: 9\nUser-agent: *\n"
            "Crawl-delay: 2\nUser-agent: b\nCrawl-delay: 7\n",
    }
    from librecrawl_ray.sources.robots import parse_robots, validate_robots
    path = tmp_path / "robots.parquet"
    pq.write_table(pa.table({"host": list(cases),
                             "content": list(cases.values())}), path)
    got = duckdb.connect().execute(
        crawl_robots_audit_sql(str(path))).df()
    for row in got.itertuples(index=False):
        r = parse_robots(cases[row.host])
        p = validate_robots(cases[row.host])
        assert row.crawl_delay == r.crawl_delay, row.host
        assert row.n_disallow == len(r.disallow), row.host
        assert row.n_allow == len(r.allow), row.host
        assert row.n_sitemaps == len(r.sitemaps), row.host
        assert row.n_problems == len(p), row.host
    # the cases actually exercise the branches
    by = got.set_index("host")
    assert by.loc["pregroup.example", "n_disallow"] == 1   # /early/ only
    assert by.loc["pregroup.example", "crawl_delay"] == 3.5
    assert by.loc["multi.example", "crawl_delay"] == 2.0
    assert by.loc["broken.example", "n_problems"] == 3
