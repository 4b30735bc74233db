"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_fixture():
    from librecrawl_ray.corpus import generate_corpus
    return generate_corpus("t1")


@pytest.fixture(scope="session")
def t1_corpus_dir():
    from librecrawl_ray.corpus import write_corpus
    return write_corpus("t1")


@pytest.fixture(scope="session")
def t1_cfg(t1_fixture):
    from librecrawl_ray.policy import CrawlConfig
    return CrawlConfig.from_fixture(t1_fixture["config"], "site.example")


@pytest.fixture(scope="session")
def t1_oracle(t1_fixture, t1_cfg):
    from librecrawl_ray.oracle import simulate
    return simulate(t1_fixture["documents"], t1_fixture["robots"],
                    ["https://site.example/"], t1_cfg)


@pytest.fixture(scope="session")
def t1_crawl(ray_session, t1_corpus_dir, t1_cfg, tmp_path_factory):
    """One t1 crawl per session; (engine, summary)."""
    from librecrawl_ray.engine.crawl import WaveCrawler
    out = str(tmp_path_factory.mktemp("crawl_t1_session"))
    # small_wave_threshold=0 forces every wave through the distributed
    # Ray Data path — the session's flagship crawl exercises the real thing
    eng = WaveCrawler(t1_corpus_dir, out, t1_cfg, fetch_concurrency=2,
                      small_wave_threshold=0)
    summary = eng.run(["https://site.example/"])
    return eng, summary
