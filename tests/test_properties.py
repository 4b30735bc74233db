"""Property-based tests (hypothesis) for the URL canonicalization fast
paths and the filter/sketch primitives."""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from librecrawl_ray.canonical import clean_url, norm_url, url_sha1
from librecrawl_ray.state.filters import BloomFilter

_scheme = st.sampled_from(["http", "https"])
_host = st.from_regex(r"[a-z0-9-]{1,12}(\.[a-z0-9-]{1,8}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,10}){0,4}/?", fullmatch=True)
_query = st.one_of(st.just(""),
                   st.from_regex(r"\?[a-z]=[a-z0-9]{0,6}(&[a-z]=[a-z0-9]{0,6}){0,2}",
                                 fullmatch=True))
_frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9-]{0,8}",
                                             fullmatch=True))


@st.composite
def urls(draw):
    return (f"{draw(_scheme)}://{draw(_host)}{draw(_path)}"
            f"{draw(_query)}{draw(_frag)}")


def slow_norm(url: str) -> str:
    parts = urlsplit(url.strip().lower())
    path = parts.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if path == "":
        path = "/"
    return urlunsplit((parts.scheme, parts.netloc, path, parts.query, ""))


def slow_clean(href: str, base: str) -> str:
    absu = urljoin(base, href.strip())
    p = urlsplit(absu)
    return urlunsplit((p.scheme, p.netloc, p.path, p.query, ""))


@settings(max_examples=300, deadline=None, derandomize=True)
@given(urls())
def test_norm_url_matches_reference(u):
    assert norm_url(u) == slow_norm(u)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.one_of(urls(), _path, st.from_regex(r"//[a-z]{1,8}\.[a-z]{2,4}/[a-z]{0,6}",
                                              fullmatch=True)),
       urls())
def test_clean_url_matches_reference(href, base):
    assert clean_url(href, base) == slow_clean(href, base)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(urls())
def test_norm_idempotent(u):
    assert norm_url(norm_url(u)) == norm_url(u)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200, unique=True))
def test_bloom_no_false_negatives(keys):
    bf = BloomFilter(capacity=1000, fp_rate=0.01)
    arr = np.array(keys, dtype=np.uint64)
    bf.add_many(arr)
    assert bf.contains_many(arr).all()


def test_bloom_fp_rate_in_range():
    rng = np.random.RandomState(3)
    bf = BloomFilter(capacity=50_000, fp_rate=0.01)
    members = rng.randint(0, 2**63, size=50_000).astype(np.uint64)
    bf.add_many(members)
    probe = rng.randint(0, 2**63, size=100_000).astype(np.uint64)
    fp = bf.contains_many(probe).mean()
    assert fp < 0.03, fp


def test_sha1_stability():
    assert url_sha1("https://Site.Example/a/") == \
        url_sha1("https://site.example/a")


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200, unique=True))
def test_cuckoo_no_false_negatives(keys):
    from librecrawl_ray.state.filters import CuckooFilter
    cf = CuckooFilter(capacity=1000)
    arr = np.array(keys, dtype=np.uint64)
    cf.add_many(arr)
    assert cf.contains_many(arr).all()


def test_cuckoo_fp_rate_and_load():
    """Fill to 95% of capacity: inserts succeed, false-positive rate stays
    near the 16-bit-fingerprint bound (≈ 2b/2^16 ≈ 0.012%)."""
    from librecrawl_ray.state.filters import CuckooFilter
    rng = np.random.RandomState(7)
    cf = CuckooFilter(capacity=50_000)
    members = np.unique(rng.randint(0, 2**63, size=47_500)
                        .astype(np.uint64))
    cf.add_many(members)
    assert cf.contains_many(members).all()
    probe = rng.randint(0, 2**63, size=100_000).astype(np.uint64)
    fp = cf.contains_many(probe).mean()
    assert fp < 0.005, fp


def test_cuckoo_delete():
    """Deletion (the capability bloom lacks): removed keys disappear,
    everything else still answers present, count tracks."""
    from librecrawl_ray.state.filters import CuckooFilter
    rng = np.random.RandomState(11)
    cf = CuckooFilter(capacity=10_000)
    keys = np.unique(rng.randint(0, 2**63, size=8_000).astype(np.uint64))
    cf.add_many(keys)
    victims, rest = keys[: len(keys) // 2], keys[len(keys) // 2:]
    removed = cf.delete_many(victims)
    assert removed.all()
    assert cf.contains_many(rest).all()
    # deleted keys may still collide with a survivor's fingerprint in a
    # shared bucket; the rate must drop to fingerprint-collision noise
    assert cf.contains_many(victims).mean() < 0.005
    assert cf.count == len(rest)
    # deleting an absent key reports False and is a no-op
    assert not cf.delete_many(victims[:10]).any()


def test_cuckoo_overflow_unwind_keeps_admitted_keys():
    """When an insert fails at MAX_KICKS the kick path is unwound: every
    PREVIOUSLY admitted key must still answer present (the pre-fix bug
    dropped the in-flight evicted fingerprint, silently turning an
    admitted key into a false negative)."""
    from librecrawl_ray.state.filters import CuckooFilter
    rng = np.random.RandomState(3)
    cf = CuckooFilter(capacity=64)       # 64 buckets x 4 slots = 256
    keys = np.unique(rng.randint(0, 2**63, size=4000).astype(np.uint64))
    admitted = []
    raised = False
    for k in keys:
        try:
            cf.add_many(np.array([k], dtype=np.uint64))
            admitted.append(k)
        except RuntimeError:
            raised = True
            break
    assert raised, "filter never overflowed — test setup wrong"
    adm = np.array(admitted, dtype=np.uint64)
    # the cuckoo no-false-negative invariant survives the failed insert
    assert cf.contains_many(adm).all()
    assert cf.count == len(admitted)


def test_redirect_chains_random_functional_graph(ray_session):
    """resolve_redirect_chains == a python walk on a seeded random
    functional graph: ~200 nodes, dense redirect core with loops,
    dangling targets, and chains longer than the hop cap."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from librecrawl_ray.pipelines.crawl_queries import (
        resolve_redirect_chains)

    rng = np.random.RandomState(7)
    n = 200
    ids = [f"u{i}" for i in range(n)]
    redirect_to = []
    for i in range(n):
        r = rng.rand()
        if r < 0.35:                       # redirect to a random node
            redirect_to.append(f"u{int(rng.randint(n))}")
        elif r < 0.42:                     # dangling target
            redirect_to.append(f"missing{int(rng.randint(20))}")
        else:
            redirect_to.append(None)
    # force a guaranteed loop and a long chain
    redirect_to[0], redirect_to[1] = "u1", "u0"
    for i in range(2, 42):                 # u2 -> u3 -> ... -> u42
        redirect_to[i] = f"u{i + 1}"

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "redirect_to": pa.array(redirect_to, pa.string())}))
    got = resolve_redirect_chains(docs, max_hops=16)

    m = {u: t for u, t in zip(ids, redirect_to) if t}
    urls = set(ids)
    want = {}
    for u, t in m.items():
        cur, hops = t, 1
        while cur in m and hops < 16:
            cur, hops = m[cur], hops + 1
        disp = ("capped" if cur in m
                else "ok" if cur in urls else "dangling")
        want[u] = (cur, hops, disp)
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        assert (r.final_url, r.hops, r.disposition) == want[r.url], r.url
    assert {"ok", "dangling", "capped"} <= set(got.disposition)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=2**62),
              st.text(max_size=400),
              st.text(alphabet=st.characters(
                  whitelist_categories=("Ll", "Nd")), max_size=12),
              st.text(alphabet=st.characters(
                  whitelist_categories=("Ll",)), max_size=8)),
    max_size=8))
def test_warc_record_framing_roundtrip(records):
    """Byte-level WARC framing is lossless for arbitrary unicode bodies
    (including CRLFCRLF inside the payload) across concatenated
    records — the property split-on-blank-line parsers violate."""
    from librecrawl_ray.sources.warc import (_parse_warc_bytes,
                                             _record_bytes)
    blob = b"".join(_record_bytes(i, t, s or "web", lg or "en")
                    for i, t, s, lg in records)
    got = _parse_warc_bytes(blob)
    assert len(got) == len(records)
    for r, (i, t, s, lg) in zip(got, records):
        assert r["record_id"] == f"<urn:doc:{i}>"
        assert r["text"] == t
        assert r["source"] == (s or "web")
        assert r["lang"] == (lg or "en")
        assert r["status"] == 200


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=60),
       st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=60))
def test_bloom_or_merge_equals_union(a, b):
    """bloom(A ∪ B).bits == bloom(A).bits | bloom(B).bits for identical
    (m, k) parameters — the associativity bloom_semi_join's per-block
    build relies on."""
    import hashlib

    from librecrawl_ray.state.filters import BloomFilter

    def keys(xs):
        return np.array([int.from_bytes(
            hashlib.sha1(x.encode()).digest()[:8], "big")
            for x in xs], dtype=np.uint64)

    cap = 128
    fa, fb, fu = (BloomFilter(cap, 0.01) for _ in range(3))
    if a:
        fa.add_many(keys(a))
    if b:
        fb.add_many(keys(b))
    if a or b:
        fu.add_many(keys(a + b))
    assert ((fa.bits | fb.bits) == fu.bits).all()


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=60),
       st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=60))
def test_hll_max_merge_equals_union(a, b):
    """HLL registers of A ∪ B == elementwise max of the two partials —
    the associativity hll_distinct's per-block build relies on."""
    from librecrawl_ray.functions.sketch import HLL_M, _hll_update

    ra = np.zeros(HLL_M, np.int8)
    rb = np.zeros(HLL_M, np.int8)
    ru = np.zeros(HLL_M, np.int8)
    _hll_update(ra, set(a))
    _hll_update(rb, set(b))
    _hll_update(ru, set(a) | set(b))
    assert (np.maximum(ra, rb) == ru).all()


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=80),
       st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                max_size=80))
def test_cms_add_merge_and_overestimate(a, b):
    """Count-Min tables ADD-merge (table(A ⊎ B) == table(A) + table(B),
    the layout-independence cms_point_counts relies on) and every point
    estimate upper-bounds the true count."""
    from collections import Counter

    from librecrawl_ray.functions.sketch import CMS_D, CMS_W, _cms_cells

    def table(xs):
        t = np.zeros((CMS_D, CMS_W), np.int64)
        for tok, n in Counter(xs).items():
            for i, cell in enumerate(_cms_cells(tok)):
                t[i, cell] += n
        return t

    ta, tb, tu = table(a), table(b), table(a + b)
    assert (ta + tb == tu).all()
    truth = Counter(a + b)
    for tok in set(a + b) | {"zz_absent"}:
        est = min(tu[i, c] for i, c in enumerate(_cms_cells(tok)))
        assert est >= truth.get(tok, 0)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=400),
       st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                max_size=12))
def test_kll_conserves_weight_and_certifies_error(vals, cuts):
    """KLL sketch invariants under arbitrary block splits and merges:
    total represented weight == n == stream length, and every quantile
    answer's true rank window lies within the sketch's own certified
    max_rank_err of the target rank."""
    import bisect
    import math

    from librecrawl_ray.functions.sketch import KLLSketch

    merged = KLLSketch(k=16)
    i = 0
    ci = 0
    while i < len(vals):
        j = min(i + cuts[ci % len(cuts)], len(vals))
        part = KLLSketch(k=16)
        part.add_many(vals[i:j])
        merged.merge(part)
        i = j
        ci += 1
    tot_w = sum(len(lv) << lvl for lvl, lv in enumerate(merged.levels))
    assert tot_w == merged.n == len(vals)
    sv = sorted(vals)
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        est = merged.quantile(q)
        target = max(math.ceil(q * len(vals)), 1)
        lo = bisect.bisect_left(sv, est)
        hi = bisect.bisect_right(sv, est)
        assert lo - merged.max_rank_err <= target <= \
            hi + merged.max_rank_err, (q, est)
