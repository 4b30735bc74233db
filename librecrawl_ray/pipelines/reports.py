"""Post-crawl link-graph and site-wide report pipelines (SURVEY.md §2.5/§2.6).

Each reference batch pass over the materialized result list
(crawler.py:854-899, issue_detector.py:1186-1969) becomes a Ray Data
groupby / join / aggregate pipeline over the crawl's parquet output:

- J1 linked_from / A8 inlink-outlink counts — groupby(normalized target)
- J2 link target status            — hash join links ⋈ pages
- J3 links-to-redirects            — join + groupby(source)
- J4 broken-link sources           — join + groupby(target), first-5 sources
- J5 sitemap health                — left join sitemap URLs ⋈ pages
- J6 hreflang reciprocity          — explode → self-join on reversed pair
- I16† unsafe cross-origin         — groupby(external domain), deterministic
                                     first (min source seq) replaces the
                                     reference's arrival-order shared set
- I17† security headers            — groupby(host)
- D3 near-duplicate content        — blocked all-pairs, exact reference
                                     scoring (see stages/neardup.py)

All joins key on the comparison-normalized URL (M3), the reference's join
key for every link-graph pass. ``num_partitions`` for Dataset.join is small
at sandbox scale; at 10^10 pick ≈ cluster cores and salt skewed targets.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..canonical import norm_url
from ..schema import ISSUES_SCHEMA

JOIN_PARTITIONS = 8


# ------------------------------------------------------------------ loaders

def load_pages(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "pages"), columns=columns)


def load_links(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "links"), columns=columns)


def _add_norm(ds: rd.Dataset, src_col: str, dst_col: str) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        vals = [norm_url(u) for u in batch.column(src_col).to_pylist()]
        return batch.append_column(dst_col, pa.array(vals, pa.string()))
    return ds.map_batches(f, batch_format="pyarrow")


def hash_join(left: rd.Dataset, right: rd.Dataset, key: str,
              how: str = "inner", right_key: str | None = None) -> rd.Dataset:
    """Reduce-side hash join: tag side → union → groupby(key) → per-group
    merge. One shuffle, arbitrary schemas, no reliance on Dataset.join
    (which, in Ray 2.49.2, raises ArrowInvalid on some streamed upstream
    graphs — observed with parquet-read → map_batches → filter inputs).
    At scale this is exactly the partitioned hash join; salt ``key`` before
    calling for skewed keys."""
    import pandas as pd

    def _pa_type(t):
        """Ray Schema.types entries are pyarrow types for Arrow blocks but
        plain python types for pandas-derived blocks — coerce."""
        if isinstance(t, pa.DataType):
            return t
        return {int: pa.int64(), float: pa.float64(), str: pa.string(),
                bool: pa.bool_(), bytes: pa.binary(),
                list: pa.list_(pa.string())}.get(t, pa.string())

    rk = right_key or key
    lschema = left.schema()          # ray.data Schema wrapper
    rschema = right.schema()
    lcols = list(lschema.names)
    ltypes = {n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rschema.names, rschema.types)}
    rcols = [c for c in rschema.names if c != rk]
    rcols_out = [c if c not in lcols else c + "_r" for c in rcols]

    def tag_left(batch: pa.Table) -> pa.Table:
        t = batch
        for c, out_c in zip(rcols, rcols_out):
            t = t.append_column(out_c, pa.nulls(t.num_rows, rtypes[c]))
        return t.append_column("__side", pa.array(["L"] * t.num_rows))

    def tag_right(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(rk)})
        for c in lcols:
            if c == key:
                continue
            t = t.append_column(c, pa.nulls(batch.num_rows, ltypes[c]))
        for c, out_c in zip(rcols, rcols_out):
            t = t.append_column(out_c, batch.column(c))
        t = t.append_column("__side", pa.array(["R"] * batch.num_rows))
        return t.select(lcols + rcols_out + ["__side"])

    lt = left.map_batches(tag_left, batch_format="pyarrow") \
             .select_columns(lcols + rcols_out + ["__side"])
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    both = lt.union(rt)

    out_cols = lcols + rcols_out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "L"]
        r = df[df["__side"] == "R"]
        if l.empty:
            return pd.DataFrame(columns=out_cols)
        if r.empty:
            if how == "inner":
                return pd.DataFrame(columns=out_cols)
            return l[out_cols]
        lpart = l[lcols]
        rpart = r[[key] + rcols_out]
        m = lpart.merge(rpart, on=key,
                        how="inner" if how == "inner" else "left")
        return m[out_cols]

    return both.groupby(key).map_groups(merge, batch_format="pandas")


# ------------------------------------------------------- J1 / A8 link graph

def inlink_counts(links: rd.Dataset) -> rd.Dataset:
    """A8: inlinks per normalized target URL (groupby-count shuffle)."""
    return (_add_norm(links.select_columns(["target_url"]),
                      "target_url", "norm_target")
            .groupby("norm_target").count())


def outlink_counts(links: rd.Dataset) -> rd.Dataset:
    return (_add_norm(links.select_columns(["source_url"]),
                      "source_url", "norm_source")
            .groupby("norm_source").count())


def linked_from(pages: rd.Dataset, links: rd.Dataset,
                max_sources: int = 0) -> rd.Dataset:
    """J1: pages ⟕ collected source lists on normalized url. Mirrors the
    reference's post-crawl `_update_all_linked_from` (crawler.py:1411-1423)
    final-state semantics."""
    def collect(tbl: pa.Table) -> pa.Table:
        srcs = sorted(set(tbl.column("source_url").to_pylist()))
        if max_sources:
            srcs = srcs[:max_sources]
        # carried as a joined string through the (pandas-merging) join,
        # split back to list<string> afterwards — nested types don't
        # round-trip pandas object dtype reliably
        return pa.table({
            "norm_target": pa.array(
                [tbl.column("norm_target")[0].as_py()], pa.string()),
            "linked_from_s": pa.array(["\x1f".join(srcs)], pa.string()),
        })

    agg = (_add_norm(links.select_columns(["source_url", "target_url"]),
                     "target_url", "norm_target")
           .groupby("norm_target").map_groups(collect,
                                              batch_format="pyarrow"))
    keyed = _add_norm(pages, "url", "norm_url")
    joined = hash_join(keyed, agg, "norm_url", how="left_outer",
                       right_key="norm_target")

    def unsplit(batch: pa.Table) -> pa.Table:
        vals = [([] if s is None else s.split("\x1f"))
                for s in batch.column("linked_from_s").to_pylist()]
        return batch.drop_columns(["linked_from_s"]).append_column(
            "linked_from", pa.array(vals, pa.list_(pa.string())))
    return joined.map_batches(unsplit, batch_format="pyarrow")


# ------------------------------------------------------ J2 target status

def links_with_status(pages: rd.Dataset, links: rd.Dataset) -> rd.Dataset:
    """J2: fill links.target_status from pages on normalized URL (the
    reference re-joins at export, main.py:1546-1552)."""
    status = _add_norm(pages.select_columns(["url", "status_code"]),
                       "url", "norm_target") \
        .select_columns(["norm_target", "status_code"])
    keyed = _add_norm(links.drop_columns(["target_status"]),
                      "target_url", "norm_target")
    joined = hash_join(keyed, status, "norm_target", how="left_outer")

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "target_status", batch.column("status_code"))
        return batch.drop_columns(["status_code", "norm_target"])
    return joined.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------- J3 internal links to redirects

def links_to_redirects_issues(pages: rd.Dataset,
                              links: rd.Dataset) -> rd.Dataset:
    """J3 (issue_detector.py:1628-1718): internal links whose targets
    redirect; one issue per source page with the count."""
    import pandas as pd
    redirecting = _add_norm(
        pages.select_columns(["url", "redirect_count"]), "url", "norm_target"
    ).filter(lambda r: (r["redirect_count"] or 0) >= 1) \
     .select_columns(["norm_target"])
    internal = _add_norm(
        links.filter(lambda r: bool(r["is_internal"]))
             .select_columns(["source_url", "target_url"]),
        "target_url", "norm_target")
    hits = hash_join(internal, redirecting, "norm_target", how="inner")

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        targets = sorted(df["target_url"].unique().tolist())
        return pd.DataFrame({
            "url": [df["source_url"].iloc[0]],
            "type": ["info"], "category": ["Links"],
            "issue": ["Links: Internal Links to Redirects"],
            "details": [f"{len(targets)} internal link(s) point to "
                        f"redirecting URLs: {', '.join(targets[:5])}"],
        })
    return hits.groupby("source_url").map_groups(per_source,
                                                 batch_format="pandas")


# ------------------------------------------------- J4 broken link sources

def broken_link_issues(pages: rd.Dataset, links: rd.Dataset) -> rd.Dataset:
    """J4 (issue_detector.py:1720-1815): pages with status ≥400/0 that are
    link targets; one issue per broken target listing first-5 sources."""
    import pandas as pd
    broken = _add_norm(
        pages.select_columns(["url", "status_code"]), "url", "norm_target"
    ).filter(lambda r: r["status_code"] == 0 or r["status_code"] >= 400)
    keyed = _add_norm(links.select_columns(["source_url", "target_url"]),
                      "target_url", "norm_target")
    hits = hash_join(keyed,
                     broken.select_columns(["norm_target", "status_code"]),
                     "norm_target", how="inner")

    def per_target(df: pd.DataFrame) -> pd.DataFrame:
        sources = sorted(df["source_url"].unique().tolist())
        status = int(df["status_code"].iloc[0])
        return pd.DataFrame({
            "url": [df["target_url"].iloc[0]],
            "type": ["error"], "category": ["Links"],
            "issue": [f"Broken Link ({status if status else 'No Response'})"],
            "details": [f"Linked from {len(sources)} page(s): "
                        f"{', '.join(sources[:5])}"],
        })
    return hits.groupby("norm_target").map_groups(per_target,
                                                  batch_format="pandas")


# ----------------------------------------------------- J5 sitemap health

def sitemap_health(pages: rd.Dataset, sitemap_urls: list[str]) -> pa.Table:
    """J5 (issue_detector.py:1492-1626): bucket each sitemap URL as valid /
    broken / redirecting / noindexed / non-canonical / not-crawled."""
    wanted = {norm_url(u) for u in sitemap_urls}

    def pick(batch: pa.Table) -> pa.Table:
        mask = [norm_url(u) in wanted for u in batch.column("url").to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    cols = pages.select_columns(
        ["url", "status_code", "redirect_count", "robots", "x_robots_tag",
         "canonical_url"]).map_batches(pick, batch_format="pyarrow")
    by_norm = {}
    for b in cols.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            by_norm[norm_url(r["url"])] = r
    rows = []
    for su in sitemap_urls:
        r = by_norm.get(norm_url(su))
        if r is None:
            bucket, issue = "not_crawled", None
        elif r["status_code"] == 0 or r["status_code"] >= 400:
            bucket, issue = "broken", ("error", "Sitemap: Broken URL",
                                       f"Status {r['status_code']}")
        elif (r["redirect_count"] or 0) > 0:
            bucket, issue = "redirect", ("warning", "Sitemap: Redirecting URL",
                                         f"{r['redirect_count']} hop(s)")
        elif ("noindex" in (r["robots"] or "").lower()
              or "noindex" in (r["x_robots_tag"] or "").lower()):
            bucket, issue = "noindexed", ("warning", "Sitemap: Noindexed URL",
                                          "Sitemap lists a noindexed page")
        elif (r["canonical_url"]
              and norm_url(r["canonical_url"]) != norm_url(r["url"])):
            bucket, issue = "non_canonical", ("info",
                                              "Sitemap: Non-Canonical URL",
                                              f"Canonical: "
                                              f"{r['canonical_url']}")
        else:
            bucket, issue = "valid", None
        rows.append({"sitemap_url": su, "bucket": bucket,
                     "type": issue[0] if issue else "",
                     "issue": issue[1] if issue else "",
                     "details": issue[2] if issue else ""})
    return pa.Table.from_pylist(rows)


# -------------------------------------------------- J6 hreflang reciprocity

_ISO639 = re.compile(r"^[a-z]{2,3}(-[A-Za-z]{2,4})?$")
_KNOWN_LANGS = {
    "en", "fr", "de", "es", "it", "pt", "nl", "ru", "ja", "zh", "ko", "ar",
    "hi", "pl", "sv", "no", "da", "fi", "tr", "cs", "el", "he", "th", "vi",
    "uk", "ro", "hu", "id", "ms", "x-default",
}


def hreflang_issues(pages: rd.Dataset) -> rd.Dataset:
    """J6 (issue_detector.py:1817-1969): explode hreflang annotations to an
    edge set, validate codes, check self-reference, reciprocity (self-join
    on the reversed pair) and target status."""
    def explode(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hl = batch.column("hreflang").to_pylist()
        src, lang, tgt = [], [], []
        for u, entries in zip(urls, hl):
            for e in entries or []:
                src.append(u)
                lang.append(e["lang"])
                tgt.append(e["url"])
        return pa.table({
            "source": pa.array(src, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "target": pa.array(tgt, pa.string()),
            "norm_source": pa.array([norm_url(s) for s in src], pa.string()),
            "norm_target": pa.array([norm_url(t) for t in tgt], pa.string()),
        })

    ann = pages.select_columns(["url", "hreflang"]) \
               .filter(lambda r: bool(r["hreflang"])) \
               .map_batches(explode, batch_format="pyarrow")
    edges = ann.materialize()

    # reciprocity: A→B requires B→A (any lang); join edges ⋈ edges reversed
    rev = edges.select_columns(["norm_source", "norm_target"])

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        seen, s_out, t_out = set(), [], []
        for s, t in zip(batch.column("norm_source").to_pylist(),
                        batch.column("norm_target").to_pylist()):
            if (s, t) not in seen:
                seen.add((s, t))
                s_out.append(s)
                t_out.append(t)
        return pa.table({"r_source": pa.array(s_out, pa.string()),
                         "r_target": pa.array(t_out, pa.string())})
    # composite key for the reversed-pair join (hash_join is single-key)
    def pairkey(batch: pa.Table) -> pa.Table:
        keys = [f"{t} {s}" for s, t in
                zip(batch.column("norm_source").to_pylist(),
                    batch.column("norm_target").to_pylist())]
        return batch.append_column("pair_key", pa.array(keys, pa.string()))

    def revkey(batch: pa.Table) -> pa.Table:
        keys = [f"{s} {t}" for s, t in
                zip(batch.column("r_source").to_pylist(),
                    batch.column("r_target").to_pylist())]
        return pa.table({"pair_key": pa.array(keys, pa.string()),
                         "r_source": batch.column("r_source")})

    rev_pairs = rev.map_batches(dedup_pairs, batch_format="pyarrow") \
                   .map_batches(revkey, batch_format="pyarrow")
    keyed_edges = edges.map_batches(pairkey, batch_format="pyarrow")
    joined = hash_join(keyed_edges, rev_pairs, "pair_key", how="left_outer")

    status = _add_norm(pages.select_columns(["url", "status_code"]),
                       "url", "n2").select_columns(["n2", "status_code"])
    joined = hash_join(joined, status, "norm_target", how="left_outer",
                       right_key="n2")

    def to_issues(batch: pa.Table) -> pa.Table:
        rows = []
        data = batch.to_pylist()
        for r in data:
            src, lang, tgt = r["source"], r["lang"], r["target"]
            if not _ISO639.match(lang or "") and lang != "x-default":
                rows.append({"url": src, "type": "error",
                             "category": "International",
                             "issue": "Hreflang: Invalid Language Code",
                             "details": f'Code "{lang}" for {tgt}'})
            elif (lang or "").split("-")[0] not in _KNOWN_LANGS \
                    and lang != "x-default":
                rows.append({"url": src, "type": "warning",
                             "category": "International",
                             "issue": "Hreflang: Unknown Language Code",
                             "details": f'Code "{lang}" for {tgt}'})
            if r["norm_source"] != r["norm_target"] \
                    and r.get("r_source") is None:
                rows.append({"url": src, "type": "warning",
                             "category": "International",
                             "issue": "Hreflang: Missing Reciprocal Link",
                             "details": f"{tgt} does not link back"})
            st = r.get("status_code")
            if st is not None and st == st and int(st) != 200:
                rows.append({"url": src, "type": "error",
                             "category": "International",
                             "issue": "Hreflang: Points to Non-200 Page",
                             "details": f"{tgt} returned {int(st)}"})
        if not rows:
            return ISSUES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=ISSUES_SCHEMA)

    annotated = joined.map_batches(to_issues, batch_format="pyarrow")

    # missing self-reference: per source page, no hreflang entry pointing
    # at itself (computed per-source with a groupby)
    import pandas as pd

    def self_ref(df: pd.DataFrame) -> pd.DataFrame:
        has = (df["norm_source"] == df["norm_target"]).any()
        if has:
            return pd.DataFrame(columns=["url", "type", "category", "issue",
                                         "details"])
        return pd.DataFrame({
            "url": [df["source"].iloc[0]], "type": ["warning"],
            "category": ["International"],
            "issue": ["Hreflang: Missing Self-Reference"],
            "details": ["Page's hreflang set does not include itself"],
        })
    selfs = edges.groupby("norm_source").map_groups(self_ref,
                                                    batch_format="pandas")
    return annotated.union(selfs)


# --------------------------------- I16† / I17† site-wide dedup issue passes

def unsafe_cross_origin_issues(links: rd.Dataset) -> rd.Dataset:
    """I16† (issue_detector.py:1174-1184): external target=_blank without
    noopener — reported once per external domain. Deterministic first:
    min source_url (replaces the reference's arrival-order shared set)."""
    import pandas as pd
    bad = links.filter(
        lambda r: bool(r["blank"]) and not bool(r["noopener"])
        and not bool(r["is_internal"]))

    def per_domain(df: pd.DataFrame) -> pd.DataFrame:
        dom = df["target_domain"].iloc[0]
        src = df["source_url"].min()
        return pd.DataFrame({
            "url": [src], "type": ["info"], "category": ["Security"],
            "issue": ["Security: Unsafe Cross-Origin Links"],
            "details": [f'External domain {dom} opens in new tab without '
                        f'rel="noopener" (Best practice recommendation)'],
        })
    return bad.groupby("target_domain").map_groups(per_domain,
                                                   batch_format="pandas")


_SECURITY_HEADERS = (
    ("Content-Security-Policy", "Security: Missing Content-Security-Policy",
     "warning"),
    ("Strict-Transport-Security", "Security: Missing HSTS Header", "warning"),
    ("X-Frame-Options", "Security: Missing X-Frame-Options", "info"),
)


def security_header_issues(pages: rd.Dataset) -> rd.Dataset:
    """I17† (issue_detector.py:1186-1247): missing CSP / HSTS (https only) /
    X-Frame-Options — once per domain, anchored to the page with min seq."""
    import pandas as pd

    def add_host(batch: pa.Table) -> pa.Table:
        hosts = [u.split("/")[2].lower() if "://" in u else ""
                 for u in batch.column("url").to_pylist()]
        return batch.append_column("host", pa.array(hosts, pa.string()))

    keyed = pages.select_columns(
        ["url", "seq", "status_code", "response_headers"]) \
        .filter(lambda r: r["status_code"] == 200) \
        .map_batches(add_host, batch_format="pyarrow")

    def per_host(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seq")
        first = df.iloc[0]
        raw = first["response_headers"]
        hdr_list = [] if raw is None else list(raw)
        headers = {k.lower() for k, _ in hdr_list}
        rows = []
        for hdr, issue, sev in _SECURITY_HEADERS:
            if hdr == "Strict-Transport-Security" \
                    and not first["url"].startswith("https://"):
                continue
            if hdr.lower() not in headers:
                rows.append({"url": first["url"], "type": sev,
                             "category": "Security", "issue": issue,
                             "details": f"Domain {df['host'].iloc[0]} serves "
                                        f"pages without {hdr}"})
        return pd.DataFrame(rows, columns=["url", "type", "category",
                                           "issue", "details"])
    return keyed.groupby("host").map_groups(per_host, batch_format="pandas")
