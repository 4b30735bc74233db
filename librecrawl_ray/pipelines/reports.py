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
import ray
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


def _bucket_of(vals: list, buckets: int) -> pa.Array:
    import zlib
    if vals and isinstance(vals[0], int):
        return pa.array([v % buckets for v in vals], pa.int32())
    return pa.array([zlib.crc32(v.encode()) % buckets for v in vals],
                    pa.int32())


BROADCAST_JOIN_ROWS = 2_000_000


@ray.remote
def _split_block_by_bucket(block, key: str, buckets: int) -> list:
    """Map side of the task-based hash shuffle: split one dataset block by
    crc32(key) % buckets; each nonempty bucket slice is ray.put separately
    so a merge task fetches only its bucket. Only the block's own columns
    ship — no padding to the joined width."""
    import zlib

    import numpy as np
    import pandas as pd
    tbl = (pa.Table.from_pandas(block, preserve_index=False)
           if isinstance(block, pd.DataFrame) else block)
    if tbl.num_rows == 0:
        return [None] * buckets
    keys = tbl.column(key).to_pylist()
    bk = np.fromiter((zlib.crc32(k.encode()) % buckets for k in keys),
                     dtype=np.int64, count=len(keys))
    order = np.argsort(bk, kind="stable")
    srt = tbl.take(pa.array(order))
    sbk = bk[order]
    out: list = [None] * buckets
    bounds = np.flatnonzero(np.diff(sbk)) + 1
    starts = np.concatenate(([0], bounds)).tolist()
    ends = np.concatenate((bounds, [len(sbk)])).tolist()
    for s0, e0 in zip(starts, ends):
        out[int(sbk[s0])] = ray.put(srt.slice(s0, e0 - s0))
    return out


@ray.remote
def _merge_bucket(lrefs: list, rrefs: list, key: str, rk: str, how: str,
                  lcols: list, rcols: list, rcols_out: list,
                  rschema: pa.Schema) -> pa.Table:
    """Reduce side of one bucket. When the bucket's right keys are unique
    (the common case: aggregated / keyed-by-url right sides), the attach
    is a zero-copy Arrow gather — key → row-index dict, ``Table.take``
    with null indices — so wide/nested left columns (spans, headers,
    linked_from targets) never convert to pandas object dtype
    (VERDICT r2 #5/#6). Empty-right buckets append typed nulls from the
    right schema (keeps block schemas identical across buckets, unlike a
    pandas ``reindex`` which would yield float64/object columns).
    Duplicate right keys fall back to one pandas merge."""
    import pandas as pd
    lt = pa.concat_tables([ray.get(r) for r in lrefs],
                          promote_options="default").select(lcols)
    if not rrefs:
        if how == "inner":
            return None
        for name, out_name in zip(rcols, rcols_out):
            lt = lt.append_column(
                out_name, pa.nulls(lt.num_rows, rschema.field(name).type))
        return lt
    rt = pa.concat_tables([ray.get(r) for r in rrefs],
                          promote_options="default")
    rkc = rt.column(rk).combine_chunks()
    if rkc.null_count == 0 and \
            pc.count_distinct(rkc).as_py() == rt.num_rows:
        # vectorized key→row-index lookup (pc.index_in hashes the right
        # keys once per bucket in C++; the old per-row dict .get loop cost
        # ~1 µs/row) — null indices where the left key is absent
        lkeys = lt.column(key)
        if lkeys.type != rkc.type:
            lkeys = lkeys.cast(rkc.type)
        idxs = pc.index_in(lkeys, value_set=rkc)
        if how == "inner":
            mask = pc.is_valid(idxs)
            lt = lt.filter(mask)
            idxs = pc.filter(idxs, mask)
        payload = rt.select(rcols)
        gathered = payload.take(idxs)
        for name, out_name in zip(rcols, rcols_out):
            lt = lt.append_column(out_name, gathered.column(name))
        return lt
    ldf = lt.to_pandas()
    rdf = rt.to_pandas()[[rk] + rcols]
    rdf.columns = [key] + rcols_out
    out = ldf.merge(rdf, on=key, how="inner" if how == "inner" else "left")
    return pa.Table.from_pandas(out[lcols + rcols_out],
                                preserve_index=False)


def hash_join(left: rd.Dataset, right: rd.Dataset, key: str,
              how: str = "inner", right_key: str | None = None,
              buckets: int = 32,
              broadcast_threshold: int = BROADCAST_JOIN_ROWS) -> rd.Dataset:
    """Adaptive hash join.

    Map-side broadcast when the right side fits under
    ``broadcast_threshold`` rows (ray.put once, no shuffle): when the
    right keys are UNIQUE the merge is a zero-copy Arrow gather (key →
    row-index dict, ``Table.take`` with null indices) so wide/nested left
    columns (spans, headers) never convert to pandas object dtype
    (VERDICT r2 #5); duplicate right keys fall back to a pandas merge per
    left batch. Else reduce-side bucketed: tag side → union →
    groupby(bucket of key) → ONE pandas merge per bucket. No reliance on
    Dataset.join (which, in Ray 2.49.2, raises ArrowInvalid on some
    streamed upstream graphs — observed with parquet-read → map_batches →
    filter inputs). Bucketing keeps the per-group work vectorized; at
    10^10 scale raise ``buckets`` ≈ cluster cores and salt hot keys."""
    import pandas as pd

    rk0 = right_key or key
    if broadcast_threshold > 0:
        rtab = None
        try:
            blocks = ray.get(right.to_arrow_refs())
            cand = pa.concat_tables(blocks, promote_options="default") \
                if blocks else None
            if cand is not None and cand.num_rows <= broadcast_threshold:
                rtab = cand.combine_chunks()
        except ValueError:
            rtab = None
        if rtab is not None:
            lschema = left.schema()
            lcols0 = list(lschema.names)
            rcols0 = [c for c in rtab.column_names if c != rk0]
            rcols0_out = [c if c not in lcols0 else c + "_r"
                          for c in rcols0]
            rkeys = rtab.column(rk0).combine_chunks()
            if rkeys.null_count == 0 and \
                    pc.count_distinct(rkeys).as_py() == rtab.num_rows:
                # unique right keys → Arrow gather, left stays zero-copy.
                # Keys ship as an Arrow array (zero-copy from plasma; the
                # old {key: idx} dict deserialized per worker) and the
                # lookup is pc.index_in — C++ hash join per batch, null
                # index where the left key is absent.
                payload = rtab.select(rcols0).rename_columns(rcols0_out)
                r_ref = ray.put((rkeys, payload))

                def bgather(batch: pa.Table) -> pa.Table:
                    rk_arr, pay = ray.get(r_ref)
                    lkeys = batch.column(key)
                    if lkeys.type != rk_arr.type:
                        lkeys = lkeys.cast(rk_arr.type)
                    idxs = pc.index_in(lkeys, value_set=rk_arr)
                    if how == "inner":
                        mask = pc.is_valid(idxs)
                        batch = batch.filter(mask)
                        idxs = pc.filter(idxs, mask)
                    g = pay.take(idxs)
                    for name in rcols0_out:
                        batch = batch.append_column(name, g.column(name))
                    return batch
                return left.map_batches(bgather, batch_format="pyarrow")

            rdf = rtab.to_pandas()
            rdf = rdf.rename(columns=dict(zip(rcols0, rcols0_out)))
            rdf = rdf.rename(columns={rk0: key})
            r_ref = ray.put(rdf)

            def bmerge(df: pd.DataFrame) -> pd.DataFrame:
                rsmall = ray.get(r_ref)
                m = df.merge(rsmall, on=key,
                             how="inner" if how == "inner" else "left")
                return m[lcols0 + rcols0_out]
            return left.map_batches(bmerge, batch_format="pandas")

    # reduce-side: task-based hash shuffle. Each side's blocks split into
    # per-bucket plasma slices carrying ONLY that side's own columns (the
    # old shape unioned both sides padded to the full joined width, so
    # every shuffled row shipped null buffers for the other side's
    # columns — VERDICT r2 #7/#10); one pandas merge task per bucket.
    rk = right_key or key
    lschema = left.schema()
    lcols = list(lschema.names)
    rschema = right.schema().base_schema
    rcols = [c for c in rschema.names if c != rk]
    rcols_out = [c if c not in lcols else c + "_r" for c in rcols]
    out_cols = lcols + rcols_out

    def _block_refs(ds: rd.Dataset) -> list:
        return [br for bundle in ds.iter_internal_ref_bundles()
                for br in bundle.block_refs]

    lsplits = [_split_block_by_bucket.remote(br, key, buckets)
               for br in _block_refs(left)]
    rsplits = [_split_block_by_bucket.remote(br, rk, buckets)
               for br in _block_refs(right)]
    lrefs = ray.get(lsplits)     # lists of per-bucket refs (metadata only)
    rrefs = ray.get(rsplits)
    out_refs = []
    for b in range(buckets):
        lb = [rr[b] for rr in lrefs if rr[b] is not None]
        rb = [rr[b] for rr in rrefs if rr[b] is not None]
        if not lb:
            continue
        if not rb and how == "inner":
            continue
        out_refs.append(_merge_bucket.remote(
            lb, rb, key, rk, how, lcols, rcols, rcols_out, rschema))
    if not out_refs:
        return rd.from_pandas(pd.DataFrame(columns=out_cols))
    return rd.from_arrow_refs(out_refs)


def bucketed_agg(ds: rd.Dataset, keys, spec: dict,
                 buckets: int = 32,
                 bucket_on: str | None = None) -> rd.Dataset:
    """Keyed aggregation for HIGH-CARDINALITY keys: int-bucket shuffle +
    one vectorized pandas groupby per bucket.

    Ray Data's sort-based ``groupby(key).aggregate(...)`` iterates groups
    in Python inside the reduce tasks (~1-2 ms per group): fine at 10^2-10^3
    keys, but at 10^4-10^5 keys the reduce dominates wall time (measured at
    sf0.01: a 60k-group Max pegged one core for minutes when the partials
    landed in one block; spread over many blocks it still cost 15-66 s per
    query). Hashing keys into ``buckets`` int groups keeps the all-to-all
    tiny and sorted on an int column, and ALL keys of a bucket reduce in a
    single vectorized pandas groupby. At cluster scale raise ``buckets`` to
    ~total cores; skew is bounded because partials, not raw rows, shuffle.

    ``spec`` maps output column -> (source column, "sum"|"max"|"min").
    Inputs are expected to be per-batch partial rows (every call site
    pre-aggregates inside map_batches), so the same fn composes partials.
    """
    import pandas as pd

    if isinstance(keys, str):
        keys = [keys]
    kb = bucket_on or keys[0]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df[kb]
        if pd.api.types.is_integer_dtype(k):
            b = k.to_numpy(dtype="int64", copy=False) % buckets
        else:
            b = pd.util.hash_pandas_object(k, index=False) \
                .to_numpy() % buckets
        df = df.copy()
        df["__bucket"] = b.astype("int32")
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__bucket").groupby(
            keys, as_index=False, sort=False).agg(
            **{out: (src, fn) for out, (src, fn) in spec.items()})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def bucketed_groups(ds: rd.Dataset, key_col: str, per_bucket,
                    buckets: int = 32) -> rd.Dataset:
    """groupby-aggregate with bucketed shuffle: rows are grouped by
    hash(key) % buckets and ``per_bucket(df)`` handles ALL keys of one
    bucket with vectorized pandas (a per-key map_groups costs one pandas
    invocation per key — at 10^5+ keys that dominates wall time)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _bucket_of(batch.column(key_col).to_pylist(),
                                   buckets))
    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: per_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas"))


# ------------------------------------------------------- J1 / A8 link graph

def bucketed_url_counts(ds: rd.Dataset, url_col: str, out_col: str,
                        count_col: str = "count()",
                        buckets: int = 64) -> rd.Dataset:
    """Count rows per normalized URL: per-batch Counter partials (shuffle
    rows = distinct keys per block, not raw rows), then a bucketed-int
    shuffle + one vectorized pandas sum per bucket. Ray Data's string-key
    sort-aggregate is ~5× slower than this int-bucket shape at 10^6 keys
    (measured on bench2 links; VERDICT r1 #6)."""
    import zlib
    from collections import Counter
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(norm_url(u) for u in batch.column(url_col).to_pylist())
        keys = list(c.keys())
        return pa.table({
            out_col: pa.array(keys, pa.string()),
            count_col: pa.array(list(c.values()), pa.int64()),
            "__bucket": pa.array(
                [zlib.crc32(k.encode()) % buckets for k in keys],
                pa.int32())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(out_col, sort=False)[count_col]
                .sum().reset_index())

    return (ds.select_columns([url_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: per_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas"))


def inlink_counts(links: rd.Dataset) -> rd.Dataset:
    """A8: inlinks per normalized target URL. Projects to the one column
    the count reads before anything executes — with a parquet-backed
    dataset the select pushes into the read, so the other 11 edge columns
    never leave storage."""
    return bucketed_url_counts(links.select_columns(["target_url"]),
                               "target_url", "norm_target")


def outlink_counts(links: rd.Dataset) -> rd.Dataset:
    return bucketed_url_counts(links.select_columns(["source_url"]),
                               "source_url", "norm_source")


def linked_from(pages: rd.Dataset, links: rd.Dataset,
                max_sources: int = 0) -> rd.Dataset:
    """J1: pages ⟕ collected source lists on normalized url. Mirrors the
    reference's post-crawl `_update_all_linked_from` (crawler.py:1411-1423)
    final-state semantics."""
    import pandas as pd

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        # linked_from carried as a joined string through the
        # (pandas-merging) join, split back to list<string> afterwards —
        # nested types don't round-trip pandas object dtype reliably
        def agg_sources(s):
            srcs = sorted(set(s))
            if max_sources:
                srcs = srcs[:max_sources]
            return "\x1f".join(srcs)
        out = df.groupby("norm_target")["source_url"].agg(agg_sources)
        return out.rename("linked_from_s").reset_index()

    agg = bucketed_groups(
        _add_norm(links.select_columns(["source_url", "target_url"]),
                  "target_url", "norm_target"),
        "norm_target", collect)
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
    ).filter(expr="redirect_count >= 1") \
     .select_columns(["norm_target"])
    internal = _add_norm(
        links.filter(expr="is_internal == True")
             .select_columns(["source_url", "target_url"]),
        "target_url", "norm_target")
    hits = hash_join(internal, redirecting, "norm_target", how="inner")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        def fmt(s):
            targets = sorted(set(s))
            return (f"{len(targets)} internal link(s) point to "
                    f"redirecting URLs: {', '.join(targets[:5])}")
        agg = df.groupby("source_url")["target_url"].agg(fmt)
        out = agg.rename("details").reset_index() \
                 .rename(columns={"source_url": "url"})
        out["type"] = "info"
        out["category"] = "Links"
        out["issue"] = "Links: Internal Links to Redirects"
        return out[["url", "type", "category", "issue", "details"]]
    return bucketed_groups(hits, "source_url", per_bucket)


# ------------------------------------------------- J4 broken link sources

def broken_link_issues(pages: rd.Dataset, links: rd.Dataset) -> rd.Dataset:
    """J4 (issue_detector.py:1720-1815): pages with status ≥400/0 that are
    link targets; one issue per broken target listing first-5 sources."""
    import pandas as pd
    broken = _add_norm(
        pages.select_columns(["url", "status_code"]), "url", "norm_target"
    ).filter(expr="status_code == 0 or status_code >= 400")
    keyed = _add_norm(links.select_columns(["source_url", "target_url"]),
                      "target_url", "norm_target")
    hits = hash_join(keyed,
                     broken.select_columns(["norm_target", "status_code"]),
                     "norm_target", how="inner")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tgt, g in df.groupby("norm_target"):
            sources = sorted(set(g["source_url"]))
            status = int(g["status_code"].min())
            rows.append({
                # min(), not iloc[0]: the raw-URL representative must not
                # depend on batch arrival order when several raw forms
                # normalize to the same target
                "url": g["target_url"].min(),
                "type": "error", "category": "Links",
                "issue": f"Broken Link "
                         f"({status if status else 'No Response'})",
                "details": f"Linked from {len(sources)} page(s): "
                           f"{', '.join(sources[:5])}",
            })
        return pd.DataFrame(rows, columns=["url", "type", "category",
                                           "issue", "details"])
    return bucketed_groups(hits, "norm_target", per_bucket)


# ----------------------------------------------------- J5 sitemap health

def sitemap_health(pages: rd.Dataset,
                   sitemap_urls: rd.Dataset | list[str]) -> pa.Table:
    """J5 (issue_detector.py:1492-1626): bucket each sitemap URL as valid /
    broken / redirecting / noindexed / non-canonical / not-crawled.

    The SURVEY §2.5 join shape: sitemap-ds ⟕ pages on the normalized URL
    (hash_join broadcasts the projected pages side at sandbox scale,
    reduce-side bucketed above threshold) followed by a conditional
    projection per row — no driver dict, no per-URL driver loop, so 50k-URL
    sitemap files across thousands of sitemaps stream (VERDICT r2 #3).
    ``sitemap_urls`` may be a Dataset with a ``sitemap_url`` column or a
    plain list."""
    if isinstance(sitemap_urls, list):
        sm = rd.from_arrow(pa.table(
            {"sitemap_url": pa.array(sitemap_urls, pa.string())}))
    else:
        sm = sitemap_urls
    sm = _add_norm(sm, "sitemap_url", "__n")
    crawled = _add_norm(
        pages.select_columns(
            ["url", "status_code", "redirect_count", "robots",
             "x_robots_tag", "canonical_url"]),
        "url", "__n")
    joined = hash_join(sm, crawled, "__n", how="left_outer")

    def classify(batch: pa.Table) -> pa.Table:
        out_b, out_t, out_i, out_d = [], [], [], []
        for r in batch.to_pylist():
            st = r.get("status_code")
            not_crawled = st is None or (isinstance(st, float) and st != st)
            if not_crawled:
                bucket, issue = "not_crawled", None
            elif int(st) == 0 or int(st) >= 400:
                bucket, issue = "broken", ("error", "Sitemap: Broken URL",
                                           f"Status {int(st)}")
            elif (r["redirect_count"] or 0) > 0:
                bucket, issue = "redirect", ("warning",
                                             "Sitemap: Redirecting URL",
                                             f"{int(r['redirect_count'])} "
                                             f"hop(s)")
            elif ("noindex" in (r["robots"] or "").lower()
                  or "noindex" in (r["x_robots_tag"] or "").lower()):
                bucket, issue = "noindexed", ("warning",
                                             "Sitemap: Noindexed URL",
                                             "Sitemap lists a noindexed "
                                             "page")
            elif (r["canonical_url"]
                  and norm_url(r["canonical_url"]) != norm_url(r["url"])):
                bucket, issue = "non_canonical", (
                    "info", "Sitemap: Non-Canonical URL",
                    f"Canonical: {r['canonical_url']}")
            else:
                bucket, issue = "valid", None
            out_b.append(bucket)
            out_t.append(issue[0] if issue else "")
            out_i.append(issue[1] if issue else "")
            out_d.append(issue[2] if issue else "")
        return pa.table({
            "sitemap_url": batch.column("sitemap_url"),
            "bucket": pa.array(out_b, pa.string()),
            "type": pa.array(out_t, pa.string()),
            "issue": pa.array(out_i, pa.string()),
            "details": pa.array(out_d, pa.string())})

    out = joined.map_batches(classify, batch_format="pyarrow").to_pandas()
    out = out.sort_values("sitemap_url").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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

    def nonempty(batch: pa.Table) -> pa.Table:
        # batch-mask filter: keep rows with ≥1 hreflang entry (list-typed
        # column — not expressible as a scan expr)
        n = pc.fill_null(pc.list_value_length(batch.column("hreflang")), 0)
        return batch.filter(pc.greater(n, 0))

    ann = pages.select_columns(["url", "hreflang"]) \
               .map_batches(nonempty, batch_format="pyarrow") \
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
    # per-batch dedup above is only a PARTIAL: reverse pairs that repeat
    # across batches would leave duplicate pair_keys and fan out the
    # left join into duplicated issue rows — finish with a global
    # bucketed distinct (presence is all the reciprocity join needs)
    rev_pairs = bucketed_groups(
        rev_pairs, "pair_key",
        lambda df: df.drop_duplicates("pair_key"), buckets=8)
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
        rows = []
        for src, g in df.groupby("norm_source"):
            if not (g["norm_source"] == g["norm_target"]).any():
                # min(), not iloc[0]: the raw-URL representative must not
                # depend on batch arrival order when several raw forms
                # normalize to the same source
                rows.append({
                    "url": g["source"].min(), "type": "warning",
                    "category": "International",
                    "issue": "Hreflang: Missing Self-Reference",
                    "details": "Page's hreflang set does not include "
                               "itself"})
        return pd.DataFrame(rows, columns=["url", "type", "category",
                                           "issue", "details"])
    selfs = bucketed_groups(edges, "norm_source", self_ref, buckets=8)
    return annotated.union(selfs)


# --------------------------------- I16† / I17† site-wide dedup issue passes

def unsafe_cross_origin_issues(links: rd.Dataset) -> rd.Dataset:
    """I16† (issue_detector.py:1174-1184): external target=_blank without
    noopener — reported once per external domain. Deterministic first:
    min source_url (replaces the reference's arrival-order shared set)."""
    import pandas as pd
    bad = links.filter(
        expr="blank == True and noopener == False and is_internal == False")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("target_domain")["source_url"].min()
        out = agg.rename("url").reset_index()
        out["type"] = "info"
        out["category"] = "Security"
        out["issue"] = "Security: Unsafe Cross-Origin Links"
        out["details"] = out["target_domain"].map(
            lambda dom: f'External domain {dom} opens in new tab without '
                        f'rel="noopener" (Best practice recommendation)')
        return out[["url", "type", "category", "issue", "details"]]
    return bucketed_groups(bad, "target_domain", per_bucket, buckets=16)


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
        .filter(expr="status_code == 200") \
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

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [per_host(g) for _, g in df.groupby("host", sort=True)]
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame(columns=["url", "type", "category",
                                           "issue", "details"]))
    # bucketed: one task per hash bucket of hosts, not one group per host —
    # per-key map_groups collapses at web-scale host cardinality
    return bucketed_groups(keyed, "host", per_bucket, buckets=16)


# ------------------------------------------------------ PageRank-lite (A8+)

def pagerank_lite(pages: rd.Dataset, links: rd.Dataset,
                  iterations: int = 5, damping: float = 0.85,
                  distributed_threshold: int = 2_000_000) -> rd.Dataset:
    """PageRank-lite over the crawled internal link graph (north-star
    priority score).

    The edge list is built with Ray Data (normalize + dedup + crawled-node
    semi-join via a broadcast node set); the power iteration itself runs
    vectorized on the driver — the rank vector is one float per crawled
    page and the deduped edge list is graph-sized, both driver-resident at
    sandbox scale. At 10^10, swap the iteration body for the same two ops
    expressed as hash_join (edges ⋈ ranks) + bucketed groupby(dst).sum —
    the helpers above — with ranks kept as a Dataset; the update formula is
    identical.

    The crawl's fetch order itself stays (depth, seq) — BFS-equivalent per
    the conformance contract; the PageRank score is the reported
    re-crawl/priority column (SURVEY.md §2.8: priority = (depth, seq) with
    PageRank as an equal-priority tiebreaker, which preserves reference
    ordering). Returns (url, rank) for every crawled page.
    """
    import pandas as pd

    if distributed_threshold and pages.count() > distributed_threshold:
        # scale path: no graph-sized driver state
        return pagerank_distributed(pages, links, iterations, damping)

    nodes = _add_norm(pages.select_columns(["url"]), "url", "n") \
        .select_columns(["url", "n"])
    node_tbl = nodes.to_pandas()          # driver-resident rank vector:
    # one float per crawled page — at 10^10 keep ranks as a Dataset and
    # use the reduce-side join path exclusively (same code, higher
    # broadcast_threshold disabled)
    node_set = set(node_tbl["n"])
    n_nodes = max(len(node_set), 1)

    edges = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"])

    def dedup_and_filter(batch: pa.Table) -> pa.Table:
        seen = set()
        s_out, d_out = [], []
        for s, d in zip(batch.column("src").to_pylist(),
                        batch.column("dst").to_pylist()):
            if d in node_set and s in node_set and (s, d) not in seen:
                seen.add((s, d))
                s_out.append(s)
                d_out.append(d)
        return pa.table({"src": pa.array(s_out, pa.string()),
                         "dst": pa.array(d_out, pa.string())})

    edge_df = edges.map_batches(dedup_and_filter,
                                batch_format="pyarrow").to_pandas() \
        .drop_duplicates(["src", "dst"])
    outdeg = edge_df.groupby("src").size()

    ranks = pd.Series(1.0 / n_nodes, index=sorted(node_set))
    for _ in range(iterations):
        contrib_per_edge = edge_df["src"].map(ranks / outdeg)
        sums = pd.Series(contrib_per_edge.values,
                         index=edge_df["dst"]).groupby(level=0).sum()
        dangling = ranks[~ranks.index.isin(outdeg.index)].sum()
        ranks = pd.Series((1.0 - damping) / n_nodes
                          + damping * dangling / n_nodes,
                          index=ranks.index).add(damping * sums,
                                                 fill_value=0.0)
        extra = ranks.index.difference(pd.Index(sorted(node_set)))
        if len(extra):
            ranks = ranks.drop(extra)

    out = node_tbl.copy()
    out["rank"] = out["n"].map(ranks).fillna((1.0 - damping) / n_nodes)
    out["rank"] = out["rank"].round(10)
    return rd.from_pandas(out[["url", "rank"]])


def pagerank_distributed(pages: rd.Dataset, links: rd.Dataset,
                         iterations: int = 5,
                         damping: float = 0.85) -> rd.Dataset:
    """The scale path for ``pagerank_lite``: edge list and rank vector stay
    Datasets end-to-end — no graph-sized driver state (VERDICT r1 #6).

    Same update formula as the pandas path; each iteration is
    hash_join(edges ⋈ ranks ⋈ outdeg) → per-batch partial sums →
    groupby(dst).Sum, plus a scalar dangling-mass aggregate. Ranks
    (node-sized) are materialized per iteration; edges are materialized
    once after dedup+semi-join and reused by every iteration.
    """
    from ray.data.aggregate import Sum

    nodes = _add_norm(pages.select_columns(["url"]), "url", "n") \
        .select_columns(["url", "n"]).materialize()
    n_nodes = max(nodes.count(), 1)

    raw = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"])

    def bucket_dedup(df):
        return df.drop_duplicates(["src", "dst"])

    node_keys = bucketed_groups(
        nodes.select_columns(["n"]),
        "n", lambda df: df.drop_duplicates(["n"]), buckets=16).materialize()
    edges = bucketed_groups(raw, "src", bucket_dedup, buckets=32)
    # semi-join both endpoints against the crawled node set
    edges = hash_join(edges, node_keys, key="src", right_key="n")
    edges = hash_join(edges, node_keys, key="dst", right_key="n") \
        .materialize()

    def partial_src_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter(batch.column("src").to_pylist())
        return pa.table({"src": pa.array(list(c.keys()), pa.string()),
                         "outdeg": pa.array(list(c.values()), pa.int64())})

    outdeg = bucketed_agg(
        edges.map_batches(partial_src_counts, batch_format="pyarrow"),
        "src", {"outdeg": ("outdeg", "sum")}).materialize()

    r0 = 1.0 / n_nodes
    ranks = node_keys.map_batches(
        lambda b: b.append_column("rank",
                                  pa.array([r0] * b.num_rows, pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        # dangling mass: rank of nodes with no outgoing edges
        with_deg = hash_join(ranks, outdeg, key="n", right_key="src",
                             how="left")
        import pandas as pd

        def dangling_partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"d": [df.loc[df["outdeg"].isna(), "rank"].sum()]})
        dang_parts = with_deg.map_batches(dangling_partial,
                                          batch_format="pandas").to_pandas()
        dangling = float(dang_parts["d"].sum())

        contrib = hash_join(
            hash_join(edges, ranks, key="src", right_key="n"),
            outdeg, key="src")

        def partial_sums(df: pd.DataFrame) -> pd.DataFrame:
            c = (df["rank"] / df["outdeg"]).groupby(df["dst"]).sum()
            return c.rename("s").reset_index()
        sums = bucketed_agg(
            contrib.map_batches(partial_sums, batch_format="pandas"),
            "dst", {"s": ("s", "sum")})

        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def update(df: pd.DataFrame) -> pd.DataFrame:
            df["rank"] = base + damping * df["s"].fillna(0.0)
            return df[["n", "rank"]]
        ranks = hash_join(node_keys, sums, key="n", right_key="dst",
                          how="left") \
            .map_batches(update, batch_format="pandas").materialize()

    out = hash_join(nodes, ranks, key="n", how="inner")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            "url": batch.column("url"),
            "rank": _pc.round(batch.column("rank"), ndigits=10)})
    return out.map_batches(finish, batch_format="pyarrow")


def hits_scores(pages: rd.Dataset, links: rd.Dataset,
                iterations: int = 5) -> "pd.DataFrame":
    """HITS hubs & authorities (Kleinberg 1999) over the crawled internal
    link graph — the companion link-analysis score to ``pagerank_lite``.
    The reference's link-graph surface is inlink/outlink counts +
    PageRank-style importance (crawler.py link_manager); HITS weights a
    page's inlinks by the hub quality of the pages casting them, the
    standard second axis for crawl prioritization / authority reports.

    Update rule, L1-normalized so the SQL twin can mirror it exactly
    (starting from hub_0 = 1/|V|):

        auth_k(v) = Σ_{(u,v)∈E} hub_{k-1}(u)   / Σ_v raw_auth_k
        hub_k(u)  = Σ_{(u,v)∈E} auth_k(v)      / Σ_u raw_hub_k

    Scores round to 10 dp (same numeric contract as the PageRank twin:
    both sides sum float64 in different orders, relative error ~1e-16,
    orders of magnitude below the rounding grid).

    Scale shape: the edge list is normalized + deduped + semi-joined to
    crawled nodes with Ray Data; the iteration itself is driver-resident
    — both score vectors are node-sized, never corpus-sized. At 10^10
    swap each half-update for hash_join(edges ⋈ scores, on the incoming
    endpoint) + bucketed groupby sum + one scalar aggregate — exactly the
    ``pagerank_distributed`` iteration body minus its outdeg division.
    Returns pandas (url, authority, hub) for every crawled page.
    """
    import pandas as pd

    nodes = _add_norm(pages.select_columns(["url"]), "url", "n") \
        .select_columns(["url", "n"])
    node_tbl = nodes.to_pandas()
    node_set = set(node_tbl["n"])
    n_nodes = max(len(node_set), 1)

    edges = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"])

    def dedup_and_filter(batch: pa.Table) -> pa.Table:
        seen = set()
        s_out, d_out = [], []
        for s, d in zip(batch.column("src").to_pylist(),
                        batch.column("dst").to_pylist()):
            if d in node_set and s in node_set and (s, d) not in seen:
                seen.add((s, d))
                s_out.append(s)
                d_out.append(d)
        return pa.table({"src": pa.array(s_out, pa.string()),
                         "dst": pa.array(d_out, pa.string())})

    edge_df = edges.map_batches(dedup_and_filter,
                                batch_format="pyarrow").to_pandas() \
        .drop_duplicates(["src", "dst"])

    idx = pd.Index(sorted(node_set))
    hub = pd.Series(1.0 / n_nodes, index=idx)
    auth = pd.Series(0.0, index=idx)
    for _ in range(iterations):
        raw_a = pd.Series(edge_df["src"].map(hub).values,
                          index=edge_df["dst"]).groupby(level=0).sum()
        sa = float(raw_a.sum())
        auth = (raw_a.reindex(idx, fill_value=0.0) / sa) if sa \
            else pd.Series(0.0, index=idx)
        raw_h = pd.Series(edge_df["dst"].map(auth).values,
                          index=edge_df["src"]).groupby(level=0).sum()
        sh = float(raw_h.sum())
        hub = (raw_h.reindex(idx, fill_value=0.0) / sh) if sh \
            else pd.Series(0.0, index=idx)

    out = node_tbl.copy()
    out["authority"] = out["n"].map(auth).fillna(0.0).round(10)
    out["hub"] = out["n"].map(hub).fillna(0.0).round(10)
    return out[["url", "authority", "hub"]]


def degree_histogram(pages: rd.Dataset, links: rd.Dataset) -> \
        "pd.DataFrame":
    """Log2-bucketed in/out-degree histogram of the crawl's internal link
    graph (the pagerank/HITS edge semantics: normalized, deduped,
    endpoints semi-joined to crawled nodes) — the graph-shape diagnostic
    run before sizing link-analysis shuffles: a heavy top bucket means
    skewed keys that need salting, a fat k=0 tail means the graph is
    join-bound, not aggregate-bound.

    Distributed shape: per-batch distinct (src,dst) partials → global
    dedup bucketed BY src (a duplicate pair always lands in its src's
    bucket, so per-bucket drop_duplicates is globally exact) → endpoint
    semi-joins via hash_join → per-batch degree Counter partials →
    bucketed exact sums. Only the ≤64-row histogram (k = floor(log2 d)
    via exact frexp, -1 = degree 0) ever reaches the driver.
    """
    import numpy as np
    import pandas as pd

    node_keys = bucketed_groups(
        _add_norm(pages.select_columns(["url"]), "url", "n")
        .select_columns(["n"]),
        "n", lambda df: df.drop_duplicates(["n"]), buckets=16).materialize()
    n_nodes = node_keys.count()

    raw = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"]) \
        .map_batches(lambda df: df.drop_duplicates(["src", "dst"]),
                     batch_format="pandas")
    edges = bucketed_groups(
        raw, "src", lambda df: df.drop_duplicates(["src", "dst"]),
        buckets=32)
    edges = hash_join(edges, node_keys, key="src", right_key="n")
    edges = hash_join(edges, node_keys, key="dst", right_key="n") \
        .materialize()

    def degrees(col: str) -> pd.DataFrame:
        from collections import Counter

        def partial(batch: pa.Table) -> pa.Table:
            c = Counter(batch.column(col).to_pylist())
            return pa.table({
                "n": pa.array(list(c.keys()), pa.string()),
                "d": pa.array(list(c.values()), pa.int64())})
        deg = bucketed_agg(
            edges.map_batches(partial, batch_format="pyarrow"),
            "n", {"d": ("d", "sum")})

        def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
            d = df["d"].to_numpy()
            k = np.frexp(d.astype(np.float64))[1] - 1
            ks, counts = np.unique(k, return_counts=True)
            return pd.DataFrame({"k": ks.astype(np.int64),
                                 "n_nodes": counts.astype(np.int64)})
        parts = deg.map_batches(hist_partial,
                                batch_format="pandas").to_pandas()
        hist = parts.groupby("k", as_index=False)["n_nodes"].sum()
        n_zero = n_nodes - int(hist["n_nodes"].sum())
        if n_zero > 0:
            hist = pd.concat(
                [pd.DataFrame({"k": [-1], "n_nodes": [n_zero]}), hist],
                ignore_index=True)
        return hist

    out_h = degrees("src").assign(direction="out")
    in_h = degrees("dst").assign(direction="in")
    out = pd.concat([in_h, out_h], ignore_index=True)
    out["k"] = out["k"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return (out[["direction", "k", "n_nodes"]]
            .sort_values(["direction", "k"]).reset_index(drop=True))


def triangle_counts(pages: rd.Dataset, links: rd.Dataset,
                    buckets: int = 32) -> "pd.DataFrame":
    """Per-node triangle counts + local clustering coefficients over the
    crawl's UNDIRECTED internal link graph (same node/edge semantics as
    the pagerank/HITS/degree reports: normalized, deduped, endpoints
    semi-joined to crawled nodes; self-loops dropped). Triangles are the
    mirror/nav-template density signal: a host whose pages form dense
    cliques is boilerplate-linked navigation, not editorial linking.

    Distributed shape (degree-oriented "compact-forward", the standard
    MapReduce triangle algorithm): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one — out-degree under
    this orientation is O(sqrt(m)) regardless of raw skew, so the wedge
    fan-out is bounded even for 10^8-inlink hubs. Wedges are generated
    per source bucket with ONE vectorized self-merge per bucket, then
    hash-joined against the oriented edge set to close triangles; each
    triangle is found exactly once (the orientation totally orders its
    vertices). Only Counter partials and the per-node result rows cross
    the shuffle — never neighbor lists.

    Returns (url, degree, triangles, lcc) for nodes in >=1 triangle,
    lcc = 2*tri/(d*(d-1)) rounded half-away at 6 dp, ordered by url.
    """
    from collections import Counter

    import numpy as np
    import pandas as pd

    url_map = bucketed_groups(
        _add_norm(pages.select_columns(["url"]), "url", "n"),
        "n", lambda df: df.drop_duplicates(["url", "n"]),
        buckets=16).materialize()
    node_keys = bucketed_groups(
        url_map.select_columns(["n"]), "n",
        lambda df: df.drop_duplicates(["n"]), buckets=16).materialize()

    raw = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"])

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        lo = df[["src", "dst"]].min(axis=1)
        hi = df[["src", "dst"]].max(axis=1)
        out = pd.DataFrame({"u": lo, "v": hi})
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates(["u", "v"])

    und = bucketed_groups(
        raw.map_batches(undirect, batch_format="pandas"),
        "u", lambda df: df.drop_duplicates(["u", "v"]), buckets=buckets)
    und = hash_join(und, node_keys, key="u", right_key="n")
    und = hash_join(und, node_keys, key="v", right_key="n").materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column("u").to_pylist())
        c.update(batch.column("v").to_pylist())
        return pa.table({"n": pa.array(list(c.keys()), pa.string()),
                         "d": pa.array(list(c.values()), pa.int64())})

    deg = bucketed_agg(
        und.map_batches(deg_partial, batch_format="pyarrow"),
        "n", {"d": ("d", "sum")}).materialize()

    deg_u = deg.map_batches(
        lambda df: df.rename(columns={"n": "u", "d": "du"}),
        batch_format="pandas")
    deg_v = deg.map_batches(
        lambda df: df.rename(columns={"n": "v", "d": "dv"}),
        batch_format="pandas")
    ed = hash_join(hash_join(und, deg_u, key="u"), deg_v, key="v")

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        u_first = (df["du"] < df["dv"]) | \
            ((df["du"] == df["dv"]) & (df["u"] < df["v"]))
        return pd.DataFrame({
            "a": np.where(u_first, df["u"], df["v"]),
            "b": np.where(u_first, df["v"], df["u"]),
            "db": np.where(u_first, df["dv"], df["du"]).astype("int64")})

    oriented = ed.map_batches(orient, batch_format="pandas").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="a", suffixes=("_x", "_y"))
        lt = (m["db_x"] < m["db_y"]) | \
            ((m["db_x"] == m["db_y"]) & (m["b_x"] < m["b_y"]))
        m = m[lt]
        return pd.DataFrame({"w": m["a"],
                             "k": m["b_x"] + "\x1f" + m["b_y"]})

    cand = bucketed_groups(oriented, "a", wedges, buckets=buckets)
    ekeys = oriented.map_batches(
        lambda df: pd.DataFrame({"k": df["a"] + "\x1f" + df["b"]}),
        batch_format="pandas")
    tri = hash_join(cand, ekeys, key="k")

    def tri_partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column("w").to_pylist())
        for k in batch.column("k").to_pylist():
            x, y = k.split("\x1f")
            c[x] += 1
            c[y] += 1
        return pa.table({"n": pa.array(list(c.keys()), pa.string()),
                         "tri": pa.array(list(c.values()), pa.int64())})

    cnt = bucketed_agg(
        tri.map_batches(tri_partial, batch_format="pyarrow"),
        "n", {"tri": ("tri", "sum")})
    out = hash_join(hash_join(cnt, deg, key="n"), url_map, key="n") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"url": pd.Series([], dtype="object"),
                             "degree": pd.Series([], dtype="int64"),
                             "triangles": pd.Series([], dtype="int64"),
                             "lcc": pd.Series([], dtype="float64")})
    d = out["d"].to_numpy(dtype="float64")
    t = out["tri"].to_numpy(dtype="float64")
    out["lcc"] = np.floor(2.0 * t / (d * (d - 1.0)) * 1e6 + 0.5) / 1e6
    out = out.rename(columns={"d": "degree", "tri": "triangles"})
    out["degree"] = out["degree"].astype("int64")
    out["triangles"] = out["triangles"].astype("int64")
    return (out[["url", "degree", "triangles", "lcc"]]
            .sort_values("url").reset_index(drop=True))


def cocitation_pairs(pages: rd.Dataset, links: rd.Dataset,
                     min_common: int = 2, top: int = 200,
                     buckets: int = 32) -> "pd.DataFrame":
    """Top co-cited page pairs: (a, b, n_common) where n_common = number
    of crawled pages linking to BOTH a and b (directed, normalized,
    deduped internal edges with endpoints in the crawled node set — the
    pagerank/HITS edge semantics). Co-citation is the link-level
    mirror/duplicate-cluster signal: two URLs cited together from many
    sources are usually the same logical resource (http/https, tracking
    params, language variants) — the graph-side complement to the
    content-side minhash pass.

    Distributed shape: pairs are generated per SOURCE bucket with one
    vectorized self-merge + groupby per bucket (pair fan-out per source
    is out_degree², bounded by the crawl's per-page max_links, never by
    global inlink skew), pre-counted partials shuffle to a pair-bucketed
    exact sum, and the top-k is per-block partials merged at the driver
    (exact for any top-k). Ordered by (n_common DESC, a, b)."""
    import pandas as pd

    node_keys = bucketed_groups(
        _add_norm(pages.select_columns(["url"]), "url", "n")
        .select_columns(["n"]),
        "n", lambda df: df.drop_duplicates(["n"]), buckets=16).materialize()

    raw = _add_norm(
        _add_norm(links.filter(expr="is_internal == True")
                  .select_columns(["source_url", "target_url"]),
                  "source_url", "src"),
        "target_url", "dst").select_columns(["src", "dst"]) \
        .map_batches(lambda df: df.drop_duplicates(["src", "dst"]),
                     batch_format="pandas")
    edges = bucketed_groups(
        raw, "src", lambda df: df.drop_duplicates(["src", "dst"]),
        buckets=buckets)
    edges = hash_join(edges, node_keys, key="src", right_key="n")
    edges = hash_join(edges, node_keys, key="dst", right_key="n")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="src", suffixes=("_x", "_y"))
        m = m[m["dst_x"] < m["dst_y"]]
        g = m.groupby(["dst_x", "dst_y"], sort=False) \
            .size().reset_index(name="n")
        return g.rename(columns={"dst_x": "url_a", "dst_y": "url_b"})

    part = bucketed_groups(edges, "src", pairs, buckets=buckets)
    cnt = bucketed_agg(part, ["url_a", "url_b"],
                       {"n_common": ("n", "sum")}, bucket_on="url_a")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_common"] >= min_common]
        return df.sort_values(["n_common", "url_a", "url_b"],
                              ascending=[False, True, True]).head(top)

    out = cnt.map_batches(topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["n_common", "url_a", "url_b"],
                          ascending=[False, True, True]) \
        .head(top).reset_index(drop=True)
    out["n_common"] = out["n_common"].astype("int64")
    return out[["url_a", "url_b", "n_common"]]


def bloom_semi_join(left: rd.Dataset, key: str, right: rd.Dataset,
                    right_key: str, fp_rate: float = 0.01,
                    exact_verify: bool = True) -> rd.Dataset:
    """Bloom-prefiltered semi-join: keep the ``left`` rows whose ``key``
    appears in ``right[right_key]``.

    The shuffle-saving shape for selective semi-joins at 100 TB: the
    right side collapses to a fixed-size bit array (per-block blooms
    with identical (m, k) parameters OR-merge associatively — one bounded
    row per block, never the key stream), the merged filter broadcasts
    once via ray.put, and the left side drops non-members in a stateless
    vectorized pass BEFORE any join shuffle. With ``exact_verify`` the
    ~fp_rate survivors that are false positives are removed by a
    hash_join against the true key set, so the result is EXACT — the
    bloom stage is purely a bandwidth optimization (at 1% fp a 99%-
    selective filter cuts the join's shuffled volume ~100×).
    """
    import hashlib

    import numpy as np
    import ray

    from ..state.filters import BloomFilter

    cap = max(right.count(), 1)

    def key_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        vals = col.to_pylist()
        return np.fromiter(
            (int.from_bytes(
                hashlib.sha1(str(v).encode("utf-8")).digest()[:8],
                "big") for v in vals),
            dtype=np.uint64, count=len(vals))

    def build_partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(cap, fp_rate)
        bf.add_many(key_hashes(batch.column(right_key)))
        return pa.table({"bits": pa.array([bf.bits.tobytes()],
                                          pa.binary())})

    merged = BloomFilter(cap, fp_rate)
    for b in right.select_columns([right_key]) \
            .map_batches(build_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for blob in b.column("bits").to_pylist():
            merged.bits |= np.frombuffer(blob, dtype=np.uint8)
    ref = ray.put(merged)

    def probe(batch: pa.Table) -> pa.Table:
        bf = ray.get(ref)
        mask = bf.contains_many(key_hashes(batch.column(key)))
        return batch.filter(pa.array(mask))

    survivors = left.map_batches(probe, batch_format="pyarrow")
    if not exact_verify:
        return survivors
    # exact semi-join verify: distinct right keys (hash_join drops the
    # right key column, so the output carries left columns only)
    keyset = bucketed_groups(
        right.select_columns([right_key]), right_key,
        lambda df: df.drop_duplicates([right_key]), buckets=16)
    return hash_join(survivors, keyset, key=key, right_key=right_key)
