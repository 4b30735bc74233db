"""Report exports S12–S16 (reference main.py:304-483).

Reproduces the reference's CSV / JSON / XML export shapes over the engine's
tables, including the exact nested-field summarization strings ("N tags",
"N images", first-3 h2s + "...", "Yes"/"No" booleans, "Not crawled"
statuses) so a consumer of the reference tool's exports can switch engines
without changing parsers.

The row-formatting is a map_batches projection (streaming); the final
serialization writes one file on the driver (exports are report-sized).
``export_date`` is injectable for deterministic tests.
"""

from __future__ import annotations

import csv
import io
import json
import time
import xml.etree.ElementTree as ET

import pyarrow as pa

DEFAULT_PAGE_FIELDS = [
    "url", "status_code", "title", "meta_description", "h1", "word_count",
    "depth", "internal_links", "external_links", "canonical_url",
    "response_time", "size", "og_tags", "twitter_tags", "json_ld",
    "images", "h2", "h3", "schema_types", "ai_ready_schemas",
    "is_soft_404", "has_long_redirect_chain", "requires_js",
]

LINKS_FIELDS = ["source_url", "target_url", "anchor_text", "is_internal",
                "target_domain", "target_status", "placement"]
ISSUES_FIELDS = ["url", "type", "category", "issue", "details"]


def _seq_len(value) -> int:
    """len() for list / numpy array / None (pandas rows surface Arrow list
    columns as numpy object arrays, whose truthiness raises)."""
    if value is None:
        return 0
    try:
        return len(value)
    except TypeError:
        return 0


def _fmt_page_value(field: str, value) -> str:
    """Reference CSV summarization rules (main.py:315-343)."""
    if value is None:
        return ""
    if field in ("og_tags", "twitter_tags"):
        n = _seq_len(value)
        return f"{n} tags" if n else ""
    if field == "json_ld":
        n = _seq_len(value)
        return f"{n} scripts" if n else ""
    if field == "images":
        n = _seq_len(value)
        return f"{n} images" if n else ""
    if field == "internal_links":
        return f"{int(value)} internal links" if value else "0 internal links"
    if field == "external_links":
        return f"{int(value)} external links" if value else "0 external links"
    if field == "schema_types":
        v = [str(x) for x in (value if value is not None else [])]
        return ", ".join(v)
    if field == "ai_ready_schemas":
        n = _seq_len(value)
        return f"{n} AI-ready" if n else ""
    if field in ("is_soft_404", "has_long_redirect_chain",
                 "requires_js"):
        return "Yes" if value else "No"
    if field in ("h2", "h3"):
        v = [str(x) for x in (value if value is not None else [])]
        return ", ".join(v[:3]) + ("..." if len(v) > 3 else "")
    if isinstance(value, (dict, list)):
        return str(value)
    return value if isinstance(value, str) else value


def pages_csv(rows: list[dict], fields: list[str] | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=fields)
    w.writeheader()
    for r in rows:
        w.writerow({f: _fmt_page_value(f, r.get(f, "")) for f in fields})
    return out.getvalue()


def pages_json(rows: list[dict], fields: list[str] | None = None,
               export_date: str | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    data = [{f: r.get(f, "") for f in fields} for r in rows]
    return json.dumps({
        "export_date": export_date or time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_urls": len(data),
        "fields": fields,
        "data": data,
    }, indent=2, default=str)


def pages_xml(rows: list[dict], fields: list[str] | None = None,
              export_date: str | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    root = ET.Element("librecrawl_export")
    root.set("export_date",
             export_date or time.strftime("%Y-%m-%d %H:%M:%S"))
    root.set("total_urls", str(len(rows)))
    urls_el = ET.SubElement(root, "urls")
    for r in rows:
        url_el = ET.SubElement(urls_el, "url")
        for f in fields:
            fe = ET.SubElement(url_el, f)
            fe.text = str(r.get(f, ""))
    return ET.tostring(root, encoding="unicode")


def links_csv(rows: list[dict]) -> str:
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=LINKS_FIELDS)
    w.writeheader()
    for r in rows:
        ts = r.get("target_status")
        w.writerow({
            "source_url": r.get("source_url", ""),
            "target_url": r.get("target_url", ""),
            "anchor_text": r.get("anchor_text", ""),
            "is_internal": "Yes" if r.get("is_internal") else "No",
            "target_domain": r.get("target_domain", ""),
            "target_status": "Not crawled" if ts is None
                             or (isinstance(ts, float) and ts != ts)
                             else int(ts),
            "placement": r.get("placement", "body"),
        })
    return out.getvalue()


def links_json(rows: list[dict]) -> str:
    return json.dumps(rows, indent=2, default=str)


def issues_csv(rows: list[dict]) -> str:
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=ISSUES_FIELDS)
    w.writeheader()
    for r in rows:
        w.writerow({f: r.get(f, "") for f in ISSUES_FIELDS})
    return out.getvalue()


def issues_json(rows: list[dict], export_date: str | None = None) -> str:
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r.get("url", ""), []).append(
            {f: r.get(f, "") for f in ("type", "category", "issue",
                                       "details")})
    return json.dumps({
        "export_date": export_date or time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_issues": len(rows),
        "total_urls_with_issues": len(by_url),
        "issues_by_url": by_url,
        "all_issues": rows,
    }, indent=2)


# ----------------------------------------------------- S17 visualization

def visualization_graph(pages_rows: list[dict], links_rows: list[dict],
                        max_nodes: int = 500) -> dict:
    """S17 (main.py:987-1081): first-N pages as nodes (status-coded),
    deduped internal edges between included nodes."""
    nodes, node_ids = [], {}
    for r in pages_rows[:max_nodes]:
        nid = len(nodes)
        node_ids[r["url"]] = nid
        status = r.get("status_code") or 0
        color = ("green" if 200 <= status < 300 else
                 "yellow" if 300 <= status < 400 else
                 "red" if status >= 400 else "gray")
        nodes.append({"id": nid, "url": r["url"], "status": status,
                      "color": color})
    edges, seen = [], set()
    for l in links_rows:
        if not l.get("is_internal"):
            continue
        s = node_ids.get(l["source_url"])
        t = node_ids.get(l["target_url"])
        if s is None or t is None or s == t:
            continue
        key = (s, t)
        if key in seen:
            continue
        seen.add(key)
        edges.append({"source": s, "target": t})
    return {"nodes": nodes, "edges": edges}


def export_pages_ds(pages_ds, fmt: str, fields: list[str] | None = None,
                    export_date: str | None = None,
                    sort_by: tuple = ("wave", "depth", "seq"),
                    out_path: str | None = None,
                    batch_size: int = 4096) -> str:
    """Dataset → export, streamed. Rows are ordered by crawl order
    (``seq`` is unique, so the order is total and deterministic; the
    reference's row order is thread-completion order).

    Scale shape: the sort is a cluster-side range shuffle and the driver
    consumes one ``iter_batches`` batch at a time through the same row
    formatters as the list-based writers — the dataset is never
    materialized on the driver. JSON/XML need ``total_urls`` in their
    envelope header, which is only known once the stream ends, so their
    row section spools to a temp file on disk (O(1) driver heap) and is
    copied behind the header. Output is byte-identical to formatting
    ``to_pandas()`` rows.

    With ``out_path`` the export is written to that file and the path is
    returned; otherwise the string is returned (report-sized use).
    """
    import shutil
    import tempfile
    import textwrap

    fields = fields or DEFAULT_PAGE_FIELDS
    ed = export_date or time.strftime("%Y-%m-%d %H:%M:%S")
    if fmt not in ("csv", "json", "xml"):
        raise ValueError(f"unknown format {fmt}")
    ds = pages_ds.sort(list(sort_by))

    def rows_iter():
        for df in ds.iter_batches(batch_size=batch_size,
                                  batch_format="pandas"):
            yield from df.to_dict("records")

    out = open(out_path, "w", encoding="utf-8", newline="") \
        if out_path else io.StringIO()
    try:
        if fmt == "csv":
            w = csv.DictWriter(out, fieldnames=fields)
            w.writeheader()
            for r in rows_iter():
                w.writerow({f: _fmt_page_value(f, r.get(f, ""))
                            for f in fields})
        elif fmt == "json":
            n = 0
            with tempfile.TemporaryFile("w+", encoding="utf-8") as spool:
                for r in rows_iter():
                    if n:
                        spool.write(",\n")
                    body = json.dumps({f: r.get(f, "") for f in fields},
                                      indent=2, default=str)
                    spool.write(textwrap.indent(body, "    "))
                    n += 1
                head = json.dumps({"export_date": ed, "total_urls": n,
                                   "fields": fields, "data": []}, indent=2)
                marker = '"data": []'
                idx = head.rindex(marker)
                if n == 0:
                    out.write(head)
                else:
                    out.write(head[:idx] + '"data": [\n')
                    spool.seek(0)
                    shutil.copyfileobj(spool, out)
                    out.write("\n  ]" + head[idx + len(marker):])
        else:  # xml
            n = 0
            with tempfile.TemporaryFile("w+", encoding="utf-8") as spool:
                for r in rows_iter():
                    url_el = ET.Element("url")
                    for f in fields:
                        fe = ET.SubElement(url_el, f)
                        fe.text = str(r.get(f, ""))
                    spool.write(ET.tostring(url_el, encoding="unicode"))
                    n += 1
                root = ET.Element("librecrawl_export")
                root.set("export_date", ed)
                root.set("total_urls", str(n))
                ET.SubElement(root, "urls")
                skel = ET.tostring(root, encoding="unicode")
                pre, post = skel.split("<urls />")
                out.write(pre)
                if n:
                    out.write("<urls>")
                    spool.seek(0)
                    shutil.copyfileobj(spool, out)
                    out.write("</urls>")
                else:
                    out.write("<urls />")
                out.write(post)
        if out_path:
            return out_path
        return out.getvalue()
    finally:
        if out_path:
            out.close()


def export_pages_sharded(pages_ds, out_dir: str,
                         fields: list[str] | None = None,
                         sort_by: tuple = ("wave", "depth", "seq")):
    """Fully distributed CSV export: each row is formatted to the
    reference summarization strings inside ``map_batches`` (cluster-side)
    and parts are written by Ray's CSV datasink — the driver never sees a
    row. Parts under ``out_dir`` follow global sort order (range-
    partitioned sorted blocks). Each part carries the header row; a
    consumer concatenates parts dropping repeated headers. Part quoting
    is Arrow's RFC-4180 writer; the byte-identical-to-reference path is
    ``export_pages_ds``. Returns ``out_dir``."""
    import pandas as pd

    fields = fields or DEFAULT_PAGE_FIELDS

    def fmt_batch(df: pd.DataFrame) -> pd.DataFrame:
        recs = df.to_dict("records")
        return pd.DataFrame(
            {f: [str(_fmt_page_value(f, r.get(f, ""))) for r in recs]
             for f in fields})

    pages_ds.sort(list(sort_by)) \
        .map_batches(fmt_batch, batch_format="pandas") \
        .write_csv(out_dir)
    return out_dir
