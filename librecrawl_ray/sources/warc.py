"""Minimal WARC/1.0 reader + writer over Ray Data.

WARC (ISO 28500) is the web-archive interchange format every large
crawl ships (Common Crawl, Internet Archive); a crawl engine that
cannot ingest it cannot consume existing archives. No warc library is
in the container and none is needed: record framing is a header block,
a Content-Length-exact payload, and a CRLF CRLF trailer.

Reader: ``ray.data.read_binary_files(paths)`` — one task per .warc
shard (files are the parallelism unit, exactly like parquet row
groups) — then one ``map_batches`` pass parses records with exact
Content-Length framing (never split-on-blank-line: HTTP payloads
legally contain CRLFCRLF). Rows: (record_id, url, status,
content_type, text, source, lang).

Writer: deterministic export of a documents table as sharded .warc
files (record ids derived from doc_id, fixed WARC-Date, bounded
records per shard — never one giant file). The custom
``WARC-X-Source`` / ``WARC-X-Lang`` headers round-trip the canonical
document columns so re-ingestion is lossless; real archives without
them fall back to defaults exactly like the JSONL/CSV ingesters.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

_CRLF = b"\r\n"
_WARC_DATE = "2026-01-01T00:00:00Z"   # fixed: exports are deterministic


def _record_bytes(doc_id: int, text: str, source: str, lang: str) -> bytes:
    body = (text or "").encode("utf-8")
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode("ascii")
            + body)
    uri = f"https://warc.example/{source}/{doc_id}"
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
           f"WARC-Date: {_WARC_DATE}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"WARC-X-Source: {source}\r\n"
           f"WARC-X-Lang: {lang}\r\n"
           f"Content-Type: application/http;msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
    return hdr + http + _CRLF + _CRLF


def write_warc(ds: rd.Dataset, out_dir: str,
               records_per_shard: int = 65_536) -> str:
    """Export a canonical documents Dataset as sharded .warc files.

    Shards rotate every ``records_per_shard`` records and are named by
    the first doc_id they contain after a global doc_id sort, so the
    layout is deterministic and a re-export can skip finished shards.
    Fixture-scale writer streams through the driver via iter_batches;
    at archive scale the same ``_record_bytes`` body runs inside
    ``map_batches`` with content-derived shard names (one file per
    block, no driver funnel — the export_pages_sharded pattern)."""
    os.makedirs(out_dir, exist_ok=True)
    ds = ds.select_columns(["doc_id", "text", "source", "lang"]) \
        .sort("doc_id")
    fh, count, path = None, 0, None
    for batch in ds.iter_batches(batch_format="pyarrow"):
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        for i, t, s, lg in zip(ids, texts, srcs, langs):
            if fh is None or count >= records_per_shard:
                if fh is not None:
                    fh.close()
                path = os.path.join(out_dir, f"shard-{i:020d}.warc")
                fh = open(path, "wb")
                count = 0
            fh.write(_record_bytes(i, t, s, lg))
            count += 1
    if fh is not None:
        fh.close()
    return out_dir


def _parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one .warc shard into record dicts with exact
    Content-Length framing."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = data.index(b"\r\n\r\n", pos)
        headers = {}
        lines = data[pos:end_hdr].split(_CRLF)
        version = lines[0].decode("utf-8", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {version!r}")
        for ln in lines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        payload = data[end_hdr + 4:end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        # HTTP response payload: status line + headers + body
        he = payload.index(b"\r\n\r\n")
        hlines = payload[:he].split(_CRLF)
        status = int(hlines[0].split()[1]) if len(hlines[0].split()) > 1 \
            else 0
        ctype = ""
        for ln in hlines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
        body = payload[he + 4:]
        out.append({
            "record_id": headers.get("warc-record-id", ""),
            "url": headers.get("warc-target-uri", ""),
            "status": status,
            "content_type": ctype,
            "text": body.decode("utf-8", "replace"),
            "source": headers.get("warc-x-source", ""),
            "lang": headers.get("warc-x-lang", ""),
        })
    return out


def read_warc(paths: str | list[str]) -> rd.Dataset:
    """Stream .warc shards as parsed response-record rows. One read
    task per file; parsing is a flat map_batches expansion (a batch of
    file blobs becomes many record rows)."""
    raw = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch.column("bytes").to_pylist():
            rows.extend(_parse_warc_bytes(blob))
        return pa.table({
            "record_id": pa.array([r["record_id"] for r in rows],
                                  pa.string()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.int64()),
            "content_type": pa.array([r["content_type"] for r in rows],
                                     pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        })

    return raw.map_batches(parse, batch_format="pyarrow")


def read_warc_documents(paths: str | list[str],
                        default_source: str = "warc",
                        default_lang: str = "und") -> rd.Dataset:
    """WARC archive → canonical documents Dataset. doc_id comes from the
    ``<urn:doc:N>`` record id when present (lossless roundtrip of this
    module's own exports), else from the content fingerprint — the same
    order-independent derivation as the JSONL/CSV ingesters."""
    from .ingest import _fingerprint_id

    def norm(batch: pa.Table) -> pa.Table:
        rids = batch.column("record_id").to_pylist()
        texts = batch.column("text").to_pylist()
        ids = []
        fps = None
        for j, rid in enumerate(rids):
            if rid.startswith("<urn:doc:") and rid.endswith(">"):
                ids.append(int(rid[9:-1]))
            else:
                if fps is None:
                    fps = _fingerprint_id(texts)
                ids.append(fps[j])
        src = [s or default_source
               for s in batch.column("source").to_pylist()]
        lang = [v or default_lang
                for v in batch.column("lang").to_pylist()]
        import pyarrow.compute as pc
        text = batch.column("text")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": text,
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(src, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64())})

    return read_warc(paths).map_batches(norm, batch_format="pyarrow")


def export_warc_fixture(doc_parquet: str,
                        root: str = "/tmp/graft_warc") -> str:
    """Export a documents parquet as a sharded WARC archive (content-
    keyed cache + atomic rename — the export_alias_jsonl recipe); used
    by the driver's WARC-ingest oracle so the Ray query reads a real
    archive while the DuckDB twin reads the source parquet the archive
    was derived from (the roundtrip is lossless by construction, so a
    green row proves the full write→parse→normalize path)."""
    import hashlib
    import shutil

    st = os.stat(doc_parquet)
    sig = (f"warc-v1|{os.path.abspath(doc_parquet)}|{st.st_size}|"
           f"{st.st_mtime_ns}")
    tag = hashlib.md5(sig.encode()).hexdigest()[:10]
    out = f"{root}_{tag}"
    if not os.path.isdir(out):
        tmp = f"{out}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = rd.read_parquet(doc_parquet)
        # small fixture shards so the read path exercises >1 file
        write_warc(ds, tmp, records_per_shard=200)
        try:
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def ingest_warc_sql(table_expr: str = "documents") -> str:
    """DuckDB twin of ``read_warc_documents(export_warc_fixture(p))``:
    the WARC roundtrip preserves every canonical column, so the twin is
    a direct projection of the source table — any framing, header,
    encoding or Content-Length bug in the WARC path breaks the hash."""
    return f"""
SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
FROM {table_expr} ORDER BY doc_id"""
