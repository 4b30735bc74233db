"""Document-table ingestion from non-parquet source formats.

The engine's canonical document table is the TESTDATA.md `documents`
schema: (doc_id int64, text string, lang string, source string,
n_chars int64). Real corpora arrive as JSONL dumps or CSV exports;
these readers normalize either into that schema so every downstream
operator (dedup, curation, decontamination, stats) runs unchanged.

Ray-Data-first: `ray.data.read_json` / `read_csv` stream the files as
blocks; normalization is one zero-copy-ish `map_batches` pass that
renames/derives columns. Missing ids are derived deterministically from
the content fingerprint (stable across re-ingestion and resumable runs —
NOT a row counter, which would depend on block order).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DOCUMENT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])

# column aliases accepted from foreign dumps, first match wins
_TEXT_ALIASES = ("text", "content", "body", "raw_content", "document")
_LANG_ALIASES = ("lang", "language", "lang_id")
_SOURCE_ALIASES = ("source", "subset", "dataset", "origin", "url_host")
_ID_ALIASES = ("doc_id", "id", "docid")


def _first_present(names, cols) -> str | None:
    for n in names:
        if n in cols:
            return n
    return None


def _fingerprint_id(texts: list[str]) -> list[int]:
    """Deterministic int64 id from the content fingerprint (md5 low 63
    bits): stable across re-ingestion, independent of row/block order."""
    from ..functions.text import fingerprint
    return [int(fingerprint(t)[:16], 16) & 0x7FFFFFFFFFFFFFFF
            for t in texts]


def normalize_documents(ds: rd.Dataset, default_source: str = "ingest",
                        default_lang: str = "und") -> rd.Dataset:
    """Map any alias-named document dump onto DOCUMENT_SCHEMA."""
    def norm(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        tcol = _first_present(_TEXT_ALIASES, cols)
        if tcol is None:
            raise ValueError(
                f"no text column among {sorted(cols)}; "
                f"expected one of {_TEXT_ALIASES}")
        text = pc.cast(batch.column(tcol), pa.string())
        texts = text.to_pylist()
        icol = _first_present(_ID_ALIASES, cols)
        if icol is not None:
            ids = pc.cast(batch.column(icol), pa.int64())
        else:
            ids = pa.array(_fingerprint_id(texts), pa.int64())
        lcol = _first_present(_LANG_ALIASES, cols)
        lang = (pc.cast(batch.column(lcol), pa.string()) if lcol else
                pa.array([default_lang] * len(batch), pa.string()))
        scol = _first_present(_SOURCE_ALIASES, cols)
        source = (pc.cast(batch.column(scol), pa.string()) if scol else
                  pa.array([default_source] * len(batch), pa.string()))
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        return pa.table({"doc_id": ids, "text": text, "lang": lang,
                         "source": source, "n_chars": n_chars})

    return ds.map_batches(norm, batch_format="pyarrow")


def read_documents_jsonl(paths: str | list[str], **kwargs) -> rd.Dataset:
    """JSONL corpus dump → canonical documents Dataset (streaming read,
    one normalization pass)."""
    return normalize_documents(rd.read_json(paths), **kwargs)


def read_documents_csv(paths: str | list[str], **kwargs) -> rd.Dataset:
    """CSV corpus export → canonical documents Dataset."""
    return normalize_documents(rd.read_csv(paths), **kwargs)


def write_documents_sharded(ds: rd.Dataset, out_dir: str,
                            shard_rows: int = 250_000) -> None:
    """Write a document table as a directory of bounded-size parquet
    shards (never one giant file): the resumable-output layout the crawl
    checkpointer already uses — a re-run can diff existing shard files
    and skip completed ones."""
    n = ds.count()
    blocks = max(1, (n + shard_rows - 1) // shard_rows)
    ds.repartition(blocks).write_parquet(out_dir)


def write_documents_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Training-data JSONL export: one .json file per block (Ray Data's
    native streamed JSONL writer — each worker writes its own shard, no
    driver funnel; the same resumable many-small-files layout as the
    parquet writers)."""
    ds.write_json(out_dir)


def filter_blocklist(ds: rd.Dataset, blocked: set[str] | list[str],
                     col: str = "source") -> rd.Dataset:
    """Drop rows whose ``col`` value is on a blocklist (the URL/domain
    blocklist gate of a crawl-corpus pipeline, e.g. UT1-style category
    lists). The list is broadcast ONCE via ray.put and read per actor
    task — never re-shipped per batch; lookups are a vectorized
    ``pc.is_in`` over the Arrow column."""
    import ray
    blocked_arr = pa.array(sorted(set(blocked)), pa.string())
    ref = ray.put(blocked_arr)

    def gate(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        return batch.filter(
            pc.invert(pc.is_in(batch.column(col), value_set=bl)))

    return ds.map_batches(gate, batch_format="pyarrow")


def export_alias_jsonl(doc_parquet: str,
                       root: str = "/tmp/graft_ingest") -> str:
    """Export a documents parquet as an alias-named JSONL dump
    (content/language/subset, no id column) — the foreign-dump shape the
    ingest readers normalize; used by the driver's ingest oracle so the
    Ray query and the DuckDB twin read the identical file. Content-keyed
    cache + atomic rename (the search-index recipe); fixture-sized
    export, written driver-side (real ingest reads dumps that already
    exist)."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    st = os.stat(doc_parquet)
    sig = (f"ingest-v1|{os.path.abspath(doc_parquet)}|{st.st_size}|"
           f"{st.st_mtime_ns}")
    tag = hashlib.md5(sig.encode()).hexdigest()[:10]
    out = os.path.join(root + "_" + tag)
    path = os.path.join(out, "docs.jsonl")
    if not os.path.isdir(out):
        tmp = f"{out}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        df = pq.read_table(
            doc_parquet, columns=["text", "lang", "source"]).to_pandas()
        df = df.rename(columns={"text": "content", "lang": "language",
                                "source": "subset"})
        df.to_json(os.path.join(tmp, "docs.jsonl"),
                   orient="records", lines=True, force_ascii=True)
        try:
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def ingest_jsonl_sql(jsonl_path: str) -> str:
    """DuckDB twin of read_documents_jsonl on an alias-named dump: same
    column mapping, same fingerprint-derived int64 id (md5 of
    whitespace-normalized lowercase text, low 63 bits)."""
    fp16 = ("substr(md5(lower(trim(regexp_replace(content, '\\s+', ' ', "
            "'g')))), 1, 16)")
    return f"""
SELECT CAST(CAST('0x' || {fp16} AS UBIGINT) &
            CAST('0x7FFFFFFFFFFFFFFF' AS UBIGINT) AS BIGINT) AS doc_id,
       content AS text, language AS lang, subset AS source,
       length(content)::BIGINT AS n_chars
FROM read_json_auto('{jsonl_path}')
ORDER BY doc_id, source"""
