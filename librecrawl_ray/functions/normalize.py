"""Unicode text normalization for corpus preprocessing.

The canonicalization pass most pipelines run before fingerprinting /
dedup: NFC unicode normalization, accent stripping, whitespace collapse,
lowercase. Stateless and embarrassingly parallel — one zero-copy-in
``map_batches`` pass, no shuffle — so it composes ahead of any dedup or
annotation stage at full stream rate.

The formula is chosen to be DuckDB-expressible
(``nfc_normalize`` / ``strip_accents`` / ``regexp_replace``) so the
oracle verifies it bit-for-bit; the python side mirrors DuckDB's
strip_accents (NFD decompose, drop combining marks, NFC recompose),
which is pinned against DuckDB on unicode edge cases in pytest.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import ray.data as rd

__all__ = ["normalize_text", "normalize_text_batch", "normalize_text_sql"]

# exactly RE2's \s ([\t\n\f\r ]) — python's unicode \s also matches \v,
# NBSP etc., which DuckDB's regexp_replace would NOT collapse
_WS_RE = re.compile(r"[\t\n\f\r ]+")


def _strip_accents(text: str) -> str:
    # DuckDB strip_accents == ICU unaccent: decompose, drop Mn marks
    return unicodedata.normalize(
        "NFC", "".join(ch for ch in unicodedata.normalize("NFD", text)
                       if unicodedata.category(ch) != "Mn"))


def normalize_one(text: str) -> str:
    t = unicodedata.normalize("NFC", text or "")
    t = _strip_accents(t)
    t = _WS_RE.sub(" ", t).strip(" ")   # DuckDB trim() strips ' ' only
    return t.lower()


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm_text") -> pa.Table:
    vals = [normalize_one(t)
            for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def normalize_text(ds: rd.Dataset, text_col: str = "text",
                   out_col: str = "norm_text") -> rd.Dataset:
    """documents → documents + ``norm_text`` column."""
    return ds.map_batches(
        lambda b: normalize_text_batch(b, text_col, out_col),
        batch_format="pyarrow")


def normalize_text_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of ``normalize_one`` applied per row."""
    return f"""
SELECT {id_col},
       lower(trim(regexp_replace(
           strip_accents(nfc_normalize({text_col})),
           '\\s+', ' ', 'g'))) AS norm_text
FROM {table} ORDER BY {id_col}"""
