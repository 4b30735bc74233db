"""llms.txt fetch + validation (S7, reference src/core/llms_parser.py:17-112).

The corpus carries /llms.txt as a document row (content_type text/plain,
markdown-ish spans). Validation mirrors the reference checks: present,
plain-text content type, starts with an H1 title.
"""

from __future__ import annotations

from ..canonical import norm_url


def validate_llms(doc: dict | None) -> dict:
    """Corpus row for <base>/llms.txt → validation result."""
    if doc is None:
        return {"present": False, "valid": False, "title": "",
                "problems": ["missing"]}
    problems = []
    ctype = (doc.get("content_type") or "").lower()
    if not ctype.startswith("text/plain"):
        problems.append(f"content_type:{ctype or 'unknown'}")
    spans = doc.get("spans") or []
    title = ""
    for s in spans:
        if s["kind"] == "h1":
            title = s["text"]
            break
    if not title:
        problems.append("no_h1_title")
    return {"present": True, "valid": not problems, "title": title,
            "problems": problems}


def llms_url(base_domain: str) -> str:
    return f"https://{base_domain}/llms.txt"


def fetch_llms(lookup, base_domain: str) -> dict:
    """lookup(url)→row|None resolver → validation result (one side lookup,
    not a dataflow stage — single row per crawl)."""
    return validate_llms(lookup(llms_url(base_domain)))
