"""Pure URL / HTML scalar functions shared by the Ray engine, the serial
oracle and the pytest suite.

The reference does these ad hoc in user crawler code and contrib adapters
(SURVEY.md section 2.8): pomp examples extract links with a small ``href``
regex, resolve relative links with ``urllib.parse.urljoin`` and decode
``response.body`` bytes by hand.  Centralising them here is what makes the
"byte-identical extracted text per url" invariant (BASELINE.json:15)
testable: the corpus generator, the oracle and every Ray stage import the
SAME functions.

All functions are pure and total (never raise on odd input; they return
empty results instead) so batch stages never throw mid-pipeline.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

# pomp's canonical quickstart extracts links with a plain href regex over the
# decoded body (pomp README example [estimated]); we match that behaviour.
_HREF_RE = re.compile(r'href="([^"]+)"')
_ANCHOR_RE = re.compile(r'<a href="([^"]+)">([^<]*)</a>')
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")

_DEFAULT_PORTS = {"http": 80, "https": 443}

# Fast path: urls already in canonical shape (lowercase scheme://host with a
# path, no port/query/fragment/userinfo/uppercase) pass through untouched.
# Equivalence with the slow path is property-tested (tests/test_textfns.py).
_CANON_FAST_RE = re.compile(r"^(?:http|https)://[a-z0-9.-]+/[^#?@\s]*$")


def body_decode(body: bytes | str | None, encoding: str = "utf-8") -> str:
    """Decode a fetched body; errors are replaced, never raised."""
    if body is None:
        return ""
    if isinstance(body, str):
        return body
    return body.decode(encoding, errors="replace")


def url_canonicalize(url: str) -> str:
    """Canonical URL form keying the seen-set (north_star: "keyed by
    canonical-URL hash").

    Rules: strip surrounding whitespace; lowercase scheme and host; drop
    default ports; drop the fragment; empty path -> "/"; keep the query.
    """
    if not url:
        return ""
    if _CANON_FAST_RE.match(url):
        return url
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    else:
        netloc = host
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def url_host(url: str) -> str:
    """Host part of a URL, lowercased ("" when unparsable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def url_path(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def url_join(base: str, href: str) -> str:
    """Resolve a possibly-relative href against its page URL (pomp examples
    use urllib.parse.urljoin for this)."""
    try:
        return urljoin(base, href)
    except ValueError:
        return href


def html_extract_links(html: bytes | str) -> list[str]:
    """All href targets in document order (duplicates preserved -- dedup is
    the frontier's job, exactly as in pomp where ``next_requests`` may yield
    duplicates and the queue/middleware dedups)."""
    return _HREF_RE.findall(body_decode(html))


def html_extract_anchors(html: bytes | str) -> list[tuple[str, str]]:
    """(href, anchor-text) pairs in document order -- the link-graph
    payload an anchor-text index aggregates (what search engines and
    web-graph training corpora store per in-link)."""
    return _ANCHOR_RE.findall(body_decode(html))


def html_extract_title(html: bytes | str) -> str:
    m = _TITLE_RE.search(body_decode(html))
    return _TAG_RE.sub("", m.group(1)) if m else ""


def html_extract_text(html: bytes | str) -> str:
    """THE byte-identity function (BASELINE.json:15): title + paragraph
    texts, newline-joined, inner tags stripped.  The corpus generator writes
    its golden ``text`` column from the page template independently; this
    parser must reproduce it byte-for-byte from ``html``."""
    doc = body_decode(html)
    parts: list[str] = []
    m = _TITLE_RE.search(doc)
    if m:
        parts.append(_TAG_RE.sub("", m.group(1)))
    for p in _PARA_RE.findall(doc):
        parts.append(_TAG_RE.sub("", p))
    return "\n".join(parts)


def extract_hrefs_batch(htmls) -> tuple:
    """Vectorized batch form of ``html_extract_links``: one Arrow
    split_pattern pass over the whole column instead of a Python regex
    per page.  Returns (hrefs: pa.Array<string>, parent: np.ndarray of
    row indices into the input), hrefs in document order per row --
    exactly _HREF_RE's matches (split pieces without a closing quote or
    with an empty href are dropped, mirroring the regex).

    Falls back to the per-row path for batches that fail utf-8 cast
    (binary html is decoded errors=replace there); generated corpora
    and real WARC payloads cast clean."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        doc = pc.cast(htmls, pa.string())
    except pa.ArrowInvalid:
        hrefs, parent = [], []
        for i, h in enumerate(htmls.to_pylist()):
            for href in html_extract_links(h or b""):
                hrefs.append(href)
                parent.append(i)
        return pa.array(hrefs, pa.string()), np.asarray(parent, np.int64)

    parts = pc.split_pattern(pc.fill_null(doc, ""), pattern='href="')
    flat = pc.list_flatten(parts)
    parent_all = pc.list_parent_indices(parts).to_numpy(
        zero_copy_only=False)
    ll = pc.list_value_length(parts).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    total = int(ll.sum())
    keep = np.ones(total, bool)
    starts = np.cumsum(ll) - ll
    keep[starts[ll > 0]] = False   # piece 0 of each row precedes any href
    flat = flat.filter(pa.array(keep))
    parent = parent_all[keep]
    # href = text up to the closing quote; pieces without one (regex
    # would not match) and empty hrefs ([^"]+ is non-empty) drop
    cut = pc.split_pattern(flat, pattern='"', max_splits=1)
    has_quote = pc.equal(pc.list_value_length(cut), 2).to_numpy(
        zero_copy_only=False)
    hrefs = pc.list_element(cut, 0)
    nonempty = pc.greater(pc.utf8_length(hrefs), 0).to_numpy(
        zero_copy_only=False)
    m = has_quote & nonempty
    return hrefs.filter(pa.array(m)), parent[m]
