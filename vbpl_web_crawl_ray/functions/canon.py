"""RFC-3986 URL canonicalization + 64-bit URL hashing.

The reference never canonicalizes URLs — it relies on portal-issued integer
ItemIDs as natural keys (reference app/service/vbpl.py:29,140). The engine's
URL-seen membership (north_rule) instead keys on
``hash64(canonicalize(url))``: scheme/host lowercased, default ports
stripped, dot-segments resolved, percent-encoding normalized (unreserved
chars decoded, remaining escapes uppercased), fragment dropped, empty path
normalized to "/". The doubled-extension repair mirrors the reference's
``clean_extension`` (reference app/service/get_pdf.py:97-102).
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit, urlunsplit

import numpy as np

from .hashing import hash64

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
# RFC 3986 unreserved + sub-delims + ':@/' stay literal in paths
_PATH_SAFE = "/:@!$&'()*+,;=~-._"
_QUERY_SAFE = "=&:@!$'()*+,;/?~-._"
_DOUBLED_EXT = re.compile(r"\.\.(docx?|pdf)$")


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def clean_extension(path: str) -> str:
    """Repair doubled extensions like ``x..pdf`` -> ``x.pdf``
    (semantics of reference app/service/get_pdf.py:97-102)."""
    return _DOUBLED_EXT.sub(r".\1", path)


# fast path: URLs already in canonical form pass through untouched. The
# precheck accepts ONLY strings the slow path maps to themselves: lowercase
# scheme+host, no port/userinfo/fragment/percent-escapes, path chars within
# the quote() safe set, and no "." / ".." segments (the "/." exclusion is
# conservative — /.well-known falls to the slow path, which is merely
# slower, never wrong). Frontier offers are ~all already-canonical, so this
# removes the urlsplit+quote round trip from the hot path.
_FAST_CANON = re.compile(
    r"^https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
    r"/[A-Za-z0-9/:@!$&'()*+,;=~\-._]*"
    r"(?:\?[A-Za-z0-9/:@!$&'()*+,;=~\-._?]*)?$")


def canonicalize_url(url: str) -> str:
    """RFC-3986 normalize one URL (scalar; batch via :func:`canonicalize_urls`)."""
    url = url.strip()
    if _FAST_CANON.match(url) and ".." not in url and "/." not in url:
        return url
    return _canonicalize_slow(url)


def _canonicalize_slow(url: str) -> str:
    """Full normalization path; the fast-path precheck must only accept
    fixed points of THIS function (property-tested)."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    # percent-normalize: decode everything, re-encode minimally (uppercase escapes)
    path = quote(unquote(path), safe=_PATH_SAFE)
    path = _remove_dot_segments(path)
    path = clean_extension(path)
    query = quote(unquote(parts.query), safe=_QUERY_SAFE) if parts.query else ""
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment dropped


def canonicalize_urls(urls) -> np.ndarray:
    """Canonicalize an array of URLs. URL parsing is inherently per-string;
    this is the batch entry point used inside ``map_batches``."""
    return np.array([canonicalize_url(u) for u in urls], dtype=object)


def url_hash64(urls) -> np.ndarray:
    """uint64 identity of canonicalized URLs — the frontier/seen-filter key."""
    return hash64(canonicalize_urls(urls))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def hosts_of(urls) -> np.ndarray:
    return np.array([host_of(u) for u in urls], dtype=object)
