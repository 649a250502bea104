"""Real HTTP transport behind the FetchStage client seam.

The reference opens one aiohttp ClientSession PER REQUEST
(app/service/vbpl.py:55-72) and swallows errors into None returns
(vbpl.py:69-72). This transport is the production counterpart of the
hermetic SimWeb: one pooled keep-alive ``requests.Session`` per actor
(built once in FetchStage.__init__ via ``client_factory``), the same
``get(url, attempt) -> (status, content_type, body)`` contract, and
errors surfaced as status codes instead of exceptions so the retry /
fails-table machinery treats live HTTP exactly like the sim.

Contract details the crawl relies on (stages/parse.py:621-628):
- Redirects (301/302/303/307/308) are NOT auto-followed; ``body``
  carries the Location target (the frontier re-offers it through the
  seen filter, so a target that is also linked directly is fetched
  once).
- Transport-level failures (DNS, refused, timeout) come back as status
  599 with an empty body — they land in the fails table and consume the
  bounded retry budget like a 5xx.
- An oversized body (``max_body_bytes`` cap) comes back as status 598
  with an empty body: NON-retryable (FetchStage skips the backoff loop
  for it — re-downloading can't shrink the response), and the fails
  table can tell 'too large' (598) from a transport failure (599).

The import is attempted lazily at construction: the class exists (and
is unit-referenceable) even in containers without ``requests``.
"""

from __future__ import annotations

DEFAULT_UA = ("Mozilla/5.0 (compatible; vbpl-web-crawl-ray/1.0; "
              "+https://example.invalid/bot)")


class HttpTransport:
    """Pooled-session HTTP client matching SimWeb's ``get`` contract."""

    def __init__(self, timeout: float = 30.0, user_agent: str = DEFAULT_UA,
                 max_body_bytes: int = 64 * 1024 * 1024):
        import requests  # lazy: keeps module importable without the lib

        self._rq = requests
        self.session = requests.Session()  # keep-alive pool, once per actor
        self.session.headers["User-Agent"] = user_agent
        self.timeout = timeout
        self.max_body_bytes = max_body_bytes

    def get(self, url: str, attempt: int = 0) -> tuple[int, str, bytes]:
        """One GET. ``attempt`` is accepted for contract parity with the
        SimWeb (whose flakiness is a function of it); a live server's
        behavior across retries is its own business."""
        try:
            r = self.session.get(url, timeout=self.timeout,
                                 allow_redirects=False, stream=True)
        except self._rq.RequestException:
            return 599, "", b""
        try:
            if r.status_code in (301, 302, 303, 307, 308):
                return r.status_code, "", (r.headers.get("Location")
                                           or "").encode()
            ctype = (r.headers.get("Content-Type") or "").split(";")[0].strip()
            # chunked read with the cap enforced on DECODED bytes as they
            # arrive: bounds memory against decompression bombs on every
            # urllib3 version (a single read(amt, decode_content=True) is
            # only amt-of-decoded-bytes on urllib3 2.x)
            chunks, total = [], 0
            for chunk in r.iter_content(chunk_size=1 << 20):
                total += len(chunk)
                if total > self.max_body_bytes:
                    return 598, ctype, b""   # oversized: refuse, don't OOM;
                    # distinct non-retryable code — retrying can't shrink it
                chunks.append(chunk)
            return r.status_code, ctype, b"".join(chunks)
        except Exception:
            # mid-body failures raise urllib3/http.client types that are
            # NOT requests.RequestException subclasses (ProtocolError,
            # ReadTimeoutError, IncompleteRead) — the 599 contract covers
            # every transport-level failure, so catch broadly here
            return 599, "", b""
        finally:
            r.close()
