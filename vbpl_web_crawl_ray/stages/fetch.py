"""Fetch stage — stateful actor pool over Arrow batches of frontier pops.

The reference opens one aiohttp session per request (app/service/vbpl.py:60
— wasteful, SURVEY.md ST4) and retries only in the anle service (3 attempts,
exponential backoff 2**retry, app/service/anle.py:38-57). Here the client
(the SimWeb, standing in for a pooled HTTP session) is built ONCE per actor
in __init__, every URL gets the bounded retry budget, and failures become a
status column instead of being swallowed (the reference returns None and
crashes later — vbpl.py:69-72).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.simweb import SimWeb, SimWebConfig


class FetchStage:
    """map_batches(FetchStage, concurrency=N, fn_constructor_kwargs=...).

    Input batch columns: url, host, depth, discovery_order, fetch_time.
    Adds: status, content_type, body, retries.
    """

    def __init__(self, cfg: SimWebConfig, max_retries: int = 3):
        self.web = SimWeb(cfg)       # per-actor client, built once
        self.max_retries = max_retries

    def fetch_one(self, url: str) -> tuple[int, str, bytes, int]:
        retries = 0
        status, ctype, body = self.web.get(url, attempt=0)
        while status >= 500 and retries < self.max_retries:
            retries += 1
            # backoff 2**retry is virtual here (hermetic sim); a real client
            # would asyncio.sleep(2 ** retries)
            status, ctype, body = self.web.get(url, attempt=retries)
        return status, ctype, body, retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = [self.fetch_one(u) for u in batch["url"].to_pylist()]
        status, ctype, body, retries = zip(*results)
        return (batch
                .append_column("status", pa.array(status, pa.int32()))
                .append_column("content_type", pa.array(ctype, pa.string()))
                .append_column("body", pa.array(body, pa.binary()))
                .append_column("retries", pa.array(retries, pa.int32())))
