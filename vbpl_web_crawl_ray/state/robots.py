"""robots.txt parsing + rule cache (north_rule politeness component).

The reference has NO robots handling (SURVEY.md §4) — its politeness is
hard-coded sleeps (app/service/vbpl.py:181,701,801). The engine reads
Disallow prefixes and Crawl-delay per host and enforces both in the
frontier, falling back to a configured default delay.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class RobotsRules:
    disallow: tuple[str, ...]
    crawl_delay: float | None

    def allows(self, path: str) -> bool:
        return not any(path.startswith(p) for p in self.disallow)


_DISALLOW = re.compile(r"^Disallow:\s*(\S+)", re.M | re.I)
_DELAY = re.compile(r"^Crawl-delay:\s*([\d.]+)", re.M | re.I)

ALLOW_ALL = RobotsRules(disallow=(), crawl_delay=None)


def parse_robots(body: bytes | str) -> RobotsRules:
    text = body.decode() if isinstance(body, bytes) else body
    delays = _DELAY.findall(text)
    return RobotsRules(
        disallow=tuple(_DISALLOW.findall(text)),
        crawl_delay=float(delays[0]) if delays else None,
    )
