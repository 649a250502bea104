"""Parse stage: config-driven extraction from fetched pages.

The engine analogue of the reference's BeautifulSoup parsers, re-expressed
as regex-dict extractor configs (the U1 extension surface, SURVEY.md §2.9;
reference regex dicts app/service/vbpl.py:610-618, 542-548,
app/service/anle.py:75-84).

Dataflow shape: the parse stage's DATASET output is the payload table only
(input_hint schema) so the round pipeline streams from_items -> fetch ->
parse -> write_parquet in ONE pass with no mid-round materialization.
Discovered links and edges are small control data: they are pushed to the
hash(host)-routed frontier partition actors (``stage``) and a per-round
collector actor, then committed at the round barrier — the commit sorts
the round's union by (depth, discovery_order, url), so frontier state is a
pure function of the link graph, not of task arrival order.

Attachment downloads happen INLINE within the doc parse (the reference's
per-doc stage chain downloads PDFs inside the doc loop — M11,
app/service/vbpl.py:990-1050), so payload rows are complete without a join.

discovery_order of a child = parent_order * 4096 + (1 + position), making
crawl order deterministic at any parallelism (reference semantics: pages
ascending, rows in page order — SURVEY.md §2.6 O3).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa
import ray

from ..sources.imaging import decode_image, phash64
from ..sources.simweb import SimWeb, SimWebConfig
from ..state.frontier import partition_of

# ---- extractor configs (U1): field -> regex with one capture group ----

DOC_ATTR_CONFIG = {
    "serial_number": r"<tr><td>Số ký hiệu</td><td>(.*?)</td></tr>",
    "issuance_date": r"<tr><td>Ngày ban hành</td><td>(.*?)</td></tr>",
    "doc_type": r"<tr><td>Loại văn bản</td><td>(.*?)</td></tr>",
    "issuing_authority": r"<tr><td>Cơ quan ban hành</td><td>(.*?)</td></tr>",
}

CAPTION_RE = re.compile(r'<td class="title">(.*?)</td>', re.S)
NEXT_RE = re.compile(r'<a class="next" href="([^"]+)">')
IMG_RE = re.compile(r'<img class="payload" src="([^"]+)"')
HREF_RE = re.compile(r'href="([^"]+)"')
EDGE_RE = re.compile(
    r'<li class="related"><a href="/doc\.aspx\?ItemID=(\d+)">.*?'
    r'<span class="doc-type">(.*?)</span>', re.S)
ITEMID_RE = re.compile(r"ItemID=(\d+)")

ORDER_STRIDE = 4096  # child order = parent * STRIDE + position; depth<=4 safe

PAYLOAD_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


def extract_attributes(body: str, config: dict[str, str]) -> dict[str, str | None]:
    """Config-driven attribute extraction (M2/M3/M4 pattern)."""
    out = {}
    for field, pattern in config.items():
        m = re.search(pattern, body)
        out[field] = m.group(1).strip() if m else None
    return out


class ParseStage:
    """Stateful parse stage: compiled configs + inline-attachment client
    built once (__init__), batch work in __call__, link/edge push to the
    frontier/collector actors with delivery confirmed before the batch
    returns (so the round-barrier commit sees everything)."""

    def __init__(self, cfg: SimWebConfig, frontier_handles=None,
                 collector=None, max_retries: int = 3):
        self.web = SimWeb(cfg)
        self.max_retries = max_retries
        self.frontier = list(frontier_handles or [])
        self.collector = collector
        self.attr_config = {k: re.compile(v) for k, v in DOC_ATTR_CONFIG.items()}

    # ---- helpers ----

    def _fetch_inline(self, url: str) -> tuple[int, bytes]:
        status, _, body = self.web.get(url, attempt=0)
        r = 0
        while status >= 500 and r < self.max_retries:
            r += 1
            status, _, body = self.web.get(url, attempt=r)
        return status, body

    def _parse_listing(self, rec: dict, body: str, links: list) -> None:
        next_m = NEXT_RE.search(body)
        next_href = next_m.group(1) if next_m else None
        for pos, href in enumerate(HREF_RE.findall(body), 1):
            if href == next_href:
                # pagination is a SIBLING, not a child: same depth,
                # order+1 — keeps pages ascending (reference O3) and the
                # order key bounded on arbitrarily long page chains
                links.append((urljoin(rec["url"], href), rec["depth"],
                              rec["discovery_order"] + 1))
            else:
                links.append((urljoin(rec["url"], href), rec["depth"] + 1,
                              rec["discovery_order"] * ORDER_STRIDE + pos))

    def _parse_doc(self, rec: dict, body: str, links: list, edges: list,
                   payload_rows: list, metas: list) -> None:
        doc_id = int(ITEMID_RE.search(rec["url"]).group(1))
        caption_m = CAPTION_RE.search(body)
        caption = caption_m.group(1) if caption_m else None
        # M2-style attribute extraction (config-driven regex dict) + date
        # parse with None-on-failure (reference vbpl.py:577-652)
        attrs = {k: (m.group(1).strip() if (m := rx.search(body)) else None)
                 for k, rx in self.attr_config.items()}
        from ..functions.text import dmy_to_iso
        metas.append((str(doc_id), attrs["serial_number"],
                      dmy_to_iso(attrs["issuance_date"]),
                      attrs["doc_type"], attrs["issuing_authority"], caption))
        img_m = IMG_RE.search(body)
        if img_m:
            img_url = urljoin(rec["url"], img_m.group(1))
            status, data = self._fetch_inline(img_url)
            if status == 200 and data:
                px = decode_image(data)
                h, w = px.shape
                payload_rows.append({
                    "image_id": f"img{doc_id:08d}", "bytes": data,
                    "w": w, "h": h, "fmt": img_url.rsplit(".", 1)[-1],
                    "caption": caption,
                    "phash": int(np.uint64(phash64(px)).astype(np.int64)),
                })
        for pos, (dst_id, label) in enumerate(EDGE_RE.findall(body), 1):
            edges.append((str(doc_id), dst_id, label))
            links.append((urljoin(rec["url"], f"/doc.aspx?ItemID={dst_id}"),
                          rec["depth"] + 1,
                          rec["discovery_order"] * ORDER_STRIDE + pos))

    # ---- batch entry ----

    def __call__(self, batch: pa.Table) -> pa.Table:
        links: list[tuple] = []
        edges: list[tuple] = []
        fails: list[tuple] = []
        metas: list[tuple] = []
        payload_rows: list[dict] = []
        for rec in batch.to_pylist():
            if rec["status"] != 200:
                fails.append((rec["url"], rec["status"]))
                continue
            body = rec["body"].decode()
            if "/listing.aspx" in rec["url"]:
                self._parse_listing(rec, body, links)
            elif "/doc.aspx" in rec["url"]:
                self._parse_doc(rec, body, links, edges, payload_rows, metas)
        # push control data; ray.get ensures delivery before the batch ends
        pending = []
        if self.frontier and links:
            buckets: dict[int, list] = {}
            for rec in links:
                buckets.setdefault(
                    partition_of(rec[0], len(self.frontier)), []).append(rec)
            pending += [self.frontier[p].stage.remote(b)
                        for p, b in buckets.items()]
        if self.collector is not None and (edges or fails or metas):
            pending.append(self.collector.add.remote(edges, fails, metas))
        if pending:
            ray.get(pending)
        if not payload_rows:
            return PAYLOAD_SCHEMA.empty_table()
        return pa.Table.from_pylist(payload_rows, schema=PAYLOAD_SCHEMA)
