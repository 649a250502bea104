"""Parse stage: config-driven extraction from fetched pages.

The engine analogue of the reference's BeautifulSoup parsers, re-expressed
as regex-dict extractor configs (the U1 extension surface, SURVEY.md §2.9;
reference regex dicts app/service/vbpl.py:610-618, 542-548,
app/service/anle.py:75-84). One map_batches stage consumes fetched Arrow
batches and emits a UNIFIED row stream discriminated by ``kind``:

  kind='payload'  image+caption payload row (input_hint schema)
  kind='edge'     related-document edge (src, dst, label) — FIXTURES F4
  kind='link'     discovered frontier candidate (out_url, out_depth, out_order)
  kind='fail'     terminal fetch failure (status kept for lineage)

Attachment downloads happen INLINE within the doc parse (the reference's
per-doc stage chain downloads PDFs inside the doc loop — M11,
app/service/vbpl.py:990-1050), so payload rows are complete without a join.

discovery_order of a child = parent_order * 4096 + (1 + position). This
makes crawl order a pure function of the link graph (reference semantics:
pages ascending, rows in page order — SURVEY.md §2.6 O3), independent of
arrival timing and parallelism.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa

from ..sources.imaging import decode_image, phash64
from ..sources.simweb import SimWeb, SimWebConfig

# ---- extractor configs (U1): field -> regex with one capture group ----

DOC_ATTR_CONFIG = {
    "serial_number": r"<tr><td>Số ký hiệu</td><td>(.*?)</td></tr>",
    "issuance_date": r"<tr><td>Ngày ban hành</td><td>(.*?)</td></tr>",
    "doc_type": r"<tr><td>Loại văn bản</td><td>(.*?)</td></tr>",
    "issuing_authority": r"<tr><td>Cơ quan ban hành</td><td>(.*?)</td></tr>",
}

CAPTION_RE = re.compile(r'<td class="title">(.*?)</td>', re.S)
IMG_RE = re.compile(r'<img class="payload" src="([^"]+)"')
HREF_RE = re.compile(r'href="([^"]+)"')
EDGE_RE = re.compile(
    r'<li class="related"><a href="/doc\.aspx\?ItemID=(\d+)">.*?'
    r'<span class="doc-type">(.*?)</span>', re.S)
ITEMID_RE = re.compile(r"ItemID=(\d+)")

ORDER_STRIDE = 4096  # child order = parent * STRIDE + position; depth<=4 safe

PARSE_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("discovery_order", pa.int64()),
    ("fetch_time", pa.float64()),
    ("status", pa.int32()),
    ("retries", pa.int32()),
    # payload columns (input_hint schema)
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    # edge columns
    ("src", pa.string()),
    ("dst", pa.string()),
    ("label", pa.string()),
    # link columns
    ("out_url", pa.string()),
    ("out_depth", pa.int32()),
    ("out_order", pa.int64()),
])


def extract_attributes(body: str, config: dict[str, str]) -> dict[str, str | None]:
    """Config-driven attribute extraction (M2/M3/M4 pattern)."""
    out = {}
    for field, pattern in config.items():
        m = re.search(pattern, body)
        out[field] = m.group(1).strip() if m else None
    return out


class ParseStage:
    """Stateful parse actor: compiled configs + an inline-attachment client
    built once per actor (__init__), batch work in __call__."""

    def __init__(self, cfg: SimWebConfig, max_retries: int = 3):
        self.web = SimWeb(cfg)
        self.max_retries = max_retries
        self.attr_config = {k: re.compile(v) for k, v in DOC_ATTR_CONFIG.items()}

    # ---- helpers ----

    def _fetch_inline(self, url: str) -> tuple[int, bytes]:
        status, _, body = self.web.get(url, attempt=0)
        r = 0
        while status >= 500 and r < self.max_retries:
            r += 1
            status, _, body = self.web.get(url, attempt=r)
        return status, body

    def _base_row(self, rec: dict) -> dict:
        row = {f.name: None for f in PARSE_SCHEMA}
        row.update(url=rec["url"], host=rec["host"], depth=rec["depth"],
                   discovery_order=rec["discovery_order"],
                   fetch_time=rec["fetch_time"], status=rec["status"],
                   retries=rec["retries"])
        return row

    def _parse_listing(self, rec: dict, body: str, rows: list) -> None:
        pos = 0
        for href in HREF_RE.findall(body):
            pos += 1
            row = self._base_row(rec)
            row.update(kind="link", out_url=urljoin(rec["url"], href),
                       out_depth=rec["depth"] + 1,
                       out_order=rec["discovery_order"] * ORDER_STRIDE + pos)
            rows.append(row)

    def _parse_doc(self, rec: dict, body: str, rows: list) -> None:
        doc_id = int(ITEMID_RE.search(rec["url"]).group(1))
        caption_m = CAPTION_RE.search(body)
        caption = caption_m.group(1) if caption_m else None
        img_m = IMG_RE.search(body)
        if img_m:
            img_url = urljoin(rec["url"], img_m.group(1))
            status, data = self._fetch_inline(img_url)
            if status == 200 and data:
                px = decode_image(data)
                h, w = px.shape
                row = self._base_row(rec)
                row.update(kind="payload", image_id=f"img{doc_id:08d}",
                           bytes=data, w=w, h=h,
                           fmt=img_url.rsplit(".", 1)[-1], caption=caption,
                           phash=int(np.uint64(phash64(px)).astype(np.int64)))
                rows.append(row)
        pos = 0
        for dst_id, label in EDGE_RE.findall(body):
            pos += 1
            edge = self._base_row(rec)
            edge.update(kind="edge", src=str(doc_id), dst=dst_id, label=label)
            rows.append(edge)
            link = self._base_row(rec)
            link.update(kind="link",
                        out_url=urljoin(rec["url"], f"/doc.aspx?ItemID={dst_id}"),
                        out_depth=rec["depth"] + 1,
                        out_order=rec["discovery_order"] * ORDER_STRIDE + pos)
            rows.append(link)

    # ---- batch entry ----

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for rec in batch.to_pylist():
            if rec["status"] != 200:
                row = self._base_row(rec)
                row["kind"] = "fail"
                rows.append(row)
                continue
            body = rec["body"].decode()
            if "/listing.aspx" in rec["url"]:
                self._parse_listing(rec, body, rows)
            elif "/doc.aspx" in rec["url"]:
                self._parse_doc(rec, body, rows)
        if not rows:
            return PARSE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PARSE_SCHEMA)
