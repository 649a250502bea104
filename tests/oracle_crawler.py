"""Single-threaded reference-ordering oracle crawler (FIXTURES.md F5).

Independent scheduling implementation (plain dicts/lists, no frontier code)
that the Ray engine must match exactly: rounds as barriers, per-host
(depth, discovery_order) priority, virtual politeness clock, robots
blocking, first-wins dedup on canonical URLs. Shares only the SimWeb and
the parse REGEXES with the engine — the control flow is re-derived here.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from vbpl_web_crawl_ray.functions.canon import canonicalize_url, host_of
from vbpl_web_crawl_ray.functions.fuzzy import ratio
from vbpl_web_crawl_ray.sources.imaging import decode_image, phash64
from vbpl_web_crawl_ray.sources.simweb import SimWeb
from vbpl_web_crawl_ray.stages.parse import (CAPTION_RE, EDGE_RE, HREF_RE,
                                             IMG_RE, ITEMID_RE, LUOCDO_RE,
                                             NEXT_RE, ORDER_STRIDE,
                                             SEARCH_RESULT_RE)
from vbpl_web_crawl_ray.state.robots import parse_robots


def oracle_crawl(cfg, max_per_host=None, default_delay=1.0, max_retries=3):
    web = SimWeb(cfg)
    robots = {}
    seen: set[str] = set()
    queues: dict[str, list] = {}
    next_free: dict[str, float] = {}
    log, payloads, edges, doc_map = [], {}, [], []
    blocked = deduped = 0

    def rules(host):
        if host not in robots:
            status, _, body = web.get(f"http://{host}/robots.txt")
            robots[host] = parse_robots(body) if status == 200 else None
        return robots[host]

    def offer_batch(cands):
        nonlocal blocked, deduped
        for url, depth, order in sorted(set(cands), key=lambda r: (r[1], r[2], r[0])):
            cu = canonicalize_url(url)
            if cu in seen:
                deduped += 1
                continue
            seen.add(cu)
            host = host_of(cu)
            r = rules(host)
            path = cu.split(host, 1)[1]
            if r and not r.allows(path):
                blocked += 1
                continue
            queues.setdefault(host, []).append((depth, order, cu))

    def fetch(url):
        status, ct, body = web.get(url, attempt=0)
        a = 0
        while status >= 500 and a < max_retries:
            a += 1
            status, ct, body = web.get(url, attempt=a)
        return status, body

    offer_batch([(u, 0, i) for i, u in enumerate(web.seed_urls())])

    while any(queues.values()):
        popped = []
        for host in sorted(queues):
            q = sorted(queues[host])
            n = len(q) if max_per_host is None else min(len(q), max_per_host)
            take, queues[host] = q[:n], q[n:]
            r = rules(host)
            delay = (r.crawl_delay if r and r.crawl_delay is not None
                     else default_delay)
            for depth, order, url in take:
                t = next_free.get(host, 0.0)
                next_free[host] = t + delay
                popped.append((t, host, depth, order, url))
        queues = {h: q for h, q in queues.items() if q}
        popped.sort()
        cands = []
        for t, host, depth, order, url in popped:
            log.append((t, host, depth, order, url))
            status, body = fetch(url)
            if status in (301, 302):
                # redirect target re-offered at the same priority
                cands.append((urljoin(url, body.decode()), depth, order))
                continue
            if status != 200:
                continue
            text = body.decode()
            if "/listing.aspx" in url:
                next_m = NEXT_RE.search(text)
                next_href = next_m.group(1) if next_m else None
                for pos, href in enumerate(HREF_RE.findall(text), 1):
                    if href == next_href:
                        cands.append((urljoin(url, href), depth, order + 1))
                    else:
                        cands.append((urljoin(url, href), depth + 1,
                                      order * ORDER_STRIDE + pos))
            elif "/doc.aspx" in url:
                doc_id = int(ITEMID_RE.search(url).group(1))
                m = IMG_RE.search(text)
                if m:
                    primary = urljoin(url, m.group(1))
                    s2, data, img_url = 404, b"", primary
                    for cand in (primary, primary.replace("/img/", "/img-alt/")):
                        s2, data = fetch(cand)
                        if s2 == 200 and data:
                            img_url = cand
                            break
                    if s2 == 200 and data:
                        px = decode_image(data)
                        cap = CAPTION_RE.search(text)
                        payloads[f"img{doc_id:08d}"] = {
                            "bytes": data, "w": px.shape[1], "h": px.shape[0],
                            "fmt": img_url.rsplit(".", 1)[-1],
                            "caption": cap.group(1) if cap else None,
                            "phash": phash64(px),
                        }
                edge_hits = EDGE_RE.findall(text)
                for pos, (dst, label) in enumerate(edge_hits, 1):
                    edges.append((str(doc_id), dst, label))
                    cands.append((urljoin(url, f"/doc.aspx?ItemID={dst}"),
                                  depth + 1, order * ORDER_STRIDE + pos))
                # second link phase: doc-map entries; ItemID-less hrefs
                # resolve via title search (independent re-derivation of
                # the engine's semantics)
                for i, (href, title, label) in enumerate(
                        LUOCDO_RE.findall(text), 1):
                    m = ITEMID_RE.search(href)
                    if m:
                        tgt = urljoin(url, f"/doc.aspx?ItemID={m.group(1)}")
                    else:
                        tgt = None
                        s2, sbody = fetch(href)
                        if s2 == 200:
                            for rt, turl, _blk in SEARCH_RESULT_RE.findall(
                                    sbody.decode()):
                                if turl and ratio(title, rt) >= 0.8:
                                    tgt = turl
                                    break
                    if tgt is None:
                        continue
                    doc_map.append((str(doc_id),
                                    ITEMID_RE.search(tgt).group(1), label))
                    cands.append((tgt, depth + 1,
                                  order * ORDER_STRIDE + len(edge_hits) + i))
        offer_batch(cands)

    return {"log": log, "seen": seen, "payloads": payloads,
            "edges": sorted(set(edges)), "doc_map": sorted(set(doc_map)),
            "robots_blocked": blocked}
