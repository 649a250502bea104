"""Crawl-round driver: frontier drain -> fetch -> parse -> expand, looped to
frontier exhaustion (the engine form of the reference's phase loop,
app/service/vbpl.py:95-114, re-expressed per SURVEY.md §3.1).

Each round is ONE streaming Ray Data pass over the popped URL batch:

    from_items(pops) -> map_batches(FetchStage) -> map_batches(ParseStage)
                     -> write_parquet out_dir/payload/round={r}
    links            -> frontier.stage() (hash(host)-routed), committed
                        at the round barrier as a sorted union
    edges/meta/sections/failures/retries -> RoundCollector actor ->
                        per-round parquet + lineage counters

Rounds are the determinism barrier (the reference's three phase barriers):
crawl order is a pure function of the link graph at every parallelism
level, so an 8-CPU and a 32-CPU run produce identical crawl logs and
URL-seen sets. Checkpoints are written between rounds — per-partition
frontier snapshots + Bloom filters + metrics + the crawl log, committed by
an atomic manifest (north_rule resumability).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources.simweb import SimWeb, SimWebConfig
from ..stages.fetch import FetchStage
from ..stages.parse import PAYLOAD_SCHEMA, ParseStage
from ..state.frontier import FrontierPartition, partition_of

PAYLOAD_COLS = [f.name for f in PAYLOAD_SCHEMA]
EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string()),
                         ("label", pa.string())])
META_SCHEMA = pa.schema([("doc_id", pa.string()),
                         ("serial_number", pa.string()),
                         ("issuance_date", pa.string()),
                         ("doc_type", pa.string()),
                         ("issuing_authority", pa.string()),
                         ("title", pa.string())])
SECTION_SCHEMA = pa.schema([("vbpl_id", pa.string()),
                            ("section_number", pa.int32()),
                            ("section_name", pa.string()),
                            ("section_content", pa.string()),
                            ("chapter_number", pa.string()),
                            ("chapter_name", pa.string())])
ANLE_SECTION_SCHEMA = pa.schema([("anle_id", pa.string()),
                                 ("context", pa.string()),
                                 ("solution", pa.string()),
                                 ("content", pa.string())])
LOG_SCHEMA = pa.schema([
    ("pop_seq", pa.int64()), ("fetch_time", pa.float64()),
    ("host", pa.string()), ("depth", pa.int32()),
    ("discovery_order", pa.int64()), ("url", pa.string()),
])


@ray.remote(num_cpus=0)
class FrontierActor(FrontierPartition):
    """Control-plane actor: num_cpus=0 so P frontier partitions never
    starve the data-plane tasks of CPU slots (their work is short
    bookkeeping bursts, not sustained compute)."""

    def __init__(self, partition_id: int, num_partitions: int,
                 cfg: SimWebConfig, **kw):
        web = SimWeb(cfg)
        super().__init__(partition_id, num_partitions,
                         robots_fetch=web.get, **kw)


class _StatelessStage:
    """Task-mode wrapper: constructs the stage lazily once per worker
    process (cached on self after Ray's function-export ships it once)."""

    def __init__(self, stage_cls, cfg, **kw):
        self.stage_cls, self.cfg, self.kw = stage_cls, cfg, kw
        self._stage = None

    def __call__(self, batch):
        if self._stage is None:
            self._stage = self.stage_cls(self.cfg, **self.kw)
        return self._stage(batch)


@ray.remote(num_cpus=0)
class RoundCollector:
    """Per-round sink for small control data (edges, fetch failures, doc
    metadata) pushed by parse tasks; drained by the driver at the round
    barrier."""

    def __init__(self):
        self.edges: list[tuple] = []
        self.fails: list[tuple] = []
        self.metas: list[tuple] = []
        self.sections: list[tuple] = []
        self.anle_sections: list[tuple] = []
        self.retried = 0

    def add(self, edges: list[tuple], fails: list[tuple],
            metas: list[tuple] = (), sections: list[tuple] = (),
            anle_sections: list[tuple] = (), retried: int = 0) -> None:
        self.edges.extend(tuple(e) for e in edges)
        self.fails.extend(tuple(f) for f in fails)
        self.metas.extend(tuple(m) for m in metas)
        self.sections.extend(tuple(s) for s in sections)
        self.anle_sections.extend(tuple(s) for s in anle_sections)
        self.retried += retried

    def drain(self) -> tuple[list, list, list, list, list, int]:
        out = (self.edges, self.fails, self.metas, self.sections,
               self.anle_sections, self.retried)
        self.edges, self.fails, self.metas = [], [], []
        self.sections, self.anle_sections = [], []
        self.retried = 0
        return out


class CrawlEngine:
    def __init__(self, cfg: SimWebConfig, out_dir: str, num_partitions: int = 4,
                 fetch_concurrency: int | tuple = 2,
                 parse_concurrency: int | tuple = 2,
                 batch_size: int = 64, max_per_host_per_round: int | None = None,
                 default_delay: float = 1.0, bloom_capacity: int = 1_000_000,
                 track_seen: bool = False, use_actors: bool = True,
                 allow_deletions: bool = False, real_time: bool = False):
        self.cfg = cfg
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.fetch_concurrency = fetch_concurrency
        self.parse_concurrency = parse_concurrency
        self.batch_size = batch_size
        # use_actors=True: fetch/parse as actor pools (real crawlers hold
        # connection pools / models per worker). use_actors=False: stateless
        # task stages — when per-actor state is trivial (the hermetic sim),
        # tasks reuse warm workers and Ray Data fuses the fetch->parse chain
        # into one pass, removing per-round pool-startup latency.
        self.use_actors = use_actors
        self.max_per_host = max_per_host_per_round
        self.real_time = real_time
        self.crawl_t0: float | None = None
        self.allow_deletions = allow_deletions
        self.track_seen = track_seen
        self.actors = [
            FrontierActor.remote(i, num_partitions, cfg,
                                 default_delay=default_delay,
                                 capacity=bloom_capacity, track_seen=track_seen,
                                 allow_deletions=allow_deletions)
            for i in range(num_partitions)
        ]
        self.collector = RoundCollector.remote()
        self.round = 0
        self.crawl_log: list[tuple] = []
        self.fail_log: list[tuple] = []
        # north_rule lineage: fetched / retried / failed counters (the
        # frontier actors carry offered/deduped/robots_blocked/queued)
        self.lineage = {"fetched": 0, "retried": 0, "failed": 0}
        os.makedirs(out_dir, exist_ok=True)

    # ---- seeding / offering ----

    def _offer(self, records: list[tuple[str, int, int]]) -> None:
        """Route (url, depth, discovery_order) records to their partition.
        Pre-sorted ascending (depth, order, url) so that Bloom first-wins
        == min-discovery-order-wins, at any parallelism."""
        records = sorted(set(records), key=lambda r: (r[1], r[2], r[0]))
        buckets: list[list] = [[] for _ in self.actors]
        for rec in records:
            buckets[partition_of(rec[0], self.num_partitions)].append(rec)
        ray.get([a.offer.remote(b) for a, b in zip(self.actors, buckets) if b])

    def seed(self, urls: list[str]) -> None:
        self._offer([(u, 0, i) for i, u in enumerate(urls)])

    def forget(self, urls: list[str]) -> int:
        """Unlearn URLs (cuckoo-filter partitions only) so a follow-up
        seed/offer re-crawls them — expired-document refresh."""
        buckets: list[list] = [[] for _ in self.actors]
        for u in urls:
            buckets[partition_of(u, self.num_partitions)].append(u)
        return sum(ray.get([a.forget.remote(b)
                            for a, b in zip(self.actors, buckets) if b]))

    # ---- one crawl round ----

    def run_round(self) -> bool:
        pops = ray.get([a.pop_round.remote(self.max_per_host) for a in self.actors])
        merged = sorted(t for part in pops for t in part)
        if not merged:
            return False
        base = len(self.crawl_log)
        self.crawl_log.extend(
            (base + i, t, h, d, o, u) for i, (t, h, d, o, u) in enumerate(merged))

        records = [{"url": u, "host": h, "depth": d, "discovery_order": o,
                    "fetch_time": t} for (t, h, d, o, u) in merged]
        n_blocks = max(1, len(records) // self.batch_size)
        parse_kw = {"frontier_handles": self.actors, "collector": self.collector}
        fetch_kw = {"cfg": self.cfg}
        if self.real_time:
            import time as _time
            if self.crawl_t0 is None:
                self.crawl_t0 = _time.time()
            fetch_kw["real_time_t0"] = self.crawl_t0
        ds = rd.from_items(records, override_num_blocks=n_blocks)
        if self.use_actors:
            ds = (ds.map_batches(FetchStage, batch_format="pyarrow",
                                 batch_size=self.batch_size,
                                 fn_constructor_kwargs=fetch_kw,
                                 concurrency=self.fetch_concurrency)
                    .map_batches(ParseStage, batch_format="pyarrow",
                                 batch_size=self.batch_size,
                                 fn_constructor_kwargs={"cfg": self.cfg,
                                                        **parse_kw},
                                 concurrency=self.parse_concurrency))
        else:
            ds = (ds.map_batches(_StatelessStage(FetchStage, self.cfg,
                                                 **{k: v for k, v in
                                                    fetch_kw.items()
                                                    if k != "cfg"}),
                                 batch_format="pyarrow",
                                 batch_size=self.batch_size)
                    .map_batches(_StatelessStage(ParseStage, self.cfg, **parse_kw),
                                 batch_format="pyarrow",
                                 batch_size=self.batch_size))
        # ONE streaming pass: fetch -> parse -> payload parquet. Links/edges
        # are pushed to the frontier/collector actors by the parse tasks and
        # committed at the barrier below (deterministic sorted union).
        ds.write_parquet(f"{self.out_dir}/payload/round={self.round}")
        self.last_stats = ds.stats()   # per-stage wall/cpu breakdown

        edges, fails, metas, sections, anle_sections, retried = \
            ray.get(self.collector.drain.remote())
        self.lineage["fetched"] += len(records)
        self.lineage["retried"] += retried
        self.lineage["failed"] += len(set(fails))
        if edges:
            edges = sorted(set(edges))
            os.makedirs(f"{self.out_dir}/edges/round={self.round}", exist_ok=True)
            pq.write_table(
                pa.table({"src": [e[0] for e in edges],
                          "dst": [e[1] for e in edges],
                          "label": [e[2] for e in edges]}, schema=EDGE_SCHEMA),
                f"{self.out_dir}/edges/round={self.round}/edges.parquet")
        if metas:
            metas = sorted(set(metas))
            os.makedirs(f"{self.out_dir}/meta/round={self.round}", exist_ok=True)
            cols = list(zip(*metas))
            pq.write_table(
                pa.table({f.name: pa.array(list(c), f.type)
                          for f, c in zip(META_SCHEMA, cols)}),
                f"{self.out_dir}/meta/round={self.round}/meta.parquet")
        for name, rows, schema in (("sections", sections, SECTION_SCHEMA),
                                   ("anle_sections", anle_sections,
                                    ANLE_SECTION_SCHEMA)):
            if rows:
                rows = sorted(set(rows))
                d = f"{self.out_dir}/{name}/round={self.round}"
                os.makedirs(d, exist_ok=True)
                cols = list(zip(*rows))
                pq.write_table(
                    pa.table({f.name: pa.array(list(c), f.type)
                              for f, c in zip(schema, cols)}),
                    f"{d}/{name}.parquet")
        self.fail_log.extend(sorted(set(fails)))
        ray.get([a.commit.remote() for a in self.actors])
        self.round += 1
        return True

    def run(self, max_rounds: int = 64, checkpoint_dir: str | None = None) -> int:
        while self.round < max_rounds and self.run_round():
            if checkpoint_dir:
                self.checkpoint(checkpoint_dir)
        return self.round

    def run_refresh_cycles(self, seed_urls: list[str], cycles: int,
                           max_rounds_per_cycle: int = 64) -> int:
        """The reference's outer refresh loop (main.py:13-20: re-crawl the
        whole corpus forever, idempotent upserts absorbing the replay).
        Requires allow_deletions + track_seen: each cycle forgets the
        previous cycle's seen set (cuckoo unlearn), re-seeds, and drains.
        Output rounds keep accumulating; the upsert sink collapses them
        last-write-wins. Returns total rounds run."""
        if not self.allow_deletions or not self.track_seen:
            raise RuntimeError(
                "refresh cycles need allow_deletions=True (cuckoo unlearn) "
                "and track_seen=True (the set to forget)")
        total = 0
        for cycle in range(cycles):
            if cycle > 0:
                seen = sorted(self.seen_urls())
                if seen:
                    self.forget(seen)
            self.seed(seed_urls)
            before = self.round
            self.run(max_rounds=self.round + max_rounds_per_cycle)
            total += self.round - before
        return total

    # ---- introspection ----

    def metrics(self) -> dict:
        per_part = ray.get([a.get_metrics.remote() for a in self.actors])
        total = {k: sum(m[k] for m in per_part) for k in per_part[0]}
        total.update(self.lineage)
        return {"total": total, "partitions": per_part,
                "rounds": self.round}

    def seen_urls(self) -> set[str]:
        parts = ray.get([a.get_seen_urls.remote() for a in self.actors])
        return set(u for p in parts for u in p)

    def crawl_log_table(self) -> pa.Table:
        cols = list(zip(*self.crawl_log)) if self.crawl_log else [[]] * 6
        return pa.table(
            {f.name: pa.array(list(c), f.type)
             for f, c in zip(LOG_SCHEMA, cols)})

    # ---- checkpoint / resume (north_rule) ----

    def checkpoint(self, ckpt_dir: str) -> None:
        rdir = os.path.join(ckpt_dir, f"round_{self.round:04d}")
        os.makedirs(rdir, exist_ok=True)
        snaps = ray.get([a.snapshot.remote() for a in self.actors])
        for i, blob in enumerate(snaps):
            with open(os.path.join(rdir, f"part_{i}.pkl"), "wb") as f:
                f.write(blob)
        pq.write_table(self.crawl_log_table(), os.path.join(rdir, "crawl_log.parquet"))
        # manifest last = atomic commit of the checkpoint
        tmp = os.path.join(ckpt_dir, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump({"round": self.round,
                       "num_partitions": self.num_partitions,
                       "lineage": self.lineage}, f)
        os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))

    @classmethod
    def resume(cls, ckpt_dir: str, cfg: SimWebConfig, out_dir: str,
               **engine_kw) -> "CrawlEngine":
        with open(os.path.join(ckpt_dir, "manifest.json")) as f:
            manifest = json.load(f)
        eng = cls(cfg, out_dir,
                  num_partitions=manifest["num_partitions"], **engine_kw)
        rdir = os.path.join(ckpt_dir, f"round_{manifest['round']:04d}")
        blobs = []
        for i in range(manifest["num_partitions"]):
            with open(os.path.join(rdir, f"part_{i}.pkl"), "rb") as f:
                blobs.append(f.read())
        ray.get([a.restore.remote(b) for a, b in zip(eng.actors, blobs)])
        log = pq.read_table(os.path.join(rdir, "crawl_log.parquet"))
        eng.crawl_log = [tuple(r.values()) for r in log.to_pylist()]
        eng.round = manifest["round"]
        eng.lineage = manifest.get("lineage", dict(eng.lineage))
        return eng
