"""Crawl-round driver: frontier drain -> fetch -> parse -> expand, looped to
frontier exhaustion (the engine form of the reference's phase loop,
app/service/vbpl.py:95-114, re-expressed per SURVEY.md §3.1).

Each round is ONE streaming Ray Data pass over the popped URL set:

    from_arrow_refs(per-partition pop chunks)        # driver-free handoff
        -> map_batches(FetchStage) -> map_batches(ParseStage)
        -> write_parquet out_dir/payload/round={r}
    meta/sections/sub_parts/anle_sections/edges/fails
        -> written per batch BY the parse tasks (content-addressed parts)
    crawl log -> written per round BY each frontier partition
    links -> frontier.stage() (hash(host)-routed), committed at the round
             barrier as a sorted union

The driver touches only control data: per-round pop counts, lineage
counters (two ints per batch via a num_cpus=0 counter actor), and the
round barrier itself. Parsed text, edges and the crawl log — the
data-plane outputs that grow with the corpus — never transit the driver
or any single actor.

Rounds are the determinism barrier (the reference's three phase barriers):
crawl order is a pure function of the link graph at every parallelism
level, so an 8-CPU and a 32-CPU run produce identical crawl logs and
URL-seen sets. Checkpoints are written between rounds — per-partition
frontier snapshots + Bloom filters + metrics, committed by an atomic
manifest (north_rule resumability). Round output dirs are deleted before a
round (re-)runs, so resume-after-mid-round-crash never duplicates rows.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources.simweb import SimWeb, SimWebConfig
from ..stages.fetch import FetchStage
from ..stages.parse import PAYLOAD_SCHEMA, SIDE_TABLES, ParseStage
from ..state.frontier import FrontierPartition, partition_of

PAYLOAD_COLS = [f.name for f in PAYLOAD_SCHEMA]
LOG_SCHEMA = pa.schema([
    ("pop_seq", pa.int64()), ("fetch_time", pa.float64()),
    ("host", pa.string()), ("depth", pa.int32()),
    ("discovery_order", pa.int64()), ("url", pa.string()),
])
_ROUND_DIRS = ("payload", "crawl_log") + SIDE_TABLES


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
class LineageCounters:
    """Scalar lineage counters pushed by parse tasks (two ints per batch —
    genuinely control-plane-sized, unlike the row data which the tasks
    write themselves)."""

    def __init__(self):
        self.retried = 0
        self.failed = 0
        self.redirected = 0

    def add(self, retried: int, failed: int, redirected: int = 0) -> None:
        self.retried += retried
        self.failed += failed
        self.redirected += redirected

    def drain(self) -> tuple[int, int, int]:
        out = (self.retried, self.failed, self.redirected)
        self.retried = self.failed = self.redirected = 0
        return out


class CrawlEngine:
    def __init__(self, cfg: SimWebConfig, out_dir: str, num_partitions: int = 4,
                 fetch_concurrency: int | tuple = 2,
                 parse_concurrency: int | tuple = 2,
                 batch_size: int = 64, max_per_host_per_round: int | None = None,
                 default_delay: float = 1.0, bloom_capacity: int = 1_000_000,
                 track_seen: bool = False, use_actors: bool = True,
                 allow_deletions: bool = False, real_time: bool = False,
                 enrich: bool = True, store_html: bool = False):
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
        self.enrich = enrich
        self.store_html = store_html
        self.actors = [
            FrontierActor.remote(i, num_partitions, cfg,
                                 default_delay=default_delay,
                                 capacity=bloom_capacity, track_seen=track_seen,
                                 allow_deletions=allow_deletions)
            for i in range(num_partitions)
        ]
        self.counters = LineageCounters.remote()
        self.round = 0
        # north_rule lineage: fetched / retried / failed counters (the
        # frontier actors carry offered/deduped/robots_blocked/queued)
        self.lineage = {"fetched": 0, "retried": 0, "failed": 0,
                        "redirected": 0}
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
        r = self.round
        # a crashed attempt of THIS round may have left partial files —
        # delete the round's output dirs before (re-)running (idempotent
        # resume; see upsert_parquet for the same temp+rename discipline)
        for sub in _ROUND_DIRS:
            shutil.rmtree(os.path.join(self.out_dir, sub, f"round={r}"),
                          ignore_errors=True)
        # drain each partition in deterministic order; pops stay in the
        # object store as per-partition Arrow chunks (the crawl log is
        # written by each partition as its own parquet part)
        chunk_counts = ray.get([
            a.pop_round_chunks.remote(
                r, self.max_per_host,
                os.path.join(self.out_dir, "crawl_log"),
                chunk_rows=self.batch_size)
            for a in self.actors])
        if not any(chunk_counts):
            return False
        refs = [a.pops_chunk.remote(j)
                for a, n in zip(self.actors, chunk_counts)
                for j in range(n)]

        parse_kw = {"frontier_handles": self.actors,
                    "counters": self.counters,
                    "out_dir": self.out_dir, "round_no": r,
                    "enrich": self.enrich, "store_html": self.store_html}
        fetch_kw = {"cfg": self.cfg}
        if self.real_time:
            import time as _time
            if self.crawl_t0 is None:
                self.crawl_t0 = _time.time()
            fetch_kw["real_time_t0"] = self.crawl_t0
        ds = rd.from_arrow_refs(refs)
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
        # ONE streaming pass: fetch -> parse -> payload parquet. The parse
        # tasks side-write meta/sections/edges/fails themselves and stage
        # links to the frontier actors; the barrier below commits the
        # round's link union as a deterministic sorted set.
        ds.write_parquet(f"{self.out_dir}/payload/round={r}")
        self.last_stats = ds.stats()   # per-stage wall/cpu breakdown

        ray.get([a.clear_pop_chunks.remote() for a in self.actors])
        retried, failed, redirected = ray.get(self.counters.drain.remote())
        popped = sum(pq.read_metadata(f).num_rows for f in glob.glob(
            f"{self.out_dir}/crawl_log/round={r}/part-*.parquet"))
        self.lineage["fetched"] += popped
        self.lineage["retried"] += retried
        self.lineage["failed"] += failed
        self.lineage["redirected"] += redirected
        ray.get([a.commit.remote() for a in self.actors])
        self.round += 1
        return True

    def run(self, max_rounds: int = 64, checkpoint_dir: str | None = None) -> int:
        while self.round < max_rounds and self.run_round():
            if checkpoint_dir:
                self.checkpoint(checkpoint_dir)
        self._reassociate_anle_files()
        return self.round

    def _reassociate_anle_files(self) -> None:
        """Post-crawl pass: re-key harvested anle attachment blobs to
        their docs via the filename-embedded id and write the section
        table (reference anle.py:193-215,260-287 — there a separate
        process_anle job over downloaded file paths). Idempotent: the
        derived round=reassoc partition is rebuilt from the accumulated
        anle_files parts on every drain."""
        parts = sorted(glob.glob(
            f"{self.out_dir}/anle_files/round=*/part-*.parquet"))
        if not parts:
            return
        from ..stages.fulltext import reassociate_anle_files
        dst = f"{self.out_dir}/anle_sections/round=reassoc"
        shutil.rmtree(dst, ignore_errors=True)
        reassociate_anle_files(rd.read_parquet(parts)).write_parquet(dst)

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
        """Reconstruct the global crawl log from the per-partition parquet:
        within a round the global order is ascending (fetch_time, host,
        depth, discovery_order, url) — exactly the merged pop order — and
        pop_seq is that rank offset by prior rounds. Driver-side ONLY for
        tests/small audits; at scale consumers read the parquet dataset."""
        by_round: dict[int, list[str]] = {}
        for f in glob.glob(f"{self.out_dir}/crawl_log/round=*/part-*.parquet"):
            rno = int(f.split("round=")[1].split(os.sep)[0])
            by_round.setdefault(rno, []).append(f)
        if not by_round:
            return LOG_SCHEMA.empty_table()
        parts, seq = [], 0
        for rno in sorted(by_round):
            df = pq.read_table(sorted(by_round[rno])).to_pandas()
            df = df.sort_values(["fetch_time", "host", "depth",
                                 "discovery_order", "url"], kind="mergesort")
            df.insert(0, "pop_seq", np.arange(seq, seq + len(df)))
            seq += len(df)
            parts.append(pa.Table.from_pandas(df, schema=LOG_SCHEMA,
                                              preserve_index=False))
        return pa.concat_tables(parts)

    @property
    def crawl_log(self) -> list[tuple]:
        t = self.crawl_log_table()
        return list(zip(*[t[c].to_pylist() for c in LOG_SCHEMA.names])) \
            if t.num_rows else []

    @property
    def fail_log(self) -> list[tuple]:
        files = sorted(glob.glob(f"{self.out_dir}/fails/round=*/part-*.parquet"))
        if not files:
            return []
        t = pq.read_table(files)
        return sorted(set(zip(t["url"].to_pylist(), t["status"].to_pylist())))

    # ---- checkpoint / resume (north_rule) ----

    def checkpoint(self, ckpt_dir: str) -> None:
        rdir = os.path.join(ckpt_dir, f"round_{self.round:04d}")
        os.makedirs(rdir, exist_ok=True)
        snaps = ray.get([a.snapshot.remote() for a in self.actors])
        for i, blob in enumerate(snaps):
            with open(os.path.join(rdir, f"part_{i}.pkl"), "wb") as f:
                f.write(blob)
        # manifest last = atomic commit of the checkpoint (the crawl log
        # already lives in out_dir as per-round per-partition parquet)
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
        eng.round = manifest["round"]
        eng.lineage = manifest.get("lineage", dict(eng.lineage))
        return eng
