"""CLI entry points (the engine form of the reference's cmd.py menu, U3).

    python -m vbpl_web_crawl_ray crawl --out /tmp/crawl [--sf-dir DIR]
        [--hosts N] [--pages N] [--docs-per-page N] [--partitions P]
        [--paginate-via-links] [--max-per-host N]
    python -m vbpl_web_crawl_ray fetch-by-id --out /tmp/crawl --id 42
    python -m vbpl_web_crawl_ray preview --out /tmp/crawl [--limit 10]
    python -m vbpl_web_crawl_ray bench [--scaling]

Launchable under a cluster with
``ray job submit --working-dir . -- python -m vbpl_web_crawl_ray crawl ...``
(north_rule); standalone invocations auto-init a local Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="vbpl_web_crawl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a full crawl of the simulated web")
    c.add_argument("--out", required=True)
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--hosts", type=int, default=4)
    c.add_argument("--pages", type=int, default=3)
    c.add_argument("--docs-per-page", type=int, default=5)
    c.add_argument("--partitions", type=int, default=4)
    c.add_argument("--paginate-via-links", action="store_true")
    c.add_argument("--max-per-host", type=int, default=None)
    c.add_argument("--store-html", action="store_true",
                   help="also persist the raw full-text HTML node per doc "
                        "(the reference's vbpl.html LONGTEXT column)")
    c.add_argument("--checkpoint-dir", default=None)
    c.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint-dir's manifest instead "
                        "of starting fresh (the crashed round re-runs "
                        "idempotently)")

    f = sub.add_parser("fetch-by-id", help="point lookup on crawl output")
    f.add_argument("--out", required=True)
    f.add_argument("--id", type=int, required=True)

    ci = sub.add_parser("crawl-by-id",
                        help="crawl specific document ids (reference "
                             "crawl_vbpl_by_id / by-id-list, cmd.py:40-98)")
    ci.add_argument("--out", required=True)
    ci.add_argument("--ids", required=True,
                    help="comma-separated document ids")
    ci.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ci.add_argument("--hosts", type=int, default=4)
    ci.add_argument("--pages", type=int, default=3)
    ci.add_argument("--docs-per-page", type=int, default=5)

    v = sub.add_parser("preview", help="newest docs by issuance date")
    v.add_argument("--out", required=True)
    v.add_argument("--limit", type=int, default=10)

    b = sub.add_parser("bench", help="run the benchmark harness")
    b.add_argument("--scaling", action="store_true")

    k = sub.add_parser("compact", help="collapse per-round output via upsert")
    k.add_argument("--out", required=True)
    k.add_argument("--table", default="payload")
    k.add_argument("--key", default="image_id")

    x = sub.add_parser("export", help="compact + export the payload table "
                                      "(Lance when installed, else parquet)")
    x.add_argument("--out", required=True)
    x.add_argument("--dest", required=True)

    args = p.parse_args(argv)

    if args.cmd == "bench":
        import subprocess
        cmd = [sys.executable, "bench.py"] + (["--scaling"] if args.scaling else [])
        sys.exit(subprocess.run(cmd).returncode)

    _ensure_ray()
    import ray

    if args.cmd == "crawl":
        from .pipelines.crawl import CrawlEngine
        from .sources.simweb import SimWeb, config_from_documents
        cfg = config_from_documents(
            args.sf_dir, n_hosts=args.hosts, pages_per_host=args.pages,
            docs_per_page=args.docs_per_page,
            paginate_via_links=args.paginate_via_links)
        if args.resume:
            if not args.checkpoint_dir:
                p.error("--resume requires --checkpoint-dir")
            eng = CrawlEngine.resume(args.checkpoint_dir, cfg, args.out,
                                     max_per_host_per_round=args.max_per_host,
                                     store_html=args.store_html)
        else:
            eng = CrawlEngine(cfg, args.out, num_partitions=args.partitions,
                              max_per_host_per_round=args.max_per_host,
                              store_html=args.store_html)
            eng.seed(SimWeb(cfg).seed_urls())
        rounds = eng.run(checkpoint_dir=args.checkpoint_dir)
        print(json.dumps({"rounds": rounds, "fetched": len(eng.crawl_log),
                          "metrics": eng.metrics()["total"]}))
    elif args.cmd == "crawl-by-id":
        from .pipelines.crawl import CrawlEngine
        from .sources.simweb import config_from_documents
        cfg = config_from_documents(
            args.sf_dir, n_hosts=args.hosts, pages_per_host=args.pages,
            docs_per_page=args.docs_per_page)
        eng = CrawlEngine(cfg, args.out, num_partitions=2)
        ids = [int(x) for x in args.ids.split(",")]
        eng.seed([f"http://host{cfg.host_of_doc(i)}.test/doc.aspx?ItemID={i}"
                  for i in ids])
        eng.run()
        print(json.dumps({"fetched": len(eng.crawl_log),
                          "metrics": eng.metrics()["total"]}))
    elif args.cmd == "fetch-by-id":
        from .pipelines.lookup import fetch_doc_by_id
        row = fetch_doc_by_id(args.out, args.id)
        if row is not None:
            row.pop("bytes", None)  # binary not printable
        print(json.dumps(row, ensure_ascii=False, default=str))
    elif args.cmd == "preview":
        from .pipelines.lookup import preview_latest
        print(preview_latest(args.out, args.limit).to_pandas()
              .to_json(orient="records", force_ascii=False))
    elif args.cmd == "compact":
        from .stages.upsert import compact_crawl_output
        print(json.dumps({"compacted": compact_crawl_output(
            args.out, args.table, args.key)}))
    elif args.cmd == "export":
        from .sources.sinks import export_crawl_payload
        print(json.dumps(export_crawl_payload(args.out, args.dest)))
    ray.shutdown()


if __name__ == "__main__":
    main()
