"""Cluster entrypoint for the encode pipeline — `ray job submit` compatible:

    ray job submit --working-dir . -- python scripts/run_encode.py \
        --input /data/webtext --output /data/encoded --partitions 512

On a driver-managed session it reuses the existing Ray; standalone it
starts a local one. Prints one JSON summary line. ``--resume`` skips
partitions already recorded in the output manifest (exact resume).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="",
                    help="directory of (drifting) parquet files, or a glob "
                         "(not needed with --stats)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--stats", action="store_true",
                    help="print the layout health summary (manifest "
                         "totals, codec mix, files/partition, zone "
                         "coverage — metadata only, no Ray) and exit")
    ap.add_argument("--verify", action="store_true",
                    help="checksum-audit every partition of --output "
                         "against its manifest and exit")
    ap.add_argument("--compact", type=int, metavar="MIN_FILES", default=0,
                    help="compact partitions of --output holding >= "
                         "MIN_FILES page files (append accumulation) "
                         "back to one freshly-encoded file and exit")
    ap.add_argument("--partitions", type=int, default=0,
                    help="0 = 2x cluster CPUs")
    ap.add_argument("--mode", choices=["tasks", "partitioned", "streaming"],
                    default="tasks",
                    help="tasks = deterministic raw-task exchange "
                         "(fastest, even reduce granularity); partitioned "
                         "= Dataset groupby shuffle; streaming = per-batch "
                         "pages, no co-location")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--append", action="store_true",
                    help="incremental ingest: add the input files to an "
                         "EXISTING layout (reuses its keyer config)")
    ap.add_argument("--append-schema", choices=["strict", "union"],
                    default="strict",
                    help="union = absorb schema drift on --append: "
                         "missing columns null-fill, new columns "
                         "back-fill existing rows with null pages")
    ap.add_argument("--upsert", action="store_true",
                    help="recrawl ingest: like --append, but rows whose "
                         "routing key re-appears in the input files are "
                         "REPLACED by the incoming snapshot")
    ap.add_argument("--count-where", default="", metavar="JSON",
                    help='print the exact zone-accelerated row count for '
                         'the JSON predicate dict over --output and exit')
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--rename", default="",
                    help="comma list old:new column renames (drift repair)")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="only for standalone local runs")
    ap.add_argument("--extract-text", default="",
                    help="WARC inputs: extract this open,close tag pair "
                         "from html into a text column (e.g. "
                         "'<main>,</main>') before encoding")
    ap.add_argument("--sort-by", default="",
                    help="cluster each partition on this column before "
                         "paging (tight zone pages for range queries; "
                         "disables map-side precode); a comma list "
                         "Z-orders on all listed columns — every one "
                         "gets locally narrow zone pages")
    ap.add_argument("--zone-columns", default="",
                    help="comma list of columns to zone-map at encode "
                         "time (per-page min/max sidecars for pruned "
                         "range queries; tasks/partitioned modes)")
    ap.add_argument("--snapshots", action="store_true",
                    help="print --output's snapshot log (one entry per "
                         "layout-mutating op — metadata only, no Ray) "
                         "and exit")
    ap.add_argument("--rollback", type=int, metavar="SNAPSHOT", default=0,
                    help="restore --output to this snapshot id (files, "
                         "config, manifest; recorded as a new snapshot) "
                         "and exit")
    ap.add_argument("--vacuum", type=int, metavar="KEEP_LAST", default=0,
                    help="reclaim --output's history, keeping the last "
                         "KEEP_LAST snapshots readable, and exit")
    ap.add_argument("--diff", default="", metavar="A:B",
                    help="print what changed between snapshots A and B "
                         "(per-partition file adds/removes, row/byte "
                         "deltas — metadata only, no Ray) and exit")
    ap.add_argument("--recluster", default="", metavar="COLS",
                    help="re-sort every partition of --output in place "
                         "by the comma-separated column(s) (2+ columns "
                         "Z-order) and exit; zone sidecars rebuilt, "
                         "later --append runs cluster the same way")
    ap.add_argument("--export", default="", metavar="DEST",
                    help="decode --output into standard hive-partitioned "
                         "Parquet under DEST and exit (atomic per-"
                         "partition installs; with --resume a re-run "
                         "skips finished partitions)")
    ap.add_argument("--snapshot", type=int, default=0, metavar="N",
                    help="with --export: export the layout as of "
                         "snapshot N (time travel) instead of the live "
                         "state")
    ap.add_argument("--delete-keys", default="", metavar="FILE",
                    help="retention: delete every row whose routing-key "
                         "value appears in FILE (one key per line) and "
                         "exit; only the partitions the keys route to "
                         "are opened")
    ap.add_argument("--delete-where", default="", metavar="JSON",
                    help='retention: delete rows matching the JSON '
                         'predicate dict, e.g. '
                         '\'{"lang": {"in": ["xx"]}, "n_chars": '
                         '[null, 50]}\' — zone sidecars prune the scan')
    args = ap.parse_args()

    if args.stats:  # metadata-only: no Ray session, no page reads
        from raystack import pipeline as pl
        print(json.dumps(pl.layout_stats(args.output)))
        return
    if args.snapshots:
        from raystack import snapshots as sn
        print(json.dumps([{k: s[k] for k in
                           ("id", "parent", "op", "rows", "encoded_bytes")}
                          for s in sn.list_snapshots(args.output)]))
        return
    if args.vacuum:
        from raystack import snapshots as sn
        print(json.dumps(sn.vacuum(args.output, keep_last=args.vacuum)))
        return
    if args.diff:
        from raystack import snapshots as sn
        a, b = (int(x) for x in args.diff.split(":", 1))
        print(json.dumps(sn.diff_snapshots(args.output, a, b)))
        return
    if args.rollback:
        import ray  # manifest re-finalize may fan out on big layouts
        if not ray.is_initialized():
            kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
                  "include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
            if kw["address"] == "local" and args.num_cpus:
                kw["num_cpus"] = args.num_cpus
            ray.init(**kw)
        from raystack import snapshots as sn
        from raystack.log import PrintLogger
        summary = sn.rollback(args.output, args.rollback,
                              logger=PrintLogger())
        print(json.dumps(summary))
        ray.shutdown()
        return
    if args.count_where:
        import ray
        if not ray.is_initialized():
            kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
                  "include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
            if kw["address"] == "local" and args.num_cpus:
                kw["num_cpus"] = args.num_cpus
            ray.init(**kw)
        from raystack.zones import count_where
        where = {c: (tuple(v) if isinstance(v, list) else v)
                 for c, v in json.loads(args.count_where).items()}
        print(json.dumps({"count": count_where(args.output, where)}))
        ray.shutdown()
        return
    if args.delete_keys or args.delete_where:
        import ray
        if not ray.is_initialized():
            kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
                  "include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
            if kw["address"] == "local" and args.num_cpus:
                kw["num_cpus"] = args.num_cpus
            ray.init(**kw)
        from raystack import pipeline as pl
        from raystack.log import PrintLogger
        if args.delete_keys:
            with open(args.delete_keys) as fh:
                keys = [ln.rstrip("\n") for ln in fh if ln.strip()]
            res = pl.delete_rows(args.output, keys=keys,
                                 logger=PrintLogger())
        else:
            where = {c: (tuple(v) if isinstance(v, list) else v)
                     for c, v in json.loads(args.delete_where).items()}
            res = pl.delete_rows(args.output, where=where,
                                 logger=PrintLogger())
        print(json.dumps({k: res[k] for k in
                          ("deleted_rows", "rewritten_partitions",
                           "scanned_partitions")}))
        ray.shutdown()
        return
    if args.verify or args.compact or args.recluster or args.export:
        import ray
        if not ray.is_initialized():
            kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
                  "include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
            if kw["address"] == "local" and args.num_cpus:
                kw["num_cpus"] = args.num_cpus
            ray.init(**kw)
        from raystack import pipeline as pl
        if args.recluster:
            cols = [c.strip() for c in args.recluster.split(",")
                    if c.strip()]
            res = pl.recluster(args.output,
                               cols[0] if len(cols) == 1 else cols)
            print(json.dumps({"reclustered": res.get("reclustered", 0),
                              **pl.layout_stats(args.output)}))
        if args.export:
            print(json.dumps(pl.export_parquet(
                args.output, args.export, resume=args.resume,
                snapshot=args.snapshot or None)))
        if args.compact:
            res = pl.compact_partitions(args.output,
                                        min_files=args.compact)
            print(json.dumps({"compacted": res.get("compacted", 0),
                              **pl.layout_stats(args.output)}))
        if args.verify:
            v = pl.verify_encoded(args.output)
            print(json.dumps({"ok": len(v["ok"]), "bad": v["bad"],
                              "missing": v["missing"]}))
            if v["bad"] or v["missing"]:
                raise SystemExit(1)
        ray.shutdown()
        return
    if not args.input:
        raise SystemExit("--input is required (except with --stats/"
                         "--verify/--compact)")

    import ray
    if not ray.is_initialized():
        kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
              "include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if kw["address"] == "local" and args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raystack import pipeline as pl
    from raystack.align import read_aligned
    from raystack.log import PrintLogger

    paths = sorted(glob.glob(os.path.join(args.input, "*.parquet"))
                   or glob.glob(os.path.join(args.input, "*.warc"))
                   + glob.glob(os.path.join(args.input, "*.warc.gz"))
                   or glob.glob(os.path.join(args.input, "*.csv"))
                   or [p for p in glob.glob(args.input) if os.path.isfile(p)])
    if not paths:
        raise SystemExit(f"no parquet/warc/csv files under {args.input}")
    is_warc = all(p.endswith((".warc", ".warc.gz")) for p in paths)
    renames = dict(p.split(":") for p in args.rename.split(",") if ":" in p)
    num_partitions = args.partitions or max(
        8, 2 * int(ray.cluster_resources().get("CPU", 4)))

    t0 = time.perf_counter()
    zone_cols = [c for c in args.zone_columns.split(",") if c] or None
    sort_cols = [c for c in args.sort_by.split(",") if c]
    # one column = plain sort; several = Z-order clustering
    sort_by_arg = (sort_cols[0] if len(sort_cols) == 1 else sort_cols) \
        if sort_cols else None
    if is_warc and not args.append:
        # Common Crawl front door: warc(.gz) -> webtext table -> encoded
        # layout. --mode tasks runs the raw-task exchange directly on the
        # archives (map-side parse + optional text extraction); the
        # Dataset modes stream through read_warc.
        extract = None
        if args.extract_text:
            o, c = args.extract_text.split(",", 1)
            extract = (o.encode(), c.encode())
        if args.mode == "tasks":
            summary = pl.encode_partitioned_tasks(
                paths, args.output, url_col=args.url_col,
                num_partitions=num_partitions, resume=args.resume,
                logger=PrintLogger(), collect_stats=True,
                zone_columns=zone_cols, sort_by=sort_by_arg,
                warc_extract_text=extract)
        else:
            from raystack.sources.warc import read_warc
            ds = read_warc(paths)
            if extract is not None:
                from raystack.ops.text import add_extracted_text
                ds = add_extracted_text(ds, html_col="html",
                                        out_col="text",
                                        open_tag=extract[0],
                                        close_tag=extract[1])
            summary = pl.encode_partitioned(
                ds, args.output, url_col=args.url_col,
                num_partitions=num_partitions, resume=args.resume,
                source_paths=paths, logger=PrintLogger(),
                zone_columns=zone_cols, sort_by=sort_by_arg)
    elif args.append or args.upsert:
        ingest = pl.upsert_rows if args.upsert else pl.encode_append
        summary = ingest(paths, args.output,
                         columns_rename=renames or None,
                         schema=args.append_schema,
                         logger=PrintLogger())
        if zone_cols:
            # appends invalidate touched sidecars; honor the flag by
            # rebuilding them (previously silently ignored on --append)
            from raystack.zones import build_zone_maps
            build_zone_maps(args.output, zone_cols)
        # NOTE: --partitions/--url-col come from the layout's persisted
        # config on append; --resume does not apply (appends are
        # exactly-once per file set via the output tag)
    elif args.mode == "tasks":
        summary = pl.encode_partitioned_tasks(
            paths, args.output, columns_rename=renames or None,
            url_col=args.url_col, num_partitions=num_partitions,
            resume=args.resume, logger=PrintLogger(), collect_stats=True,
            zone_columns=zone_cols, sort_by=sort_by_arg)
    else:
        ds = read_aligned(paths, columns_rename=renames or None,
                          add_filename=True)
        fn = (pl.encode_partitioned if args.mode == "partitioned"
              else pl.encode_streaming)
        kw = {}
        if args.mode == "partitioned":  # streaming has no partition hook
            kw["zone_columns"] = zone_cols
        summary = fn(ds, args.output, url_col=args.url_col,
                     num_partitions=num_partitions, resume=args.resume,
                     source_paths=paths, logger=PrintLogger(), **kw)
    summary["wall_sec"] = round(time.perf_counter() - t0, 3)
    summary["mode"] = (f"warc-{args.mode}" if (is_warc and not args.append)
                       else args.mode)
    summary["input_files"] = len(paths)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
