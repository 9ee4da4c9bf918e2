"""sf1 scale stress: the verdict's round-5 item — exercise the shard
ledger, appends, the dedup-index maintenance loop, compaction, recluster
and the snapshot log at 10x bench rows in ONE run, recording per-phase
walls and driver RSS (the M×P bound and driver-state growth only show at
real scale).

    python scripts/stress_sf1.py            # ~9.6M rows (8.8 GB raw)
    STRESS_ROWS=2400000 python scripts/stress_sf1.py   # smaller dry run

Phases:
  1. generate day1 (N rows / 64 files) + day2 (N/4 rows / 16 files) in
     parallel Ray tasks (deterministic: raystack.gen seeded per file);
  2. encode_sharded(day1) with max_refs forced low so the ledger runs
     REAL multi-shard (>= 4 shards);
  3. fresh single-job encode of day1 into a scratch dir; distributed
     content-hash equality against the sharded layout (shard ≡ single);
  4. encode_append(day2);
  5. dedup-index maintenance loop: ingest_dedup(day1, tag=day1) builds,
     ingest_dedup(day2, tag=day2) probes + appends; re-running day2's
     tag must refuse (exactly-once);
  6. compact_partitions + recluster(warc_ts) + zone maps;
  7. snapshot checks: decode at the post-shard snapshot == day1 rows,
     live decode == day1+day2 rows (minus nothing — dedup writes no
     deletes here), zone-pruned count vs exact.

Emits one JSON line per phase and a final summary; driver RSS after
every phase (a leak in the ledger/manifest path shows as monotone
growth way past the first phases' plateau).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("STRESS_ROWS", str(9_600_000)))
N_FILES = int(os.environ.get("STRESS_FILES", "64"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ROOT = os.environ.get("STRESS_DIR", "/tmp/raystack_sf1")
KEEP = bool(os.environ.get("STRESS_KEEP"))

PHASES = []


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return 0.0


def phase(name, t0):
    rec = {"phase": name, "wall_sec": round(time.perf_counter() - t0, 2),
           "driver_rss_mb": rss_mb()}
    PHASES.append(rec)
    print(json.dumps(rec), flush=True)


def content_sum(out_dir) -> tuple[int, int]:
    """(rows, order-insensitive int64 content sum) of a decoded layout —
    distributed: per-block fingerprint sums, one tiny aggregate."""
    import numpy as np
    import pyarrow as pa

    from raystack import pipeline as pl
    from raystack.ops.hashing import flatten_column
    from raystack.ops.text import fingerprint_kernel

    def partial(t: pa.Table) -> pa.Table:
        acc = 0
        n = 0
        for col in ("url", "text"):
            if col in t.schema.names:
                data, starts, lengths = flatten_column(t[col])
                fp = fingerprint_kernel(data, starts, lengths)
                # Python-int accumulate: wrap-free, order-insensitive
                acc = (acc + int(fp.view(np.uint64).sum(dtype=object))) \
                    % (1 << 63)
                n = len(fp)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "s": pa.array([acc], pa.int64())})

    parts = pl.decode_dir(out_dir, columns=["url", "text"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()), int(parts["s"].sum() % (1 << 63))


def main():
    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from raystack import pipeline as pl
    from raystack.align import read_aligned

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    day1_dir = os.path.join(ROOT, "day1")
    day2_dir = os.path.join(ROOT, "day2")

    # ---- phase 1: parallel deterministic generation
    t0 = time.perf_counter()

    @ray.remote(num_cpus=1)
    def gen_one(out_dir: str, rows: int, file_index: int) -> str:
        import pyarrow.parquet as pq

        from raystack.gen import _apply_drift, make_webtext
        os.makedirs(out_dir, exist_ok=True)
        t = _apply_drift(make_webtext(rows, 42, file_index), file_index,
                         True)
        p = os.path.join(out_dir, f"part-{file_index:04d}.parquet")
        pq.write_table(t, p)
        return p

    per = N_ROWS // N_FILES
    day1 = sorted(ray.get([gen_one.remote(day1_dir, per, i)
                           for i in range(N_FILES)]))
    n2_files = max(4, N_FILES // 4)
    day2 = sorted(ray.get([gen_one.remote(day2_dir, per, N_FILES + i)
                           for i in range(n2_files)]))
    n_day1, n_day2 = per * N_FILES, per * n2_files
    raw_gb = sum(os.path.getsize(p) for p in day1 + day2) / 1e9
    phase(f"generate {n_day1}+{n_day2} rows ({raw_gb:.2f} GB parquet)", t0)

    # ---- phase 2: sharded encode, forced multi-shard
    out = os.path.join(ROOT, "enc")
    n_parts = 64
    # bound refs so the ledger REALLY shards: file grouping coalesces the
    # 64 inputs to ~20 map groups at the default 128 MB target, so the
    # cap must allow ≤6 map tasks per shard to yield ≥3 append shards
    max_refs = 6 * n_parts
    t0 = time.perf_counter()
    stats = pl.encode_sharded(day1, out, columns_rename={"body": "text"},
                              url_col="url", num_partitions=n_parts,
                              max_refs=max_refs)
    phase(f"encode_sharded day1 ({stats.get('shards', '?')} shards)", t0)
    assert stats["rows"] == n_day1, stats
    assert int(stats.get("shards", 1)) >= 3, \
        f"multi-shard forcing failed: {stats}"
    # the day1-complete state is the LATEST snapshot here (each shard
    # after the first appends its own snapshot) — pin it for phase 7
    from raystack import snapshots as sn
    snap_day1 = sn.list_snapshots(out)[-1]["id"]

    # ---- phase 3: single-job fresh encode + content equality
    fresh = os.path.join(ROOT, "enc_fresh")
    t0 = time.perf_counter()
    pl.encode_partitioned_tasks(day1, fresh,
                                columns_rename={"body": "text"},
                                url_col="url", num_partitions=n_parts)
    phase("fresh single-job encode day1", t0)
    t0 = time.perf_counter()
    a = content_sum(out)
    b = content_sum(fresh)
    assert a == b, (a, b)
    phase(f"shard==single content equality ({a[0]} rows)", t0)
    shutil.rmtree(fresh, ignore_errors=True)

    # ---- phase 4: append day2
    t0 = time.perf_counter()
    pl.encode_append(day2, out, columns_rename={"body": "text"})
    phase("encode_append day2", t0)
    n_live = pl.decode_dir(out).count()
    assert n_live == n_day1 + n_day2, (n_live, n_day1, n_day2)

    # ---- phase 5: dedup-index maintenance loop
    from raystack.ops.dedupindex import ingest_dedup
    from raystack.ops.hashing import flatten_column
    from raystack.ops.text import fingerprint_kernel

    def with_ids(paths):
        import numpy as np

        def add_id(t: pa.Table) -> pa.Table:
            data, starts, lengths = flatten_column(t["url"])
            fp = fingerprint_kernel(data, starts, lengths)
            return pa.table({
                "doc_id": pa.array(fp.view(np.int64)),
                "text": t["text"]})
        return read_aligned(paths, columns_rename={"body": "text"},
                            add_filename=False,
                            post_align=add_id)

    idx = os.path.join(ROOT, "dedup_index")
    t0 = time.perf_counter()
    kept1 = ingest_dedup(with_ids(day1), idx, tag="day1").count()
    phase(f"ingest_dedup day1 (kept {kept1}/{n_day1})", t0)
    t0 = time.perf_counter()
    kept2 = ingest_dedup(with_ids(day2), idx, tag="day2").count()
    phase(f"ingest_dedup day2 (kept {kept2}/{n_day2})", t0)
    try:
        ingest_dedup(with_ids(day2), idx, tag="day2")
        raise AssertionError("re-ingesting day2's tag must refuse")
    except ValueError:
        pass

    # ---- phase 6: compaction + recluster + zones
    t0 = time.perf_counter()
    pl.compact_partitions(out)
    phase("compact_partitions", t0)
    t0 = time.perf_counter()
    pl.recluster(out, sort_by=["warc_ts"])
    phase("recluster(warc_ts)", t0)
    from raystack.zones import build_zone_maps, count_where
    t0 = time.perf_counter()
    build_zone_maps(out, ["warc_ts"])
    phase("build_zone_maps(warc_ts)", t0)

    # ---- phase 7: snapshot + pruned-count checks
    t0 = time.perf_counter()
    n_snap1 = pl.decode_dir(out, snapshot=snap_day1).count()
    assert n_snap1 == n_day1, (n_snap1, n_day1)
    n_final = pl.decode_dir(out).count()
    assert n_final == n_day1 + n_day2, (n_final, n_day1 + n_day2)
    import pyarrow.parquet as pq
    ts = pq.read_table(day1[0], columns=["warc_ts"])["warc_ts"]
    lo, hi = ts[0].as_py(), ts[len(ts) // 2].as_py()
    got = count_where(out, {"warc_ts": (lo, hi)})
    exact = pl.scan(out, columns=["warc_ts"],
                    where={"warc_ts": (lo, hi)}).count()
    assert got == exact, (got, exact)
    phase(f"snapshot+pruned-count checks (snap1={n_snap1}, live={n_final},"
          f" range={got})", t0)

    summary = {"rows_day1": n_day1, "rows_day2": n_day2,
               "raw_gb": round(raw_gb, 2), "num_cpus": NCPU,
               "shards": stats.get("shards"),
               "total_wall_sec": round(sum(p["wall_sec"] for p in PHASES),
                                       1),
               "peak_driver_rss_mb": max(p["driver_rss_mb"]
                                         for p in PHASES),
               "phases": PHASES}
    print("SUMMARY " + json.dumps(summary), flush=True)
    with open(os.path.join(ROOT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    if not KEEP:
        shutil.rmtree(day1_dir, ignore_errors=True)
        shutil.rmtree(day2_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
