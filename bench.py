"""Benchmark harness (driver contract).

Headline: the webtext encode pipeline — drifting Parquet partitions of the
Common-Crawl-style table (generated deterministically, cached in /tmp) →
schema-align → hash-partitioned per-column codec encode → partitioned pages
+ manifest. Reports wall seconds, raw GB/s, and compressed size vs the
Parquet/snappy baseline, plus a handful of secondary pipelines over
``$GRAFT_SF_DIR``.

    python bench.py              # one JSON line, num_cpus=$RAY_GRAFT_CPUS (32)
    python bench.py --scaling    # fresh-process runs at 8 and 32 CPUs +
                                 # throughput scaling efficiency
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/raystack_bench"

_ROWS_BY_SF = {"sf0.001": 4_000, "sf0.01": 24_000, "sf0.1": 120_000}


def _bench_rows() -> int:
    tag = os.path.basename(SF_DIR.rstrip("/"))
    return _ROWS_BY_SF.get(tag, 120_000)


def _webtext_inputs(n_rows: int) -> tuple[list[str], int, int]:
    """Generate (once, cached) the drifting webtext partitions + snappy
    baseline. Returns (paths, raw_bytes, snappy_bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack.align import read_aligned
    from raystack.gen import write_webtext

    d = os.path.join(CACHE, f"web_{n_rows}")
    meta_p = os.path.join(d, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
        return sorted(glob.glob(os.path.join(d, "part-*.parquet"))), \
            meta["raw_bytes"], meta["snappy_bytes"]
    shutil.rmtree(d, ignore_errors=True)
    paths = write_webtext(d, n_rows=n_rows, n_files=8, drift=True)
    # snappy baseline: the same aligned table written as one snappy parquet
    tables = [pq.read_table(p) for p in paths]
    aligned = []
    for t in tables:
        cols = {}
        for name in ["url", "warc_ts", "html", "text", "lang"]:
            src = "body" if name == "text" and "body" in t.schema.names else name
            cols[name] = t[src] if src in t.schema.names else \
                pa.nulls(t.num_rows, pa.string())
        aligned.append(pa.table(cols))
    full = pa.concat_tables(aligned)
    raw_bytes = full.nbytes
    snappy_path = os.path.join(d, "baseline_snappy.pq")
    pq.write_table(full, snappy_path, compression="snappy")
    snappy_bytes = os.path.getsize(snappy_path)
    with open(meta_p, "w") as f:
        json.dump({"raw_bytes": raw_bytes, "snappy_bytes": snappy_bytes}, f)
    return paths, raw_bytes, snappy_bytes


def run_bench(num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from raystack import pipeline as pl
    from raystack.align import read_aligned

    n_rows = _bench_rows()
    paths, raw_bytes, snappy_bytes = _webtext_inputs(n_rows)

    # warm the page cache (measure compute+shuffle, not first disk read)
    for p in paths:
        with open(p, "rb") as f:
            f.read()

    # warm the worker pool: spin up every worker process and its imports
    # before timing (a long-lived cluster has a warm pool; on this 1-core
    # sandbox cold worker spawn would otherwise dominate the 32-cpu runs)
    def _warm(b):
        import raystack.codecs  # noqa: F401
        import raystack.pipeline  # noqa: F401
        return b
    ray.data.range(num_cpus * 2, override_num_blocks=num_cpus * 2) \
        .map_batches(_warm).count()

    queries: dict[str, float] = {}
    out = os.path.join(CACHE, f"enc_{n_rows}_{num_cpus}")

    # best of 3 repeats — the 1-core sandbox has high run-to-run variance
    t_enc = float("inf")
    for _ in range(3):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        ds = read_aligned(paths, columns_rename={"body": "text"},
                          add_filename=True)
        # fixed partition count across parallelism levels: the scaling runs
        # compare identical work graphs, isolating worker-pool scaling
        pl.encode_partitioned(ds, out, num_partitions=32, source_paths=paths)
        t_enc = min(t_enc, time.perf_counter() - t0)
    queries["webtext_encode"] = round(t_enc, 3)
    encoded_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(out, "pages", "**", "*.parquet"),
                           recursive=True))

    t0 = time.perf_counter()
    n_dec = pl.decode_pages(pl.read_encoded(out)).count()
    queries["webtext_decode"] = round(time.perf_counter() - t0, 3)
    assert n_dec == n_rows, (n_dec, n_rows)

    # throughput path: per-batch segment encode, pages-only exchange
    out_s = os.path.join(CACHE, f"encs_{n_rows}_{num_cpus}")
    t_s = float("inf")
    for _ in range(2):
        shutil.rmtree(out_s, ignore_errors=True)
        t0 = time.perf_counter()
        pl.encode_streaming(
            read_aligned(paths, columns_rename={"body": "text"},
                         add_filename=True),
            out_s, num_partitions=32, source_paths=paths)
        t_s = min(t_s, time.perf_counter() - t0)
    queries["webtext_encode_streaming"] = round(t_s, 3)

    # secondary pipelines over the driver testdata
    t0 = time.perf_counter()
    li_cols = ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
               "l_linestatus", "l_shipdate"]
    li = ray.data.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"),
                               columns=li_cols)
    pl.decode_pages(pl.encode_batches(li, batch_size=65536),
                    columns=li_cols).count()
    queries["roundtrip_lineitem"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from raystack.ops.text import add_token_count
    docs = ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                                 columns=["doc_id", "text"])
    add_token_count(docs).count()
    queries["token_counts"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from raystack.ops.dedup import minhash_lsh_dedup
    minhash_lsh_dedup(docs).count()
    queries["minhash_dedup"] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "webtext encode wall sec (align + codec encode + "
                  "partitioned write + manifest)",
        "value": queries["webtext_encode"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "rows": n_rows,
        "raw_bytes": raw_bytes,
        "encoded_bytes": encoded_bytes,
        "snappy_bytes": snappy_bytes,
        "gb_per_sec": round(raw_bytes / t_enc / 1e9, 4),
        "compression_vs_snappy": round(encoded_bytes / snappy_bytes, 4),
    }


def main():
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        results = {}
        for n in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 cwd=os.path.dirname(os.path.abspath(__file__)),
                                 check=True).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
        t_lo, t_hi = results[lo]["value"], results[hi]["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(json.dumps({
            "metric": "scaling efficiency (fresh-process oversubscribed "
                      f"parallelism {lo}->{hi} logical CPUs, 1 physical)",
            "value": round(eff, 3), "unit": "efficiency",
            f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
            f"gbps_{lo}": results[lo]["gb_per_sec"],
            f"gbps_{hi}": results[hi]["gb_per_sec"],
            "sf": SF_DIR,
        }))
        return
    print(json.dumps(run_bench(NUM_CPUS)))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
