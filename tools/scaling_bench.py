"""Scaling-efficiency evidence for the north rule.

Runs the SAME indexing job (materialized index build over the
synthetic webpage corpus, code-aware analyzer chain) at two
parallelism levels — local[N] and local[4N] standing in for N and 4N
executors in this sandbox — on IDENTICAL input, and reports docs/sec
at both plus efficiency = throughput(4N) / (4 * throughput(N)).

Each level runs in a FRESH subprocess (a JVM cannot change its core
count after start), writing one JSON line; this driver aggregates
into BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_docs] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); out_root = sys.argv[3]
from coa_codesearch_mcp_spark.session import get_spark
from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexWriter
from pyspark.sql import functions as F

spark = get_spark(f"scale{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
# materialize the input once OUTSIDE the timed section (input gen is
# not part of indexing throughput)
src = os.path.join(out_root, "input")
if not os.path.exists(src):
    docs = generate_webpages(spark, n_docs, partitions=max(cores, 8))
    docs.withColumn("doc_id", F.monotonically_increasing_id()).write.parquet(src)
docs = spark.read.parquet(src)
n = docs.count()

root = os.path.join(out_root, f"ix_{cores}")
shutil.rmtree(root, ignore_errors=True)
cfg = IndexConfig(field="content", n_buckets=32, range_size=1 << 14,
                  chunk_size=1 << 14, chunks_per_wave=64,
                  salt_threshold=200_000, with_positions=True)
t0 = time.perf_counter()
IndexWriter(spark, root, cfg).build(docs)
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "n_docs": n, "secs": round(dt, 3),
                  "docs_per_sec": round(n / dt, 2)}))
"""


def run_level(cores: int, n_docs: int, out_root: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_docs), out_root],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_root = "/tmp/spark_graft_scaling"
    os.makedirs(out_root, exist_ok=True)

    small = run_level(n, n_docs, out_root)
    large = run_level(4 * n, n_docs, out_root)
    eff = large["docs_per_sec"] / (4 * small["docs_per_sec"])
    result = {
        "metric": "indexing_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "levels": {f"local[{n}]": small, f"local[{4*n}]": large},
        "rule": "throughput(4N) / (4 * throughput(N)) >= 0.8",
    }
    print(json.dumps(result))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
