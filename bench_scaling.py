#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule): the same pipeline job on
the same input at local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors. Writes BENCH/BASELINE.md.

Method (each choice mirrors what a real two-cluster comparison would do):
  - each parallelism level runs in its own subprocess (fresh JVM);
  - `taskset` pins the 8-core run to 8 physical CPUs — otherwise local[8]
    silently uses all 32 cores for GC/netty/IO threads and the baseline is
    inflated;
  - shuffle goes to /dev/shm: on a real cluster shuffle I/O rides NVMe +
    network, not one shared sandbox disk whose contention would swamp the
    CPU signal;
  - partition count is FIXED (128) at both levels, so per-task overhead is
    identical and only compute parallelism varies;
  - the query plan is built once and the job runs 1 warm-up + 3 timed
    iterations (min reported) — a production filter job compiles once and
    runs for hours, so JIT/codegen is steady-state;
  - input is a pre-materialized parquet corpus (2M synthetic CC pages,
    ~1 GB) — generation is not the system under test.

Efficiency = (docs_per_sec@32 / docs_per_sec@8) / (32/8); target >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_PAGES = 2_000_000
REPO = os.path.dirname(os.path.abspath(__file__))
PAGES = os.path.join(REPO, ".data", f"pages_{N_PAGES}_128p")

_PREP = r"""
import sys; sys.path.insert(0, {repo!r})
from dq_true_north_spark.session import get_spark
from dq_true_north_spark.corpus import pages_df
s = get_spark(master="local[32]", extra_conf={{"spark.local.dir": "/dev/shm/spark-bench"}})
s.sparkContext.setLogLevel("ERROR")
pages_df(s, {n}, 128).write.mode("overwrite").parquet({pages!r})
s.stop()
"""

_CHILD = r"""
import json, sys, time, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_DRIVER_MEM"] = "24g"
from pyspark.sql import functions as F
from dq_true_north_spark.session import get_spark
from dq_true_north_spark.textquality.pipeline import compute_verdicts
cores = int(sys.argv[1])
s = get_spark(master=f"local[{{cores}}]", shuffle_partitions="128",
              extra_conf={{"spark.local.dir": "/dev/shm/spark-bench"}})
s.sparkContext.setLogLevel("ERROR")
# prune BEFORE the url repartition: the verdict pipeline never reads the
# html binary, so shuffling it would double shuffle volume for nothing
pages = (s.read.parquet({pages!r})
         .select("url", "warc_ts", "text")
         .repartition(128, "url"))
v = compute_verdicts(pages).select(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.length("scrubbed_text")).alias("bytes_out"),
    F.sum(F.col("keep").cast("int")).alias("kept"))
row = v.first()                                     # warm-up (excluded)
times = []
for _ in range(2):
    t0 = time.perf_counter(); v.first(); times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({{"cores": cores, "docs": row["n"], "kept": row["kept"],
                   "times": [round(x, 2) for x in times],
                   "sec": round(best, 3),
                   "docs_per_sec": round(row["n"] / best, 1)}}))
s.stop()
"""


def run(cores: int, cpu_list: str) -> dict:
    script = _CHILD.format(repo=REPO, pages=PAGES)
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", script, str(cores)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    if not os.path.isdir(PAGES):
        subprocess.run(
            [sys.executable, "-c", _PREP.format(repo=REPO, n=N_PAGES, pages=PAGES)],
            check=True, timeout=1800,
        )
    # the sandbox host is noisy (identical trials vary 2x); interleave
    # paired visits and take the min per level so both levels sample the
    # same noise windows
    rounds8, rounds32 = [], []
    for _ in range(3):
        rounds8.append(run(8, "0-7"))
        rounds32.append(run(32, "0-31"))
    r8 = min(rounds8, key=lambda r: r["sec"])
    r32 = min(rounds32, key=lambda r: r["sec"])
    r8["times"] = sorted(t for r in rounds8 for t in r["times"])
    r32["times"] = sorted(t for r in rounds32 for t in r["times"])
    r8["sec"] = min(r8["times"]); r32["sec"] = min(r32["times"])
    r8["docs_per_sec"] = round(r8["docs"] / r8["sec"], 1)
    r32["docs_per_sec"] = round(r32["docs"] / r32["sec"], 1)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / (32 / 8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north_rule)

Same job (full corpus quality-filter pipeline: langid + perplexity +
Gopher/C4 heuristics + exact dedup + PII scrub, fully materialized), same
input ({N_PAGES:,} synthetic CC-style pages, deterministic seed, 128-file
parquet), two parallelism levels standing in for N vs 4N executors.
CPU-pinned via taskset; shuffle on tmpfs; fixed 128 partitions at both
levels; plan compiled once, min over 3 interleaved paired visits x 2 timed runs each, after per-JVM warm-up (the shared sandbox host shows 2x noise between identical trials; interleaving samples both levels across the same noise windows).

| parallelism | pinned CPUs | docs | kept | runs (s) | best s | docs/sec |
|---|---|---|---|---|---|---|
| local[8]  | 0-7  | {r8['docs']:,} | {r8['kept']:,} | {r8['times']} | {r8['sec']} | {r8['docs_per_sec']:,} |
| local[32] | 0-31 | {r32['docs']:,} | {r32['kept']:,} | {r32['times']} | {r32['sec']} | {r32['docs_per_sec']:,} |

**Scaling efficiency** = (docs_per_sec@32 / docs_per_sec@8) / (32/8)
= ({r32['docs_per_sec']} / {r8['docs_per_sec']}) / 4
= **{eff:.3f}**  (target >= 0.8)

Determinism across parallelism is separately enforced by
tests/test_pipeline.py::test_determinism_across_parallelism (exact verdict
equality between 2-partition and 16-partition runs).
""")
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
