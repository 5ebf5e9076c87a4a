"""Round-6 side benchmarks (bench.py is frozen for measurement).

Two jobs:

1. ``--ceilings``: the 8->32 process-scaling ceiling of this host for
   THREE workload shapes, measured in one window:

   * ``hash``  — the cache-resident md5 loop bench.py's burn_ceiling
     uses (compute-bound; the round-5 adjudication normalizer);
   * ``gather`` — the extraction kernel's actual hot pass, replayed on
     synthetic data: a uint8 table gather over a uint32 codepoint
     array + the (doc_id << 6 | mask) bincount histogram, identical
     array shapes and dtypes to functions/features.compute_features
     (memory-bandwidth-bound: streams ~9 B/char against a 64 KB table);
   * ``triad``  — a STREAM-triad-style numpy pass (a = b + s*c) over
     64 MB float64 arrays (pure DRAM bandwidth).

   The round-5 verdict flagged `pipeline_vs_ceiling_8_to_32 = 0.643`
   as unadjudicated because the pipeline is gather-bound while the
   bench's built-in ceiling is the hash loop.  This prints all three
   efficiencies plus the extraction kernel's own 8->32 pair measured in
   the SAME window (via bench.py's worker), so
   ``pipeline_vs_gather_ceiling`` / ``pipeline_vs_triad_ceiling`` are
   self-contained evidence.

2. ``--queries [name ...]``: noop-sink isolation trials for the heavy
   operator queries (guide §1.4), N warm trials each after a JIT
   warm-up, printing per-query min/median — the adjudication data for
   OPTIMIZATION_r06.md's before/after claims.

Usage:
  python bench_extra.py --ceilings
  python bench_extra.py --queries dedup_verified_pairs release_e2e
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_HASH_BURN = (
    "import hashlib\n"
    "b = b'x' * 1024\n"
    "for _ in range({iters}):\n"
    "    b = hashlib.md5(b).digest() * 64\n"
)

# The kernel's hot pass on synthetic data: same dtypes/shapes as
# features._CpView + _mask_table gather + the doc x mask bincount.
_GATHER_BURN = """
import numpy as np
rng = np.random.default_rng(7)
n_chars = 4_000_000            # ~ one 2048-page batch of ~2 kB pages
cp = rng.integers(0, 0x10000, n_chars, dtype=np.uint32)
tab = rng.integers(0, 64, 0x10000, dtype=np.uint8)
lens = np.full(2048, n_chars // 2048, dtype=np.int64)
doc_id = np.repeat(np.arange(2048, dtype=np.int32), lens)
for _ in range({iters}):
    m = tab[cp]                                  # the table gather
    k = doc_id * np.int32(64) + m                # histogram key
    h = np.bincount(k, minlength=2048 * 64)      # doc x mask histogram
"""

_TRIAD_BURN = """
import numpy as np
n = 8_000_000                  # 3 x 64 MB float64 streams
a = np.zeros(n); b = np.ones(n); c = np.full(n, 2.0)
for _ in range({iters}):
    np.multiply(c, 3.0, out=a)
    a += b                      # a = b + 3*c, two streamed passes
"""


def _burn_tput(code: str, n_procs: int) -> float:
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{n_procs - 1}"] + cmd
    t0 = time.time()
    procs = [subprocess.Popen(cmd) for _ in range(n_procs)]
    for p in procs:
        p.wait()
    return n_procs / (time.time() - t0)


def _eff(code_tpl: str, iters: int, n_small: int = 8, n_big: int | None = None) -> dict:
    n_big = n_big or CPUS
    code = code_tpl.format(iters=iters)
    best = {"eff": 0.0}
    for _ in range(2):
        ts = _burn_tput(code, n_small)
        tb = _burn_tput(code, n_big)
        eff = (tb / ts) / (n_big / n_small)
        if eff > best["eff"]:
            best = {"eff": round(eff, 3), "tput_small": round(ts, 4), "tput_big": round(tb, 4)}
    return best


def _pages_dir() -> str:
    rep = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "96"))
    tag = SF_DIR.strip("/").replace("/", "_")
    return f"/tmp/spark_graft_bench_pages_{tag}_r{rep}"


def ceilings() -> None:
    import bench as benchmod

    pages_dir = benchmod.materialize_pages()
    out: dict = {"cpus": CPUS}
    # pipeline pair first and last so host drift hits it symmetrically
    r8a = benchmod._run_worker("local[8]", pages_dir, 2, pin="0-7")
    r32a = benchmod._run_worker(f"local[{CPUS}]", pages_dir, 3, pin=f"0-{CPUS-1}")
    out["hash"] = _eff(_HASH_BURN, 600_000)
    out["gather"] = _eff(_GATHER_BURN, 60)
    out["triad"] = _eff(_TRIAD_BURN, 40)
    r8b = benchmod._run_worker("local[8]", pages_dir, 2, pin="0-7")
    r32b = benchmod._run_worker(f"local[{CPUS}]", pages_dir, 2, pin=f"0-{CPUS-1}")
    sec8 = min(r8a["trials_sec"] + r8b["trials_sec"])
    sec32 = min(r32a["trials_sec"] + r32b["trials_sec"])
    pages = r8a["pages"]
    eff = (pages / sec32) / (pages / sec8) / (CPUS / 8.0)
    out["extract"] = {
        "pages": pages,
        "pages_per_sec_8core": round(pages / sec8, 1),
        f"pages_per_sec_{CPUS}core": round(pages / sec32, 1),
        "eff_8_32": round(eff, 3),
    }
    for k in ("hash", "gather", "triad"):
        ce = out[k]["eff"]
        out[f"pipeline_vs_{k}_ceiling"] = round(eff / ce, 3) if ce else None
    print(json.dumps(out))


def queries(names: list[str], trials: int = 4) -> None:
    import __spark_entry__ as entrymod
    from gujarati_readability_pagewise_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    qs["tpch_q1"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        times = []
        for i in range(trials + 1):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            if i:  # trial 0 is the JIT warm-up
                times.append(round(dt, 3))
        s = sorted(times)
        out[name] = {
            "trials_sec": times,
            "min": s[0],
            "median": s[len(s) // 2] if len(s) % 2 else (s[len(s)//2 - 1] + s[len(s)//2]) / 2,
        }
        print(name, out[name], flush=True)
    spark.stop()
    print(json.dumps(out))


def release_scale(factors: tuple[int, ...] = (1, 10)) -> None:
    """Round-5 verdict item 6: run the release plan on a ~10x corpus and
    prove no stage grows superlinearly.

    The scaled corpus is built deterministically from the sf documents as
    sentence REMIXES — doc d's j-th sentence index is an md5-derived hash
    of (d, j) mod the corpus-wide sentence-pool size — so scaled docs are
    genuinely independent (expected pairwise sentence overlap 12²/pool ≈
    0.004, Jaccard far under the 0.5 near-dup threshold).  Clone
    replication or linear-stride picks both fail here: they manufacture
    giant true near-dup clusters and the verify stage's pair count
    becomes the workload's, not the engine's."""
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from gujarati_readability_pagewise_spark.plans.release import run_release
    from gujarati_readability_pagewise_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-release", master=f"local[{CPUS}]")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sents = (
        base.select(F.posexplode(F.split("text", r"\. ")).alias("i", "sent"))
        .filter(F.length("sent") > 0)
        .select("sent")
        .withColumn(
            "sid",
            F.row_number().over(W.orderBy(F.monotonically_increasing_id())) - 1,
        )  # single-partition window is fine: side benchmark, ~40k rows
    ).localCheckpoint()
    n_sents = sents.count()
    n_base = base.count()
    out = {}
    for f in factors:
        n_docs = n_base * f
        docs = spark.range(n_docs).select(F.col("id").alias("doc_id")).join(
            spark.range(12).select(F.col("id").alias("j")), how="cross"
        ).select(
            "doc_id",
            "j",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws("#", F.col("doc_id"), F.col("j"))
                        ), 1, 15
                    ), 16, 10
                ).cast("long"),
                F.lit(n_sents),
            ).alias("sid"),
        ).join(sents, "sid").groupBy("doc_id").agg(
            F.concat_ws(". ", F.array_sort(
                F.collect_list(F.struct("j", "sent"))
            ).getField("sent")).alias("text")
        ).localCheckpoint()
        root = f"/tmp/bench_extra_release_{os.getpid()}_{f}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        rel = run_release(
            spark, docs, root, cut_spans_window=40, job_id=f"scale-{f}x"
        )
        out[f"{f}x"] = {
            "wall_sec": round(time.time() - t0, 2),
            "stages_sec": {k: round(v, 2) for k, v in rel.items() if k.startswith("t_")},
            "funnel": {k: int(v) for k, v in rel.items() if k.startswith("n_")},
        }
        shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()
        print(f, out[f"{f}x"], flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    if "--ceilings" in sys.argv:
        ceilings()
    elif "--queries" in sys.argv:
        i = sys.argv.index("--queries")
        queries(sys.argv[i + 1:] or ["dedup_verified_pairs"])
    elif "--release-scale" in sys.argv:
        release_scale()
    else:
        print(__doc__)
