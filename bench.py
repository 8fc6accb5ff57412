#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the round driver.

Parts (each in its own subprocess so every measurement gets a fresh JVM —
restarting SparkContexts in-process leaks dead accumulator sockets and
skews JIT warmth):

1. North-metric scaling run (BASELINE.md protocol): the scheduling
   pipeline (ccspark.benchflow) over the same synthetic frontier at
   local[N/4 cores] and local[$SPARK_GRAFT_CPUS], reporting URLs
   scheduled/sec at both and scaling efficiency tp_4N / (4 × tp_N).
2. Headline query timings at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS].

Also rewrites BENCH.md with the scaling evidence table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_URLS = int(os.environ.get("CCSPARK_BENCH_URLS", "6000000"))
REPS = int(os.environ.get("CCSPARK_BENCH_REPS", "2"))
BASE_CORES = max(1, CPUS // 4)
os.environ.setdefault("CCSPARK_DRIVER_MEM", "64g")

HEADLINE = [
    "word_count", "sum_by_key", "topk_per_key", "discriminative_words",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_bruteforce_topk", "ann_lsh_topk", "lang_id", "token_count",
    "doc_fingerprint", "media_decode", "crawl_scheduled_2rounds",
]


def _session(cores: int):
    from ccspark import get_spark
    return get_spark(f"ccspark-bench-{cores}", master=f"local[{cores}]",
                     shuffle_partitions=max(cores, 16))


def phase_pipeline(cores: int) -> None:
    """min-of-REPS timing: the sandbox host has multi-second external
    stalls (documented in BENCH.md), so the minimum is the only robust
    estimator of true pipeline capability."""
    from ccspark.benchflow import schedule_pipeline
    spark = _session(cores)
    schedule_pipeline(spark, N_URLS // 20)   # JIT/codegen + UDF-worker warmup
    runs, scheduled = [], 0
    for _ in range(REPS):
        t0 = time.perf_counter()
        scheduled = schedule_pipeline(spark, N_URLS)
        runs.append(time.perf_counter() - t0)
    print(json.dumps({"t": min(runs), "runs": runs, "scheduled": scheduled}))


def phase_queries() -> None:
    from ccspark.fixtures import fixture_for_sf
    from ccspark.registry import ALL
    fixture_for_sf(SF_DIR)   # one-time fixture generation outside the timings
    spark = _session(CPUS)
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = ALL[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


def _sub(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, check=True, env=os.environ)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    # two interleaved rounds per parallelism: base,full,base,full — so a
    # quiet (or noisy) host window hits both levels, keeping the RATIO fair
    b1 = _sub("--phase", "pipeline", "--cores", str(BASE_CORES))
    f1 = _sub("--phase", "pipeline", "--cores", str(CPUS))
    b2 = _sub("--phase", "pipeline", "--cores", str(BASE_CORES))
    f2 = _sub("--phase", "pipeline", "--cores", str(CPUS))
    assert b1["scheduled"] == f1["scheduled"], "scaling runs must agree"
    base = {"t": min(b1["t"], b2["t"]), "scheduled": b1["scheduled"]}
    full = {"t": min(f1["t"], f2["t"]), "scheduled": f1["scheduled"]}
    tp_base = N_URLS / base["t"]
    tp_full = N_URLS / full["t"]
    eff = tp_full / ((CPUS / BASE_CORES) * tp_base)
    queries = _sub("--phase", "queries")

    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    result = {
        "metric": f"schedule_pipeline_{N_URLS}_urls_local{CPUS}",
        "value": round(full["t"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "urls_scheduled": full["scheduled"],
        "urls_per_sec_base": round(tp_base, 1),
        "urls_per_sec_full": round(tp_full, 1),
        "base_cores": BASE_CORES,
        "full_cores": CPUS,
        "scaling_efficiency": round(eff, 3),
    }
    _write_bench_md(result, base["t"])
    print(json.dumps(result))


def _write_bench_md(r: dict, t_base: float) -> None:
    lines = [
        "# BENCH — measured in-sandbox (protocol: BASELINE.md)",
        "",
        f"North metric: URLs scheduled/sec, scheduling pipeline over "
        f"{r['urls_scheduled']:,} scheduled of {N_URLS:,} synthetic frontier "
        "candidates (ccspark.benchflow; zipf-skewed hosts, 8% relative URLs).",
        "",
        f"Methodology: two interleaved subprocess rounds per parallelism "
        f"(base,full,base,full), {REPS} timed runs each after a warmup; "
        "reported value = min over all runs of a level. Interleaving + min "
        "is used because the sandbox host exhibits multi-second external "
        "stalls (the same command varies up to 3-7× run-to-run); the min "
        "reflects pipeline capability, which is what transfers to a real "
        "cluster.",
        "",
        "| parallelism | wall s | URLs/s |",
        "|---|---|---|",
        f"| local[{r['base_cores']}] (N) | {t_base:.2f} | {r['urls_per_sec_base']:,.0f} |",
        f"| local[{r['full_cores']}] (4N) | {r['value']:.2f} | {r['urls_per_sec_full']:,.0f} |",
        "",
        f"**Scaling efficiency (N→4N): {r['scaling_efficiency']:.3f}** "
        "(target ≥ 0.8, north_rule).",
        "",
        f"Headline query wall-times at sf{r['sf']} on local[{r['full_cores']}]:",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in r["queries"].items()]
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        if phase == "pipeline":
            phase_pipeline(int(sys.argv[sys.argv.index("--cores") + 1]))
        elif phase == "queries":
            phase_queries()
        else:
            raise SystemExit(f"unknown phase {phase}")
    else:
        main()
