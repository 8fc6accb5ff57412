"""sf1 scale-decade demo: the stateful engine loop at ~60M synthetic
candidates with automatic partition evolution (rebucket_target_keys) ON,
versus an identical policy-OFF run — the measured evidence behind the
10^10 in-place P→P' growth story (VERDICT r4 ask #2).

What it records (one JSON line to stdout + BENCH_rebucket_sf1.json):
  - per-round walls, urls scheduled/s, and the `rebucketed_to` metric
    firing live in the round log of record,
  - per-bucket filter-blob sizes and key counts before/after each
    evolution (read from the persisted filter table),
  - scheduled-output equality vs the no-policy run at the same sf
    (the test_rebucket layout-only invariant, at bench scale): count +
    order-independent xxhash64 checksum over (fetch_round, url,
    fetch_offset_ms).

Run detached (60-90 min class):
  setsid nohup python scripts/bench_rebucket_sf1.py > /tmp/rb_sf1.log 2>&1 &
Knobs: SF (default 1.0 → 6M candidates/round x 10 rounds = 60M),
ROUNDS, CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ccspark import get_spark  # noqa: E402
from ccspark.benchflow import synthetic_candidates  # noqa: E402
from ccspark.fixtures import make_crawl_fixture  # noqa: E402
from ccspark.params import CrawlParams  # noqa: E402
from ccspark.scheduler import CrawlEngine  # noqa: E402

SF = float(os.environ.get("SF", "1.0"))
ROUNDS = int(os.environ.get("ROUNDS", "10"))
# sf0.1 = the standing 6M-candidate bench; sf1 = 60M total, split so
# each round is one old-bench-sized batch of fresh candidates
PER_ROUND = int(60_000_000 * SF / ROUNDS)
CPUS = os.environ.get("CPUS", os.environ.get("SPARK_GRAFT_CPUS", "16"))
WORK = os.environ.get("WORK", "/tmp/rb_sf1")
# target keys/bucket chosen so the 60M-key endpoint wants ~256 buckets
# from a 32-bucket start: three in-place doublings fire mid-run
TARGET = int(os.environ.get("TARGET", "250000"))
START_PARTS = 32


def blob_profile(eng):
    """Per-bucket filter state of record: (n buckets, keys min/avg/max,
    blob bytes min/avg/max) — driver-side aggregate over the persisted
    (bucket, bitmap, n) table."""
    df = eng.seen._filter_df()
    if df is None:
        return None
    row = df.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.min("n").alias("kmin"), F.avg("n").alias("kavg"),
        F.max("n").alias("kmax"),
        F.min(F.length("bitmap")).alias("bmin"),
        F.avg(F.length("bitmap")).alias("bavg"),
        F.max(F.length("bitmap")).alias("bmax")).collect()[0]
    return {"buckets": int(row.buckets), "keys_min": int(row.kmin),
            "keys_avg": round(float(row.kavg), 1), "keys_max": int(row.kmax),
            "blob_bytes_min": int(row.bmin),
            "blob_bytes_avg": round(float(row.bavg), 1),
            "blob_bytes_max": int(row.bmax)}


def sched_checksum(eng):
    """Order-independent equality key for the full scheduled output."""
    row = (eng.scheduled_rounds()
           .select(F.xxhash64("fetch_round", "url", "fetch_offset_ms")
                   .alias("h"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("s"))
           .collect()[0])
    return int(row.n), str(row.s)


def run_config(spark, fx, name, rebucket):
    state = os.path.join(WORK, name)
    shutil.rmtree(state, ignore_errors=True)
    params = CrawlParams(
        rounds=ROUNDS, seen_partitions=START_PARTS,
        compact_seen_every=4,
        rebucket_target_keys=(TARGET if rebucket else None))
    eng = CrawlEngine(spark, state, fx["documents"], fx["seeds"],
                      fx["robots"], params=params,
                      bits_per_bucket=1 << 23)  # 1 MiB/bucket bloom
    out = {"name": name, "rounds": [], "evolutions": []}
    t_all = time.perf_counter()
    for r in range(ROUNDS):
        cand = synthetic_candidates(spark, PER_ROUND, start=r * PER_ROUND)
        before = blob_profile(eng) if rebucket else None
        t0 = time.perf_counter()
        eng.run_round(r, cand)
        wall = time.perf_counter() - t0
        m = eng.store.last_round()["metrics"]
        rec = {"round": r, "wall_s": round(wall, 2),
               "candidates_in": m["candidates_in"],
               "new_seen": m["new_seen"], "seen_total": m["seen_total"],
               "scheduled": m["scheduled"],
               "urls_per_s": round(m["scheduled"] / wall, 1),
               "seen_partitions": eng.seen.partitions}
        if "rebucketed_to" in m:
            rec["rebucketed_to"] = m["rebucketed_to"]
            out["evolutions"].append({
                "round": r, "to_partitions": m["rebucketed_to"],
                "blob_profile_before": before,
                "blob_profile_after": blob_profile(eng)})
        out["rounds"].append(rec)
        print(json.dumps(rec), flush=True)
    out["total_wall_s"] = round(time.perf_counter() - t_all, 2)
    out["final_partitions"] = eng.seen.partitions
    n, s = sched_checksum(eng)
    out["scheduled_total"] = n
    out["scheduled_checksum"] = s
    out["urls_per_s_total"] = round(
        sum(r["scheduled"] for r in out["rounds"]) / out["total_wall_s"], 1)
    # every persisted seen row follows the live modulus (the rebucket
    # invariant, verified on the evolved store at bench scale)
    p = eng.seen.partitions
    out["misbucketed_rows"] = int(
        eng.seen.seen_df()
        .filter(F.pmod(F.col("url_hash"), F.lit(p)).cast("int")
                != F.col("bucket")).count())
    return out


def main():
    os.makedirs(WORK, exist_ok=True)
    fx = make_crawl_fixture(os.path.join(WORK, "fx"), n_docs=50, seed=7)
    spark = get_spark("rb_sf1", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    res = {"sf": SF, "per_round": PER_ROUND, "rounds": ROUNDS,
           "target_keys_per_bucket": TARGET,
           "start_partitions": START_PARTS, "cpus": CPUS}
    res["evo"] = run_config(spark, fx, "evo", rebucket=True)
    res["base"] = run_config(spark, fx, "base", rebucket=False)
    res["scheduled_equal"] = (
        res["evo"]["scheduled_total"] == res["base"]["scheduled_total"]
        and res["evo"]["scheduled_checksum"] == res["base"]["scheduled_checksum"])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_rebucket_sf1.json")
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({k: res[k] for k in
                      ("sf", "scheduled_equal")} |
                     {"evolutions": res["evo"]["evolutions"],
                      "final_partitions": res["evo"]["final_partitions"],
                      "evo_urls_per_s": res["evo"]["urls_per_s_total"],
                      "base_urls_per_s": res["base"]["urls_per_s_total"]},
                     default=str), flush=True)


if __name__ == "__main__":
    main()
