"""Unit tests for the recrawl-scheduling module: AS-OF join semantics on
hand-built fixtures (the oracle test covers the sf tables; these pin the
edge cases a fixture may not exercise) plus the single-shuffle plan
property the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccspark.recrawl import asof_join_latest


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "host long, fetch_ms long, fetch_id long")
    right = spark.createDataFrame(right_rows, "host long, ts_ms long, gen_id long")
    out = asof_join_latest(left, right, key="host", left_ts="fetch_ms",
                           right_ts="ts_ms", value_col="gen_id")
    return {r["fetch_id"]: r["gen_id"] for r in out.collect()}


class TestAsofSemantics:
    def test_latest_at_or_before_wins(self, spark):
        got = _asof(spark,
                    [(1, 100, 10), (1, 250, 11), (1, 999, 12)],
                    [(1, 50, 500), (1, 200, 600), (1, 300, 700)])
        assert got == {10: 500, 11: 600, 12: 700}

    def test_equal_timestamp_is_inclusive(self, spark):
        # a generation stamped AT the fetch instant is in force for it
        got = _asof(spark, [(1, 200, 10)], [(1, 100, 500), (1, 200, 600)])
        assert got == {10: 600}

    def test_fetch_before_first_gen_is_null(self, spark):
        got = _asof(spark, [(1, 10, 10), (1, 60, 11)], [(1, 50, 500)])
        assert got == {10: None, 11: 500}

    def test_keys_do_not_leak_across_hosts(self, spark):
        got = _asof(spark,
                    [(1, 100, 10), (2, 100, 20)],
                    [(1, 50, 500), (2, 90, 900)])
        assert got == {10: 500, 20: 900}

    def test_multiple_fetches_share_one_gen(self, spark):
        got = _asof(spark,
                    [(1, 100, 10), (1, 100, 11), (1, 101, 12)],
                    [(1, 99, 500)])
        assert got == {10: 500, 11: 500, 12: 500}


class TestCaptureHistoryPlans:
    def test_crawl_diff_is_one_exchange(self, spark):
        """The snapshot diff is a single conditional aggregation on url —
        regressing to the windowed two-branch full-outer join costs 4."""
        from ccspark.cdx import q_crawl_diff
        p = (q_crawl_diff(spark, "/root/testdata/sf0.001")
             ._jdf.queryExecution().executedPlan().toString())
        n_ex = sum(1 for ln in p.splitlines() if "Exchange hashpartitioning" in ln)
        assert n_ex == 1, f"{n_ex} exchanges:\n{p}"
        assert "SortMergeJoin" not in p and "Join" not in p

    def test_warc_revisit_is_one_exchange(self, spark):
        from ccspark.cdx import q_warc_revisit
        p = (q_warc_revisit(spark, "/root/testdata/sf0.001")
             ._jdf.queryExecution().executedPlan().toString())
        n_ex = sum(1 for ln in p.splitlines() if "Exchange hashpartitioning" in ln)
        assert n_ex == 1, f"{n_ex} exchanges:\n{p}"


class TestAsofPlan:
    def test_single_shuffle(self, spark):
        """The union-and-running-last composition must cost exactly ONE
        hash exchange (on the key) — the point of preferring it over a
        range join, which plans as a broadcast-nested-loop."""
        left = spark.range(1000).select(
            (F.col("id") % 7).alias("host"), F.col("id").alias("fetch_ms"),
            F.col("id").alias("fetch_id"))
        right = spark.range(100).select(
            (F.col("id") % 7).alias("host"), (F.col("id") * 9).alias("ts_ms"),
            F.col("id").alias("gen_id"))
        out = asof_join_latest(left, right, "host", "fetch_ms", "ts_ms",
                               "gen_id")
        p = out._jdf.queryExecution().executedPlan().toString()
        n_ex = sum(1 for ln in p.splitlines() if "Exchange hashpartitioning" in ln)
        assert n_ex == 1, f"{n_ex} exchanges:\n{p}"
        assert "BroadcastNestedLoop" not in p
