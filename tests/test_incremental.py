"""Incremental aggregate maintenance: equality with full recompute after
every round, across compaction, and under time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccspark.incremental import IncrementalAgg, _word_rows


def _full(rows):
    return {(r.word,): r.cnt for r in
            rows.groupBy("word").agg(F.sum("cnt").cast("bigint")
                                     .alias("cnt")).collect()}


def _got(agg, version=None):
    return {(r.word,): r.cnt for r in agg.read(version).collect()}


def test_incremental_equals_recompute_each_round(spark, sf_dir, tmp_path):
    rows = _word_rows(spark, sf_dir).cache()
    agg = IncrementalAgg(spark, str(tmp_path), "wc", ["word"], ["cnt"],
                         partitions=8)
    versions = {}
    for rnd in range(3):
        versions[rnd] = agg.fold(rows.filter(F.col("doc_id") % 3 == rnd), rnd)
        upto = rows.filter(F.col("doc_id") % 3 <= rnd)
        assert _got(agg) == _full(upto), f"divergence after round {rnd}"

    # compaction preserves the aggregate and collapses the live chain
    agg.compact(3)
    assert _got(agg) == _full(rows)
    assert agg.tbl.read_chain().count() == agg.read().count()

    # time travel: the aggregate as of round 0's commit
    assert _got(agg, versions[0]) == _full(rows.filter(F.col("doc_id") % 3 == 0))

    # new deltas after compaction keep folding correctly
    extra = (spark.createDataFrame([("zzz_new_word", 7, 1)],
                                   "word string, doc_id long, cnt int"))
    agg.fold(extra, 4)
    got = _got(agg)
    assert got[("zzz_new_word",)] == 1
    want = _full(rows)
    want[("zzz_new_word",)] = want.get(("zzz_new_word",), 0) + 1
    assert got == want
