"""Schema evolution on the snapshot chain (Iceberg add-column
semantics): a delta that adds a column must read back through
read_chain with earlier rows surfacing NULL, while fixed-schema chains
keep the merge-free fast path."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccspark.tables import SnapshotStore


def test_added_column_reads_as_null_for_old_rows(spark, tmp_path):
    t = SnapshotStore(spark, str(tmp_path / "st")).table("t")
    t.commit(spark.createDataFrame([("u1", 1)], "url string, a int"), 0)
    t.commit(spark.createDataFrame([("u2", 2, 7)],
                                   "url string, a int, hop int"), 1)
    got = {r.url: (r.a, r.hop) for r in t.read_chain().collect()}
    assert got == {"u1": (1, None), "u2": (2, 7)}
    # manifests record the column sets of record
    assert t.meta(1)["columns"] == ["url", "a"]
    assert t.meta(2)["columns"] == ["url", "a", "hop"]


def test_fixed_schema_chain_skips_merge(spark, tmp_path):
    t = SnapshotStore(spark, str(tmp_path / "st")).table("t")
    t.commit(spark.createDataFrame([("u1", 1)], "url string, a int"), 0)
    t.commit(spark.createDataFrame([("u2", 2)], "url string, a int"), 1)
    assert {r.url for r in t.read_chain().collect()} == {"u1", "u2"}


def test_compaction_materializes_evolved_schema(spark, tmp_path):
    """After compact_chain the evolved column is baked into the 'full'
    snapshot; subsequent same-schema deltas read merge-free."""
    t = SnapshotStore(spark, str(tmp_path / "st")).table("t")
    t.commit(spark.createDataFrame([("u1", 1)], "url string, a int"), 0)
    t.commit(spark.createDataFrame([("u2", 2, 7)],
                                   "url string, a int, hop int"), 1)
    t.compact_chain(2)
    t.commit(spark.createDataFrame([("u3", 3, 8)],
                                   "url string, a int, hop int"), 3)
    got = {r.url: r.hop for r in t.read_chain().collect()}
    assert got == {"u1": None, "u2": 7, "u3": 8}
    base_cols = t.meta(t.latest_version() - 1)["columns"]
    assert "hop" in base_cols
