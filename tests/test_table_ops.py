"""Mutation tests: bucket-partitioned feature table write, delete by uid,
tile-range delete, update-in-place semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def table_dir(spark, tmp_path):
    from tank_spark.operators.table_ops import write_feature_table
    from tank_spark.sources.features import features_df

    d = str(tmp_path / "features")
    write_feature_table(features_df(spark, SF_DIR).drop("ts"), d)
    return d


def test_write_and_read_roundtrip(spark, table_dir):
    from tank_spark.operators.table_ops import read_feature_table
    from tank_spark.sources.features import features_df

    df = read_feature_table(spark, table_dir)
    assert df.count() == features_df(spark, SF_DIR).count()
    # bucket column is the on-disk partition and matches hash % 64
    bad = df.filter(F.col("bucket") != F.pmod(F.col("hash"), F.lit(64))).count()
    assert bad == 0


def test_bucket_pruning_visible_in_plan(spark, table_dir):
    from tank_spark.operators.table_ops import read_feature_table

    df = read_feature_table(spark, table_dir).filter(F.col("bucket") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_delete_by_uid(spark, table_dir):
    from tank_spark.operators.table_ops import delete_by_uid, read_feature_table

    before = read_feature_table(spark, table_dir).count()
    n = delete_by_uid(spark, table_dir, "feat-8001")
    assert n == 1
    after = read_feature_table(spark, table_dir)
    assert after.count() == before - 1
    assert after.filter(F.col("uid") == "feat-8001").count() == 0
    # deleting a missing uid is a no-op
    assert delete_by_uid(spark, table_dir, "feat-nope") == 0
    assert read_feature_table(spark, table_dir).count() == before - 1


def test_delete_tile_range(spark, table_dir):
    from tank_spark.operators.table_ops import delete_tile, read_feature_table
    from tank_spark.operators.tiles import tile_hash_range

    lo, hi = tile_hash_range(11, 320, 784)
    df = read_feature_table(spark, table_dir)
    before = df.count()
    in_range = df.filter(F.col("hash").between(lo, hi)).count()
    assert in_range > 0
    n = delete_tile(spark, table_dir, 11, 320, 784)
    assert n == in_range
    # fresh read: the pre-delete DataFrame is a stale snapshot whose plan
    # pins the old file names
    after = read_feature_table(spark, table_dir)
    assert after.filter(F.col("hash").between(lo, hi)).count() == 0
    assert after.count() == before - in_range


def test_update_by_uid(spark, table_dir):
    from tank_spark.operators.table_ops import read_feature_table, update_by_uid

    # uid is NOT unique (the reference's PK is ((hash), uid, timestamp) —
    # several rows may share a uid; the driver's lineitem has duplicate
    # (orderkey, linenumber) pairs, so derived uids repeat too): the update
    # touches every copy
    n = update_by_uid(spark, table_dir, "feat-4005",
                      {"score": 99.5, "tag": "tag-upd"})
    assert n >= 1
    df = read_feature_table(spark, table_dir)
    rows = df.filter(F.col("uid") == "feat-4005").collect()
    assert len(rows) == n
    assert all(r["score"] == 99.5 and r["tag"] == "tag-upd" for r in rows)
    # untouched rows keep their values; row count unchanged
    other = df.filter(F.col("uid") == "feat-8001").collect()[0]
    assert other["tag"].startswith("tag") and other["tag"] != "tag-upd"


def test_compact_table_merges_ingest_fragments(spark, table_dir):
    """Micro-batch appends fragment buckets into many small files;
    compaction rewrites each fragmented bucket to one hash-sorted file
    with the row set unchanged."""
    import os

    from tank_spark.operators.table_ops import (
        compact_table, read_feature_table,
    )

    base = read_feature_table(spark, table_dir)
    # simulate three streaming micro-batch appends (one file per batch
    # per touched bucket, exactly like the foreachBatch sink)
    extra = base.limit(30).withColumn("uid", F.concat(F.lit("frag-"), F.col("uid")))
    for _ in range(3):
        (extra.repartition(1).write.mode("append")
         .partitionBy("bucket").parquet(table_dir))
    spark.catalog.refreshByPath(table_dir)

    def files_per_bucket():
        out = {}
        for e in os.listdir(table_dir):
            if e.startswith("bucket="):
                out[int(e.split("=")[1])] = len([
                    f for f in os.listdir(os.path.join(table_dir, e))
                    if f.endswith(".parquet")
                ])
        return out

    before_rows = sorted(
        (r["uid"], r["hash"]) for r in read_feature_table(spark, table_dir)
        .select("uid", "hash").collect()
    )
    before_files = files_per_bucket()
    assert any(n >= 2 for n in before_files.values())

    compacted = compact_table(spark, table_dir)
    assert set(compacted) == {b for b, n in before_files.items() if n >= 2}

    after_files = files_per_bucket()
    assert all(n == 1 for n in after_files.values())
    after_rows = sorted(
        (r["uid"], r["hash"]) for r in read_feature_table(spark, table_dir)
        .select("uid", "hash").collect()
    )
    assert after_rows == before_rows

    # idempotent: nothing left to compact
    assert compact_table(spark, table_dir) == {}


def test_update_by_uid_preserves_typed_column_schema(spark, tmp_path):
    """Updating a declared date/int attribute with a string value must not
    coerce the column to string in the rewritten bucket (schema drift
    across buckets breaks the next table read)."""
    import json as _json

    from tank_spark.api import Tank
    from tank_spark.operators.table_ops import read_feature_table

    d = str(tmp_path / "layer")
    t = Tank(spark, d, attr_fields="category text, rank int, seen date")
    t.ingest_features([
        _json.dumps({"id": "u1", "lon": 10.0, "lat": 50.0,
                     "category": "a", "rank": "1", "seen": "2024-01-01"}),
        _json.dumps({"id": "u2", "lon": 10.0, "lat": 50.0,
                     "category": "b", "rank": "2", "seen": "2024-02-02"}),
    ])
    before = dict(read_feature_table(spark, d).dtypes)
    assert t.update_feature("u1", {"rank": "7", "seen": "2025-03-04"}) == 1
    after = read_feature_table(spark, d)
    assert dict(after.dtypes) == before          # no type drift
    row = after.filter(after["uid"] == "u1").collect()[0]
    assert row["rank"] == 7
    assert str(row["seen"]) == "2025-03-04"
    # the untouched row is intact
    other = after.filter(after["uid"] == "u2").collect()[0]
    assert other["rank"] == 2 and str(other["seen"]) == "2024-02-02"
