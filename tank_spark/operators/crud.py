"""Point access / CRUD as queries (reference SURVEY.md §2.2).

The reference's mutations (delete by uid, tile delete, update) are Cassandra
row operations. On an immutable columnar store the same semantics are a
rewrite: here each mutation is expressed as the SELECT describing the
post-mutation table (what a Delta MERGE/DELETE would materialize), which
keeps every one oracle-checkable. At scale the real write path would be
Delta/Iceberg row-level deletes; the *read* semantics below are identical.

Point lookup rides the same pruned-scan machinery as tiles: at 100 TB a
uid lookup is a scan unless the layout helps — the reference used a
secondary index (application.kt:701-704); the Spark answer is file-level
data skipping (bloom filters / Delta stats on uid), orthogonal to the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.operators.tiles import tile_hash_range
from tank_spark.plans.registry import register
from tank_spark.sources.features import FEATURES_CTE, features_df

_LOOKUP_UID = "feat-8001"
_DELETE_UID = "feat-12345"
# must exist at EVERY SF and be UNIQUE at every SF (feat-16009 existed
# only at sf0.01+, leaving the sf0.001 pytest parity row vacuous — same
# class as the r6 q5 finding; a non-unique uid fans the partition join
# out); feat-101 is unique at all 3 SFs and its partition holds >= 5
# rows, so the CASE rewrite exercises updated AND untouched branches
_UPDATE_UID = "feat-101"


@register(
    "point_lookup_uid",
    f"{FEATURES_CTE} SELECT uid, hash, kind, score, cnt, tag, lon, qty "
    f"FROM features WHERE uid = '{_LOOKUP_UID}'",
    doc="C1: point lookup by feature id (reference application.kt:279-300)",
)
def point_lookup_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        features_df(spark, sf_dir)
        .filter(F.col("uid") == _LOOKUP_UID)
        .select("uid", "hash", "kind", "score", "cnt", "tag", "lon", "qty")
    )


@register(
    "delete_by_uid",
    f"{FEATURES_CTE} SELECT COUNT(*) AS n_remaining, CAST(SUM(cnt) AS BIGINT) AS sum_cnt "
    f"FROM features WHERE uid <> '{_DELETE_UID}'",
    doc="C2: delete by uid -> post-delete table summary (application.kt:302-315)",
)
def delete_by_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        features_df(spark, sf_dir)
        .filter(F.col("uid") != _DELETE_UID)
        .agg(F.count(F.lit(1)).alias("n_remaining"), F.sum("cnt").alias("sum_cnt"))
    )


_TILE_DEL = tile_hash_range(11, 320, 784)  # partition delete target


@register(
    "delete_tile",
    f"{FEATURES_CTE} SELECT kind, COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS sum_cnt "
    f"FROM features WHERE NOT (hash BETWEEN {_TILE_DEL[0]} AND {_TILE_DEL[1]}) "
    f"GROUP BY kind",
    doc="C4: tile (partition) delete -> survivors by kind (application.kt:476-520)",
)
def delete_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, hi = _TILE_DEL
    return (
        features_df(spark, sf_dir)
        .filter(~F.col("hash").between(lo, hi))
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("sum_cnt"))
    )


@register(
    "update_by_uid",
    f"{FEATURES_CTE} SELECT uid, kind, "
    f"CASE WHEN uid = '{_UPDATE_UID}' THEN 99.5 ELSE score END AS score, "
    f"CASE WHEN uid = '{_UPDATE_UID}' THEN 'tag-upd' ELSE tag END AS tag "
    f"FROM features WHERE hash = (SELECT hash FROM features WHERE uid = '{_UPDATE_UID}')",
    doc="C3: update by uid (MERGE semantics) shown over the affected partition",
)
def update_by_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = features_df(spark, sf_dir)
    # the reference re-reads the row to find its partition (application.kt:317-348);
    # same here: scalar subquery -> partition filter -> per-row CASE rewrite
    target_hash = feats.filter(F.col("uid") == _UPDATE_UID).select("hash")
    upd = F.col("uid") == _UPDATE_UID
    return (
        feats.join(F.broadcast(target_hash.withColumnRenamed("hash", "h")),
                   F.col("hash") == F.col("h"))
        .select(
            "uid", "kind",
            F.when(upd, F.lit(99.5)).otherwise(F.col("score")).alias("score"),
            F.when(upd, F.lit("tag-upd")).otherwise(F.col("tag")).alias("tag"),
        )
    )
