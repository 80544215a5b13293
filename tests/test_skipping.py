"""File-level data skipping (operators/skipping.py): the manifest scan
must be row-identical to the full-scan filter while reading strictly
fewer files, across clustered/unclustered layouts, boundary-straddling
ranges, all-prune and no-prune edges, and null-stat files."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _full(spark, path, col, lo, hi):
    return (spark.read.parquet(path)
            .filter(F.col(col).between(F.lit(lo), F.lit(hi))))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _files_scanned(df) -> int:
    return len(df.inputFiles())


def test_skipping_scan_equals_full_scan_and_prunes(spark, tmp_path):
    from tank_spark.operators.skipping import (
        build_manifest,
        prune_files,
        skipping_scan,
        write_clustered,
    )

    path = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_clustered(docs, path, "doc_id", n_files=8)
    man = build_manifest(spark, path, ["doc_id", "n_chars"])
    assert man.count() == 8
    # manifest totals reconcile with the table
    assert (man.agg(F.sum("n_rows")).first()[0] == docs.count())

    n = docs.count()
    lo, hi = int(n * 0.25), int(n * 0.35)  # ~10% of a 0..n-1 id space
    full = _full(spark, path, "doc_id", lo, hi)
    pruned = skipping_scan(spark, path, "doc_id", lo, hi)
    assert _rows(pruned.select("doc_id", "source")) == \
        _rows(full.select("doc_id", "source"))
    # the scale point: strictly fewer files listed/opened
    assert 1 <= len(prune_files(spark, path, "doc_id", lo, hi)) <= 2
    assert _files_scanned(pruned) < _files_scanned(full)


def test_skipping_boundary_straddle_and_edges(spark, tmp_path):
    from tank_spark.operators.skipping import (
        build_manifest,
        prune_files,
        skipping_scan,
        write_clustered,
    )

    path = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_clustered(docs, path, "doc_id", n_files=4)
    build_manifest(spark, path, ["doc_id"])
    n = docs.count()

    # a range straddling a file boundary must read both sides
    man_rows = sorted(
        (r["doc_id_min"], r["doc_id_max"])
        for r in spark.read.parquet(f"{path}/_manifest").collect())
    edge = man_rows[0][1]  # first file's max
    full = _full(spark, path, "doc_id", edge, edge + 1)
    got = skipping_scan(spark, path, "doc_id", edge, edge + 1)
    assert _rows(got.select("doc_id")) == _rows(full.select("doc_id"))
    assert len(prune_files(spark, path, "doc_id", edge, edge + 1)) == 2

    # all-prune edge: empty result, correct schema, zero files kept
    out = skipping_scan(spark, path, "doc_id", n + 10, n + 20)
    assert out.count() == 0
    assert out.schema == docs.schema
    assert prune_files(spark, path, "doc_id", n + 10, n + 20) == []

    # no-prune edge: full range keeps every file and every row
    assert len(prune_files(spark, path, "doc_id", 0, n)) == 4
    assert skipping_scan(spark, path, "doc_id", 0, n).count() == n


def test_skipping_safe_on_unclustered_layout(spark, tmp_path):
    """On a layout with overlapping file ranges the manifest keeps more
    files (weak skipping) but the result must stay identical — layout
    affects COST only, never correctness."""
    from tank_spark.operators.skipping import build_manifest, skipping_scan

    path = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # hash repartition: every file spans ~the whole id range
    docs.repartition(6, "source").write.mode("overwrite").parquet(path)
    build_manifest(spark, path, ["doc_id"])
    n = docs.count()
    lo, hi = int(n * 0.4), int(n * 0.5)
    assert _rows(skipping_scan(spark, path, "doc_id", lo, hi)
                 .select("doc_id")) == \
        _rows(_full(spark, path, "doc_id", lo, hi).select("doc_id"))


def test_all_null_stat_files_prune_safely(spark, tmp_path):
    """A file whose indexed column is entirely null has null stats and
    is prunable: range predicates never match null. Files with SOME
    nulls keep their non-null min/max and survive pruning."""
    from tank_spark.operators.skipping import (
        build_manifest,
        prune_files,
        skipping_scan,
    )

    path = str(tmp_path / "t")
    a = spark.createDataFrame([(i, "a") for i in range(10)],
                              "v long, tag string")
    b = spark.createDataFrame([(None, "b")] * 5, "v long, tag string")
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    build_manifest(spark, path, ["v"])
    kept = prune_files(spark, path, "v", 3, 5)
    assert len(kept) == 1
    got = skipping_scan(spark, path, "v", 3, 5)
    assert _rows(got) == _rows(_full(spark, path, "v", 3, 5))
    assert got.count() == 3


def test_skipping_on_hive_partitioned_table(spark, tmp_path):
    """A directory-partitioned table must keep its partition columns in
    the pruned read (review r11: without basePath, reading leaf files
    directly silently dropped them) — and pruning on a non-partition
    column must still cut the file list."""
    from tank_spark.operators.skipping import (
        build_manifest,
        prune_files,
        skipping_scan,
    )

    path = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # partition by source; sort within so doc_id ranges stay tight
    (docs.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
         .write.mode("overwrite").partitionBy("source").parquet(path))
    build_manifest(spark, path, ["doc_id"])
    n = docs.count()
    lo, hi = int(n * 0.1), int(n * 0.2)
    full = _full(spark, path, "doc_id", lo, hi)
    got = skipping_scan(spark, path, "doc_id", lo, hi)
    assert set(got.columns) == set(docs.columns)  # source survives
    assert _rows(got.select("doc_id", "source")) == \
        _rows(full.select("doc_id", "source"))
    total = len(spark.read.parquet(path).inputFiles())
    assert len(prune_files(spark, path, "doc_id", lo, hi)) < total


def test_nan_stat_files_are_kept(spark, tmp_path):
    """A float file CONTAINING NaN has max=NaN (Spark's max treats NaN
    as greater than everything); NaN bounds nothing, so the file must
    be KEPT — the first driver-side rewrite pruned it via Python's
    NaN-comparisons-are-false and silently dropped in-range rows
    (review r11, second pass)."""
    from tank_spark.operators.skipping import (
        build_manifest,
        prune_files,
        skipping_scan,
    )

    path = str(tmp_path / "t")
    a = spark.createDataFrame([(5.0, "a"), (float("nan"), "a")],
                              "v double, tag string")
    b = spark.createDataFrame([(100.0, "b")], "v double, tag string")
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    build_manifest(spark, path, ["v"])
    kept = prune_files(spark, path, "v", 4.0, 6.0)
    assert len(kept) == 1  # the NaN-stat file stays, the 100.0 file prunes
    got = skipping_scan(spark, path, "v", 4.0, 6.0)
    assert _rows(got) == _rows(_full(spark, path, "v", 4.0, 6.0))
    assert got.count() == 1  # the 5.0 row survives


def test_manifest_is_invisible_to_table_readers(spark, tmp_path):
    """The manifest lives INSIDE the table directory under an
    underscore-prefixed dir, so plain readers of the table never see
    manifest rows."""
    from tank_spark.operators.skipping import build_manifest, write_clustered

    path = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_clustered(docs, path, "doc_id", n_files=3)
    build_manifest(spark, path, ["doc_id"])
    again = spark.read.parquet(path)
    assert again.count() == docs.count()
    assert again.schema == docs.schema
