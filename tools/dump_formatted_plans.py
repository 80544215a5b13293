#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to plans/$SPARK_GRAFT_ROUND/
(default r14).

Usage: python tools/dump_formatted_plans.py SUFFIX [name ...]
SUFFIX is 'before' or 'after'; with no names, dumps every bench.HEADLINE
query. The judge checks plan claims against these files (optimization
deliverable), so they are committed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1]
names = sys.argv[2:]

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .appName("dump_plans")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from bench import HEADLINE
from tank_spark.plans.registry import load_all

reg = load_all()
if not names:
    names = list(HEADLINE)

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("SPARK_GRAFT_ROUND", "r14"))
os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

for name in names:
    try:
        df = reg[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:  # noqa: BLE001 - a plan dump must not die mid-list
        plan = f"ERROR building plan: {e}\n"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"dumped {name}_{suffix}.txt ({len(plan)} bytes)")

spark.stop()
