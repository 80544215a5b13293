"""Driver-shaped check: run every round-9 window entry at sf0.01 —
oracle entries through tests.oracle_util.compare, rows-only entries as
run+count — and print a PASS/FAIL line each."""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions","16")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false")
    .config("spark.ui.showConsoleProgress","false")
    .config("spark.driver.memory","32g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tank_spark.plans.registry import load_all, PRIORITY, STAGED
from tests.oracle_util import compare
reg = load_all()
fails = 0
for name in tuple(PRIORITY) + tuple(STAGED):
    t0 = time.time()
    q = reg.get(name)
    if q is None:
        # load_all tolerates per-module import failures by design — a
        # missing entry is a FAIL line, never a sweep abort
        print(f"FAIL {name}: not registered (module import failed?)",
              flush=True)
        fails += 1
        continue
    try:
        if q.oracle is None:
            n = q.spark(spark, "/root/testdata/sf0.01").count()
            print(f"PASS rows-only {name} rows={n} {time.time()-t0:.1f}s", flush=True)
        else:
            compare(spark, "/root/testdata/sf0.01", name)
            print(f"PASS oracle {name} {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        fails += 1
        print(f"FAIL {name}: {e}", flush=True)
        traceback.print_exc()
print("DONE fails =", fails)
