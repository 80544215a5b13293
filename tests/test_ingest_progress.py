"""I7 import-progress parity (Tyler.kt:52-54), Spark-first: the
streaming form is a StreamingQueryListener over the micro-batch
progress events; the batch form logs start/finish with the counts the
bulk route already computes. See streaming/progress.py."""

from __future__ import annotations

import json
import logging
import time

import pytest


@pytest.fixture()
def tmp_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("drop", "table", "rejects", "ckpt")}
    (tmp_path / "drop").mkdir()
    return d


def _write_ndjson(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_progress_listener_counts_and_logs(spark, tmp_dirs, caplog):
    from tank_spark.streaming.ingest import start_ingest_stream
    from tank_spark.streaming.progress import attach_ingest_progress

    rows = [{"id": f"r{i}", "lon": float(i % 90), "lat": float(i % 45),
             "kind": "poi"} for i in range(25)]
    _write_ndjson(f"{tmp_dirs['drop']}/b1.ndjson", rows[:10])
    _write_ndjson(f"{tmp_dirs['drop']}/b2.ndjson", rows[10:])

    listener = attach_ingest_progress(spark)
    try:
        with caplog.at_level(logging.INFO, logger="tank_spark.ingest"):
            q = start_ingest_stream(
                spark, tmp_dirs["drop"], tmp_dirs["table"],
                tmp_dirs["rejects"], tmp_dirs["ckpt"],
                max_files_per_trigger=1,  # force >= 2 epochs
            )
            qid = str(q.id)
            q.awaitTermination(120)
            # listener events are delivered asynchronously after the
            # query terminates — poll briefly for the final callback
            for _ in range(100):
                if listener.finished.get(qid) is not None:
                    break
                time.sleep(0.2)
        assert listener.finished.get(qid) == 25  # every input row seen
        assert listener.totals[qid] == 25
        msgs = [r.getMessage() for r in caplog.records]
        assert any("features importing starts" in m for m in msgs)
        stored = [m for m in msgs if "features stored" in m]
        assert len(stored) >= 2  # one line per epoch, >= 2 epochs forced
        assert any("#25 features importing finished" in m for m in msgs)
    finally:
        spark.streams.removeListener(listener)


def test_bulk_ingest_logs_start_and_finish(spark, tmp_path, caplog):
    from tank_spark.api import Tank

    layer = Tank(spark, str(tmp_path / "tbl"))
    rows = [json.dumps({"id": "a", "lon": 1.0, "lat": 2.0, "kind": "poi"}),
            json.dumps({"id": "bad", "kind": "poi"})]  # no geometry
    with caplog.at_level(logging.INFO, logger="tank_spark.ingest"):
        res = layer.ingest_features(rows)
    assert res["accepted"] == 1 and res["rejected"] == 1
    msgs = [r.getMessage() for r in caplog.records]
    assert any("features importing starts" in m for m in msgs)
    fin = [m for m in msgs if "importing finished" in m]
    assert fin and "#2 features importing finished" in fin[-1]
    assert "accepted=1" in fin[-1] and "rejected=1" in fin[-1]
