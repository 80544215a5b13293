"""Cross-modality media dedup pipeline (multimodal.media_dedup_survivors):
image dHash + audio fingerprint + video temporal signature hashed once,
per-modality banded pairing, ONE connected-components pass, keep flags
for every media row.

The expected output is rebuilt from the INDEPENDENT pure-Python twins of
the three hash kernels (tests.test_multimodal._dhash_twin,
tests.test_audio._fp_twin, tests.test_video._sig_twin) plus a from-
scratch union-find — so neither the kernels nor the Spark CC can
self-certify."""

from __future__ import annotations

import hashlib


def pay(text: str) -> bytes:
    return (hashlib.md5(text.encode()).digest()
            + hashlib.md5((text + ":1").encode()).digest())


def _tweak(p: bytes, idx: int, delta: int) -> bytes:
    return p[:idx] + bytes([(p[idx] + delta) % 256]) + p[idx + 1:]


def _expected(rows) -> dict:
    """doc_id -> (modality, cluster, keep) per the planted-variant
    conventions of phash_media / fingerprint_media / signature_media."""
    from tank_spark.llm.multimodal import VARIANT_OFFSET
    from tests.test_audio import _fp_twin
    from tests.test_multimodal import _dhash_twin
    from tests.test_video import _sig_twin

    sigs: dict[int, tuple[str, int]] = {}
    for doc_id, text in rows:
        p = pay(text)
        if doc_id % 3 == 0:
            sigs[doc_id] = ("image", _dhash_twin(p))
            if doc_id % 15 == 0:
                sigs[doc_id + VARIANT_OFFSET] = (
                    "image", _dhash_twin(_tweak(p, 7, 8)))
        elif doc_id % 3 == 1:
            sigs[doc_id] = ("audio", _fp_twin(p))
            if doc_id % 15 == 1:
                sigs[doc_id + VARIANT_OFFSET] = (
                    "audio", _fp_twin(_tweak(p, 15, 4)))
        else:
            sigs[doc_id] = ("video", _sig_twin(p))
            if doc_id % 15 == 2:
                sigs[doc_id + VARIANT_OFFSET] = (
                    "video", _sig_twin(_tweak(p, 11, 8)))

    # per-modality pairs at true Hamming <= 3, then union-find
    parent = {i: i for i in sigs}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if sigs[a][0] != sigs[b][0]:
                continue
            d = (sigs[a][1] ^ sigs[b][1]) & (2**64 - 1)
            if bin(d).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, int] = {i: find(i) for i in sigs}
    return {
        i: (sigs[i][0], clusters[i], 1 if clusters[i] == i else 0)
        for i in sigs
    }


def test_media_dedup_survivors_matches_cross_modal_twin(spark):
    from tests.conftest import SF_DIR

    from tank_spark.llm.multimodal import media_dedup_survivors

    rows = [(r.doc_id, r.text) for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()]
    want = _expected(rows)
    got = {r.doc_id: (r.modality, r.cluster, r.keep)
           for r in media_dedup_survivors(spark, SF_DIR).collect()}
    assert got == want
    # the plant produces real work in every modality: at least one
    # dropped near-dup copy per modality, plus untouched singletons
    for mod in ("image", "audio", "video"):
        assert any(m == mod and k == 0 for m, _, k in want.values()), mod
        assert any(m == mod and k == 1 for m, _, k in want.values()), mod
    # clusters never span modalities (per-modality pairing by design)
    by_cluster: dict[int, set] = {}
    for m, c, _ in got.values():
        by_cluster.setdefault(c, set()).add(m)
    assert all(len(mods) == 1 for mods in by_cluster.values())


def test_media_dedup_survivors_plan_never_goes_cartesian(spark):
    from tests.conftest import SF_DIR

    from tank_spark.llm.multimodal import media_dedup_survivors

    plan = media_dedup_survivors(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _source_map(spark):
    from tests.conftest import SF_DIR

    return {r.doc_id: r.source for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("doc_id", "source").collect()}


def test_media_dedup_apply_is_kept_rows_with_provenance(spark):
    """apply = the curated corpus: exactly the keep=1 survivors, each
    carrying the SOURCE of its base document (variants inherit the
    base's source through the VARIANT_OFFSET high bit)."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.multimodal import VARIANT_OFFSET, media_dedup_apply

    rows = [(r.doc_id, r.text) for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()]
    srcs = _source_map(spark)
    want = {
        i: (mod, srcs[i - VARIANT_OFFSET if i >= VARIANT_OFFSET else i], c)
        for i, (mod, c, k) in _expected(rows).items() if k == 1
    }
    got = {r.doc_id: (r.modality, r.source, r.cluster)
           for r in media_dedup_apply(spark, SF_DIR).collect()}
    assert got == want
    # the apply actually drops something: strictly fewer rows than the
    # full survivor relation (the plant guarantees >= 1 dup/modality)
    assert len(got) < len(_expected(rows))


def test_media_dedup_report_aggregates_match_twin(spark):
    """report = per-(source, modality) counts/rates derived from the
    same independent twin expectation."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.multimodal import VARIANT_OFFSET, media_dedup_report

    rows = [(r.doc_id, r.text) for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()]
    srcs = _source_map(spark)
    agg: dict[tuple, dict] = {}
    for i, (mod, c, k) in _expected(rows).items():
        src = srcs[i - VARIANT_OFFSET if i >= VARIANT_OFFSET else i]
        a = agg.setdefault((src, mod), {"n": 0, "kept": 0, "clusters": set()})
        a["n"] += 1
        a["kept"] += k
        a["clusters"].add(c)
    want = {
        key: (a["n"], a["kept"], a["n"] - a["kept"], len(a["clusters"]),
              (a["n"] - a["kept"]) / a["n"])
        for key, a in agg.items()
    }
    got = {(r.source, r.modality):
           (r.n_media, r.n_kept, r.n_dropped, r.n_clusters, r.dup_rate)
           for r in media_dedup_report(spark, SF_DIR).collect()}
    assert got == want
