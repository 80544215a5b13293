"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The decode step is CONTENT-DISPATCHED then IMPORT-GUARDED
(``get_image_decoder``): a genuine binary-PGM payload always takes the
REAL stdlib netpbm parse (``_parse_pgm`` — the image twin of audio's
stdlib RIFF/WAVE parse and video's Y4M parse, exercised on crafted
genuine fixtures in tests); for other bytes the real PIL decode runs
when Pillow is importable on the executor, otherwise the clearly-marked
deterministic fake ``_decode_image_stub`` stands in (this container
ships no imaging libraries, so the stub branch is what the synthetic
corpus exercises — plus the PIL branch via an injected fake PIL).
Everything AROUND the decoder is the real production plumbing this module
exists to exercise: binary column schema, metadata struct, batch-iterator
UDF signature, per-batch vectorization, partition sizing.

The driver ships no binary table, so ``media_df`` derives one: each
document gets a synthetic payload whose bytes are the md5 keystream of its
text — deterministic, engine-reproducible (the metadata queries are
oracle-checked; the pixel-level kernel is rows-only).

Scale posture: media processing is the canonical mapInPandas workload —
map-only over the table, no shuffle; ``spark.sql.files.maxPartitionBytes``
(and at 100 TB, the blob-store chunking) sizes batches so a partition of
blobs fits executor memory; Arrow moves the bytes once per batch, not per
row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.llm import media_sql
from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

FAKE_W, FAKE_H = 32, 24  # synthetic "image" dimensions


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a derived binary payload column and metadata struct.

    payload = unhex(md5(text) || md5(text || ':1')) — 32 deterministic
    bytes standing in for an encoded image; media_type cycles by doc_id.
    """
    d = load(spark, sf_dir, "documents")
    payload = F.unhex(
        F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit(":1"))))
    )
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.lit(FAKE_W).alias("width"),
            F.lit(FAKE_H).alias("height"),
        ).alias("meta"),
    )


@register(
    "media_metadata",
    """
    SELECT doc_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                             ELSE 'video/mp4' END AS media_type,
           32 AS n_bytes,
           md5(text) AS payload_head_md5
    FROM documents
    """,
    doc="Multimodal metadata projection (binary column stays opaque; "
        "metadata is queryable like any column). Oracle-checked via the "
        "deterministic payload derivation.",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_df(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 16))).alias("payload_head_md5"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB — deterministic fake for the image decode step (the fallback
    when Pillow is not importable; see ``get_image_decoder``). Decode is
    simulated by treating the payload bytes as a tiny luma plane. Raises
    ValueError for payloads that are "corrupt" (too short), so the error
    path is real.
    """
    if len(payload) < 8:
        raise ValueError("corrupt payload")
    total = sum(payload)
    return {
        "mean_luma": total / len(payload) / 255.0,
        "max_byte": max(payload),
        "decoded_w": FAKE_W,
        "decoded_h": FAKE_H,
    }


def _decode_image_pil(payload: bytes) -> dict:
    """Real decode path: PIL open -> greyscale numpy plane -> the same
    feature dict the stub emits. Only reachable when Pillow imports
    (``get_image_decoder``); bytes that are not a decodable image raise
    ValueError so they land in ``decode_error`` like any corrupt row."""
    import io

    import numpy as np
    from PIL import Image

    if len(payload) < 8:
        raise ValueError("corrupt payload")
    try:
        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img.convert("L"), dtype=np.float64)
    except Exception as exc:  # PIL raises a zoo of types for bad bytes
        raise ValueError(f"decode failed: {exc}") from None
    return {
        "mean_luma": float(arr.mean()) / 255.0,
        "max_byte": int(arr.max()),
        "decoded_w": int(img.width),
        "decoded_h": int(img.height),
    }


def _parse_pgm(payload: bytes):
    """REAL stdlib parse of a binary netpbm PGM ("P5") greyscale image —
    the image twin of audio's stdlib RIFF/WAVE parse and video's Y4M
    parse: plain-text header (magic, width, height, maxval; '#' comment
    lines allowed) followed by the raw luma plane. Returns a 2-D float64
    array; malformed headers, unsupported maxval, and truncated planes
    raise ValueError so they land in the in-band error column."""
    import numpy as np

    pos, toks = 2, []
    n = len(payload)
    while len(toks) < 3 and pos < n:
        while pos < n and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < n and payload[pos] == ord("#"):  # comment to end of line
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in b" \t\r\n":
            pos += 1
        if pos > start:
            toks.append(payload[start:pos])
    if len(toks) < 3:
        raise ValueError("decode failed: truncated PGM header")
    pos += 1  # exactly one whitespace byte separates header and plane
    try:
        w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    except ValueError:
        raise ValueError("decode failed: non-numeric PGM header") from None
    if w <= 0 or h <= 0:
        raise ValueError("decode failed: bad PGM dimensions")
    if maxval != 255:
        raise ValueError(f"unsupported PGM maxval: {maxval}")
    if pos + w * h > n:
        raise ValueError("decode failed: truncated PGM plane")
    return (np.frombuffer(payload[pos:pos + w * h], dtype=np.uint8)
            .astype(np.float64).reshape(h, w))


def _is_pgm(payload: bytes) -> bool:
    """Content-dispatch guard. The PGM magic is only two bytes, weak
    enough that a random md5-keystream payload matches it with p ~
    1.5e-5 — which would divert a synthetic payload from the stub and
    silently diverge from the DuckDB oracle on a large corpus. Require
    magic + whitespace + a digit-or-comment start (p ~ 9e-9, matching
    the negligible-collision posture of the 4-byte RIFF and 9-byte
    YUV4MPEG2 magics)."""
    return (len(payload) >= 4 and payload[:2] == b"P5"
            and payload[2] in b" \t\r\n"
            and (payload[3:4].isdigit() or payload[3:4] == b"#"))


def _decode_image_pgm(payload: bytes) -> dict:
    """Feature dict of a REAL-parsed PGM payload — same fields as the
    stub/PIL paths."""
    arr = _parse_pgm(payload)
    return {
        "mean_luma": float(arr.mean()) / 255.0,
        "max_byte": int(arr.max()),
        "decoded_w": int(arr.shape[1]),
        "decoded_h": int(arr.shape[0]),
    }


def get_image_decoder():
    """The decode step, content-dispatched then import-guarded: a
    genuine binary-PGM payload ("P5" magic) ALWAYS takes the real
    stdlib parse (the same posture as audio's RIFF and video's Y4M
    dispatch); for everything else, the REAL Pillow decoder wherever the
    dependency exists, the deterministic stub otherwise. Resolved at
    kernel start ON THE EXECUTOR (each worker process probes its own
    environment), so a cluster with Pillow installed gets real features
    with zero code changes."""
    try:
        import PIL.Image  # noqa: F401
        fallback = _decode_image_pil
    except ImportError:
        fallback = _decode_image_stub

    def decode(payload: bytes) -> dict:
        if _is_pgm(payload):
            return _decode_image_pgm(payload)
        return fallback(payload)

    return decode


MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_type string, mean_luma double, max_byte int, "
    "decoded_w int, decoded_h int, decode_error string"
)


def _extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, decode payloads and emit
    feature rows; decode failures become rows with ``decode_error`` set
    (dead-letter-in-band, like ingest coercion). The decoder resolves
    once per kernel invocation — real PIL when importable, stub when not."""
    decode = get_image_decoder()
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            rec = {"doc_id": int(row.doc_id),
                   "media_type": row.meta["media_type"],
                   "mean_luma": None, "max_byte": None,
                   "decoded_w": None, "decoded_h": None, "decode_error": None}
            try:
                rec.update(decode(bytes(row.payload)))
            except ValueError as e:
                rec["decode_error"] = str(e)
            out.append(rec)
        yield pd.DataFrame(out)


@register(
    "media_extract_features",
    media_sql.MEDIA_EXTRACT_FEATURES_SQL,
    doc="Multimodal feature extraction via mapInPandas (decode step "
        "STUBBED deterministically; Spark-side plumbing — schema, Arrow "
        "batching, error-in-band — is real). Full oracle in this "
        "container: the stub decode is exact byte arithmetic over the "
        "md5 keystream, reproduced in SQL (media_sql.py; the real-PIL "
        "branch only activates where Pillow is installed).",
)
def media_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return media_df(spark, sf_dir).mapInPandas(_extract_kernel, MEDIA_FEATURES_SCHEMA)


N_FRAMES = 3
FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame_md5 string"


def _frame_sample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas fan-out kernel: each video row yields N_FRAMES frame
    rows (1 -> N). Frame extraction is STUBBED deterministically (ffmpeg
    absent): frame bytes are modeled as md5 over the payload hex plus the
    frame index (a VARCHAR digest, so the DuckDB oracle can reproduce it
    — DuckDB 1.0 has no BLOB md5); the real system swaps only the inner
    expression. The fan-out shape — batch in, multiple rows per input
    out — is the real plumbing."""
    import hashlib

    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            if row.meta["media_type"] != "video/mp4":
                continue
            payload = bytes(row.payload)
            for i in range(N_FRAMES):
                out.append({
                    "doc_id": int(row.doc_id),
                    "frame_idx": i,
                    "ts_ms": i * 1000,
                    "frame_md5": hashlib.md5(
                        f"{payload.hex()}:{i}".encode()).hexdigest(),
                })
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "ts_ms", "frame_md5"])


@register(
    "media_frame_sample",
    media_sql.MEDIA_FRAME_SAMPLE_SQL,
    doc="Video frame sampling via mapInPandas fan-out (decode stubbed): "
        "each video row emits N deterministic frame rows — the shape of "
        "frame extraction / chunking pipelines at scale (map-only, output "
        "cardinality N x inputs, no shuffle). Full oracle: the stub "
        "digest is a VARCHAR md5 DuckDB reproduces from the same payload "
        "derivation.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return media_df(spark, sf_dir).mapInPandas(_frame_sample_kernel, FRAME_SCHEMA)


# ------------------- perceptual-hash image near-dup (VERDICT r6 #3) ----
#
# The production-shaped multimodal operator: dHash (difference hash) per
# image, then Hamming-ball blocking via band buckets — the image-side
# twin of the MinHash-LSH text family, NOT an all-pairs scan. Public
# technique (dHash: Krawetz's "Kind of Like That" average/difference
# hash family; banding: the pigeonhole split used by every LSH join).
#
# Scale shape: hashing is a map-only mapInPandas over the image slice;
# banding explodes each 64-bit hash into PHASH_BANDS fixed slices; any
# pair within Hamming <= PHASH_HAM_T shares at least one intact band
# (pigeonhole: 3 flipped bits cannot touch all 4 bands), so the
# candidate join keys on (band_idx, band_val) and never goes quadratic
# in the corpus. Hot buckets (near-constant images: logos, test cards)
# are CAPPED like the LSH family's default posture — a bucket wider
# than PHASH_BUCKET_CAP is dropped before the self-join.

PHASH_BANDS = 4        # 4 x 16-bit bands -> all Hamming<=3 pairs survive
PHASH_HAM_T = 3
PHASH_BUCKET_CAP = 64  # skew guard, same default posture as dedup LSH


def _luma_plane_stub(payload: bytes):
    """STUB plane decode (no imaging libs in this container): the first
    32 payload bytes block-tile into a (FAKE_H, FAKE_W) luma plane — a
    4x8 grid of 6x4-pixel constant blocks. LOCALITY-PRESERVING by
    construction: a 1-byte payload change perturbs one block, i.e. a few
    pooled cells, so near-identical payloads give near-identical hashes
    (measured: 1-byte tweak -> Hamming 0-2; unrelated payloads -> >=12).
    """
    import numpy as np

    if len(payload) < 32:
        raise ValueError("corrupt payload")
    g = np.frombuffer(payload[:32], dtype=np.uint8).reshape(4, 8)
    return np.kron(g, np.ones((FAKE_H // 4, FAKE_W // 8), dtype=np.uint8)).astype(
        np.float64
    )


def _luma_plane_pil(payload: bytes):
    """Real decode path (used wherever Pillow imports): PIL -> greyscale
    numpy plane, any image size >= the pooling grid."""
    import io

    import numpy as np
    from PIL import Image

    if len(payload) < 8:
        raise ValueError("corrupt payload")
    try:
        img = Image.open(io.BytesIO(payload))
        return np.asarray(img.convert("L"), dtype=np.float64)
    except Exception as exc:
        raise ValueError(f"decode failed: {exc}") from None


def get_plane_decoder():
    """payload -> 2-D luma plane, content-dispatched + import-guarded
    like get_image_decoder: genuine "P5" PGM payloads take the REAL
    stdlib parse everywhere; other bytes go to PIL when importable,
    the deterministic stub plane otherwise."""
    try:
        import PIL.Image  # noqa: F401
        fallback = _luma_plane_pil
    except ImportError:
        fallback = _luma_plane_stub

    def decode(payload: bytes):
        if _is_pgm(payload):
            return _parse_pgm(payload)
        return fallback(payload)

    return decode


def dhash64(plane) -> int:
    """64-bit difference hash: mean-pool the plane to an 8x9 grid, emit
    1 where a cell is brighter than its left neighbour (8 rows x 8
    comparisons), packed MSB-first into a SIGNED 64-bit int (Spark
    LongType two's complement, same packing as dedup_simhash64)."""
    import numpy as np

    h, w = plane.shape
    if h < 8 or w < 9:
        raise ValueError(f"plane {h}x{w} smaller than pooling grid")
    rows = np.linspace(0, h, 9).astype(int)
    cols = np.linspace(0, w, 10).astype(int)
    g = np.add.reduceat(np.add.reduceat(plane, rows[:-1], axis=0), cols[:-1], axis=1)
    g = g / np.outer(np.diff(rows), np.diff(cols))
    code = 0
    for bit in (g[:, 1:] > g[:, :-1]).flatten():
        code = (code << 1) | int(bit)
    if code >= 1 << 63:
        code -= 1 << 64
    return code


PHASH_SCHEMA = "doc_id long, phash long"


def _phash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> (doc_id, phash). Decode
    failures drop the row (a near-dup pass has nothing to compare for an
    undecodable image; the decode-error audit lives in
    media_extract_features).

    r10: stub-plane rows hash through the VECTORIZED batch twin
    (media_np.dhash64_batch — one numpy call per Arrow batch instead of
    a per-row Python loop; bit-exact by the A/B pin in
    tests/test_media_np.py). Content dispatch unchanged: genuine PGM
    payloads take the real stdlib parse per row, and an importable
    Pillow routes every non-PGM row through the real PIL decode."""
    from tank_spark.llm import media_np

    decode = get_plane_decoder()
    try:
        import PIL.Image  # noqa: F401
        is_real = None  # real decoder available: all rows scalar
    except ImportError:
        is_real = _is_pgm
    for pdf in batches:
        out = media_np.hash_frame(
            pdf,
            lambda b: media_np.dhash64_batch(b.reshape(-1, 4, 8)),
            lambda p: dhash64(decode(p)),
            is_real if is_real is not None else (lambda p: True),
        )
        if len(out):  # yielding empties trips pandas' concat FutureWarning
            yield out


def phash_neardup_pairs(
    hashed: DataFrame,
    ham_t: int = PHASH_HAM_T,
    cap: int = PHASH_BUCKET_CAP,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, phash) -> near-dup pairs (doc_a, doc_b, hamming<=ham_t)
    via band-bucket blocking. All relational, JVM-side: band extraction
    is bit arithmetic, the exact Hamming check is bit_count(xor).

    ``key_cols`` names extra columns of ``hashed`` to add to the bucket
    key (and the hot-bucket aggregate): rows only pair within the same
    key-tuple. media_dedup_survivors passes ("modality",) so one banded
    join covers image+audio+video hashes without ever pairing across
    hash spaces."""
    # materialized like the text-LSH band relation: three consumers scan
    # it (the hot-bucket aggregate and both sides of the candidate join),
    # so without reuse the upstream Python hash kernel runs three times.
    # localCheckpoint(eager=True) rather than persist (ADVICE r7: the
    # persisted relation was never unpersisted, leaking cache entries
    # across invocations): same eager one-shot materialization — a lazy
    # cache would let the subtrees race and run the kernel up to 3x (the
    # dedup-family lesson, dedup.py:314) — but checkpoint blocks are
    # reclaimed by the ContextCleaner when the DataFrame is GC'd.
    bucket = ["band_idx", "band_val", *key_cols]
    bands = hashed.select(
        "doc_id", "phash", *key_cols,
        F.posexplode(F.array(*[
            F.shiftrightunsigned("phash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(PHASH_BANDS)
        ])).alias("band_idx", "band_val"),
    ).localCheckpoint(eager=True)
    hot = (
        bands.groupBy(*bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .select(*bucket)
    )
    bands = bands.join(hot, bucket, "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for k in bucket:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            .cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= ham_t)
        .distinct()
    )


# One offset for ALL modality variant rows (image/audio/video): a high
# bit rather than a small additive constant, so variant ids are
# collision-proof by construction (ADVICE r7: per-modality +1M/+2M/+3M
# offsets wrap into each other's id spaces once the corpus passes 1M
# docs). Injective for any real 0 <= doc_id < 2^62 — comfortably beyond
# any BIGINT doc-id scheme — and order-preserving: every variant id is
# larger than every real id, so min-id survivor selection always keeps
# the original. Base ids are distinct across modalities (one documents
# table, each doc exactly one modality), so one shared offset cannot
# collide across hash families either.
VARIANT_OFFSET = 1 << 62
PHASH_VARIANT_OFFSET = VARIANT_OFFSET  # backwards-compatible alias


def _with_variants(m: DataFrame, sel_mod: int, tweak_build,
                   name_key: str) -> DataFrame:
    """base (doc_id, payload) plus the every-5th tweaked variants as ONE
    memoized inline(filter(array(structs))) column (r14, the
    media_inc._inc_corpus_rows shape): one scan leg instead of a 2-leg
    unionByName — 16 partitions instead of 32 under the per-rep hash
    kernel checkpoint downstream, and one driver-side expression
    instead of a per-serve union assembly. Values identical leg by
    leg; only row order differs (every consumer joins/aggregates).
    ``tweak_build`` builds the variant payload Column (over the column
    NAME `payload`) inside the memo, keyed by ``name_key``."""
    from tank_spark.util import memo_col

    def build():
        did = F.col("doc_id")
        tweaked = tweak_build()

        def row(c, p):
            return F.struct(c.alias("doc_id"), p.alias("payload"))

        elems = F.array(
            row(did, F.col("payload")),
            F.when(did % 15 == sel_mod,
                   row(did + VARIANT_OFFSET, tweaked)),
        )
        return F.inline(F.filter(elems, lambda s: s.isNotNull()))

    return m.select(memo_col(("media_variants", name_key, sel_mod), build))


def phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image slice of media_df plus deterministic near-duplicate
    variants: every 5th image re-appears under doc_id+VARIANT_OFFSET
    with ONE payload byte bumped by 8 — the 're-encoded / lightly edited
    copy of the same image' case a perceptual-hash pass exists to catch
    (the base corpus has no image near-dups: payloads are md5 keystreams,
    so unrelated hashes sit at Hamming >= 12)."""
    m = (
        media_df(spark, sf_dir)
        .filter(F.col("meta.media_type") == "image/png")
        .select("doc_id", "payload")
    )

    def tweak():
        b8 = F.conv(F.hex(F.expr("substring(payload, 8, 1)")),
                    16, 10).cast("int")
        return F.concat(
            F.expr("substring(payload, 1, 7)"),
            F.unhex(F.lpad(F.hex((b8 + 8) % 256), 2, "0")),
            F.expr("substring(payload, 9, 24)"),
        )

    return _with_variants(m, 0, tweak, "image")  # every 5th image (ids = 3k)


@register(
    "image_phash_neardup",
    media_sql.IMAGE_PHASH_NEARDUP_SQL,
    doc="Perceptual-hash image near-duplicate pairs: dHash per image "
        "(mapInPandas; decode import-guarded, stub plane in this "
        "container), 16-bit band buckets for Hamming-ball blocking "
        "(pigeonhole: every Hamming<=3 pair shares an intact band), "
        "hot-bucket cap against near-constant-image skew, exact "
        "bit_count(xor) verify. Value-level twin in "
        "tests/test_multimodal.py pins the hashes and the pair set; the "
        "FULL oracle (media_sql.py) re-derives every dHash bit as exact "
        "integer comparisons over the md5 payload bytes and replays the "
        "banded join in SQL.",
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    hashed = phash_media(spark, sf_dir).mapInPandas(_phash_kernel, PHASH_SCHEMA)
    return phash_neardup_pairs(hashed)


@register(
    "image_phash_survivors",
    media_sql.IMAGE_PHASH_SURVIVORS_SQL,
    doc="Image dedup END-TO-END: dHash -> banded near-dup pairs -> "
        "connected components (reusing dedup.lsh_components — pointer-"
        "jumped min-label propagation, the same cluster policy as the "
        "text LSH family) -> one survivor per cluster (min doc_id). "
        "Every image appears in the output: keep=1 for cluster "
        "canonicals and untouched singletons, keep=0 for the near-"
        "duplicate copies a curation pass drops. Scale shape: the pair "
        "stage is image_phash_neardup's banded plan; CC iterates on the "
        "pair graph only (near-dup pairs, a tiny fraction of the "
        "corpus), never on the full image table.",
)
def image_phash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.dedup import lsh_components
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    # the hash kernel feeds BOTH the pair pipeline (consumed eagerly by
    # the CC checkpoint) and the final all-images join — without reuse
    # the Python kernel runs twice. localCheckpoint, not persist
    # (ADVICE r7: never-unpersisted caches accumulated across calls)
    hashed = (
        phash_media(spark, sf_dir)
        .mapInPandas(_phash_kernel, PHASH_SCHEMA)
        .localCheckpoint(eager=True)
    )
    pairs = phash_neardup_pairs(hashed).select(
        F.col("doc_a").alias("cid_a"), F.col("doc_b").alias("cid_b"))
    comp = lsh_components(pairs)
    return (
        hashed.select("doc_id")
        .join(comp, F.col("doc_id") == F.col("cid"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
            F.coalesce(F.col("is_canonical"), F.lit(1)).cast("int").alias("keep"),
        )
    )


@register(
    "media_dedup_survivors",
    media_sql.MEDIA_DEDUP_SURVIVORS_SQL,
    doc="Cross-modality media dedup in ONE pass: the image dHash, audio "
        "fingerprint, and video temporal-signature kernels each hash "
        "their slice (one persisted union relation, every kernel runs "
        "once), the banded Hamming join runs PER MODALITY (a near-dup "
        "relation is only meaningful within one hash space — no "
        "image-vs-audio false pairs by construction), the pair sets "
        "union into a single graph for ONE connected-components pass "
        "(dedup.lsh_components), and every media row comes back with "
        "(modality, cluster, keep). This is the curation call a user "
        "makes before training: one keep-flag relation for the whole "
        "media corpus instead of three dedup jobs to reconcile. Scale "
        "shape: hash kernels are map-only mapInPandas; each modality's "
        "candidate join is bounded by its 16-bit band buckets with the "
        "hot-bucket cap as skew backstop; CC iterates on the union pair "
        "graph only (near-dups, a tiny fraction of the corpus), never "
        "on the media table.",
)
def media_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _media_survivors_df(spark, sf_dir)


def _media_survivors_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.audio import fingerprint_media
    from tank_spark.llm.dedup import lsh_components
    from tank_spark.llm.media_inc import _media_hash_kernel
    from tank_spark.llm.video import signature_media
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    # ONE combined hash stage over the unioned corpus (r10: the former
    # three per-modality mapInPandas legs each launched their own
    # Python stage and re-derived their slice — stage orchestration,
    # not hashing, was the measured cost; media_inc._media_hash_kernel
    # batch-hashes every modality per Arrow batch, bit-exact by the
    # tests/test_media_np.py pins)
    corpus = (
        phash_media(spark, sf_dir).withColumn("modality", F.lit("image"))
        .unionByName(fingerprint_media(spark, sf_dir)
                     .withColumn("modality", F.lit("audio")))
        .unionByName(signature_media(spark, sf_dir)
                     .withColumn("modality", F.lit("video")))
    )
    hashed = (
        corpus.select("doc_id", "modality", "payload")
        .mapInPandas(_media_hash_kernel,
                     "doc_id long, modality string, phash long")
        # eager: the pair join AND the final keep-flag join both scan it;
        # a lazy cache would race and re-run the kernels (dedup.py:314).
        # localCheckpoint, not persist (ADVICE r7: leak across calls)
        .localCheckpoint(eager=True)
    )
    # ONE banded join over all three modalities: modality joins the
    # bucket key, so hash spaces never pair across and the three
    # families cost one shuffle instead of three
    pairs = phash_neardup_pairs(hashed, key_cols=("modality",))
    comp = lsh_components(pairs.select(
        F.col("doc_a").alias("cid_a"), F.col("doc_b").alias("cid_b")))
    return (
        hashed.select("doc_id", "modality")
        .join(comp, F.col("doc_id") == F.col("cid"), "left")
        .select(
            "doc_id", "modality",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
            F.coalesce(F.col("is_canonical"), F.lit(1)).cast("int").alias("keep"),
        )
    )


def _base_id():
    """Base doc_id of a (possibly variant) media row: the planted
    near-dup copies carry doc_id + VARIANT_OFFSET, so the high bit
    strips back to the document whose source/provenance they inherit.
    (A function, not a module constant: Column construction needs an
    active SparkContext.)"""
    return F.when(
        F.col("doc_id") >= VARIANT_OFFSET,
        F.col("doc_id") - VARIANT_OFFSET,
    ).otherwise(F.col("doc_id"))


@register(
    "media_dedup_apply",
    media_sql.MEDIA_DEDUP_APPLY_SQL,
    doc="The APPLY step of the cross-modality dedup arc (detect -> "
        "cluster -> apply, mirroring dedup_substring_spans -> _removal "
        "on the text side): the curated media corpus after dropping "
        "near-duplicate copies — every keep=1 row from "
        "media_dedup_survivors joined back to documents for provenance "
        "(doc_id, modality, source, cluster). Variant ids map to their "
        "base doc's source via the shared VARIANT_OFFSET high bit. "
        "Scale shape: survivors is the one-banded-join + one-CC plan; "
        "the provenance join is a plain equi-join on the base doc key "
        "(both sides hash-partition on it — no new skew surface), and "
        "the keep filter lands before the join so only survivors "
        "shuffle.",
)
def media_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    surv = _media_survivors_df(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "source")
    return (
        surv.filter(F.col("keep") == 1)
        .withColumn("base_id", _base_id())
        .join(docs, "base_id")
        .select("doc_id", "modality", "source", "cluster")
    )


@register(
    "media_dedup_report",
    media_sql.MEDIA_DEDUP_REPORT_SQL,
    doc="The curation REPORT over the cross-modality dedup pass: per "
        "(source, modality), how much of the media corpus survives — "
        "n_media, n_kept, n_dropped, n_clusters (distinct cluster "
        "labels incl. singletons), dup_rate. This is the number a "
        "pipeline owner reads before training to decide whether a "
        "source's duplication is pathological. Scale shape: one "
        "equi-join on the base doc key then one groupBy over "
        "(source, modality) — partial aggregation does almost all the "
        "work map-side because the group count is tiny; the exact "
        "count-distinct expands per group but is bounded by media rows "
        "per (source, modality).",
)
def media_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    surv = _media_survivors_df(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "source")
    g = (
        surv.withColumn("base_id", _base_id())
        .join(docs, "base_id")
        .groupBy("source", "modality")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.countDistinct("cluster").alias("n_clusters"),
        )
    )
    return g.select(
        "source", "modality", "n_media", "n_kept",
        (F.col("n_media") - F.col("n_kept")).alias("n_dropped"),
        "n_clusters",
        ((F.col("n_media") - F.col("n_kept")).cast("double")
         / F.col("n_media")).alias("dup_rate"),
    )


# ------------------------------------------------------- image resize

RESIZE_W, RESIZE_H = 16, 8  # target thumbnail dims (training-set norm)
RESIZE_SCHEMA = ("doc_id long, in_w int, in_h int, out_w int, out_h int, "
                 "resized binary, resize_error string")


def block_mean_resize(plane, out_h: int, out_w: int):
    """Deterministic block-mean downsample of a 2-D luma plane to
    (out_h, out_w) — the same truncated-linspace block boundaries as the
    dHash pooling grid, rounded back to uint8 bytes. Raises ValueError
    when the plane is smaller than the target grid (upsampling is a
    different operator)."""
    import numpy as np

    h, w = plane.shape
    if h < out_h or w < out_w:
        raise ValueError(f"plane {h}x{w} smaller than target {out_h}x{out_w}")
    rows = np.linspace(0, h, out_h + 1).astype(int)
    cols = np.linspace(0, w, out_w + 1).astype(int)
    g = np.add.reduceat(np.add.reduceat(plane, rows[:-1], axis=0), cols[:-1], axis=1)
    g = g / np.outer(np.diff(rows), np.diff(cols))
    return np.clip(np.rint(g), 0, 255).astype(np.uint8)


def _resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> resized thumbnail bytes
    (row-major uint8 luma), with errors in-band like media_extract
    (resize_error set, other fields null) so corrupt images surface as
    data, not task failures. Decode resolves per-executor
    (get_plane_decoder): real PIL where it imports, stub plane here."""
    decode = get_plane_decoder()
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            rec = {"doc_id": int(row.doc_id), "in_w": None, "in_h": None,
                   "out_w": None, "out_h": None, "resized": None,
                   "resize_error": None}
            try:
                plane = decode(bytes(row.payload))
                thumb = block_mean_resize(plane, RESIZE_H, RESIZE_W)
                rec.update({"in_w": int(plane.shape[1]),
                            "in_h": int(plane.shape[0]),
                            "out_w": RESIZE_W, "out_h": RESIZE_H,
                            "resized": thumb.tobytes()})
            except ValueError as e:
                rec["resize_error"] = str(e)
            out.append(rec)
        yield pd.DataFrame(out, columns=["doc_id", "in_w", "in_h", "out_w",
                                         "out_h", "resized", "resize_error"])


@register(
    "media_resize",
    media_sql.MEDIA_RESIZE_SQL,
    doc="Image resize via mapInPandas (the decode/feature/RESIZE/frame-"
        "sample quartet's third member): block-mean downsample of the "
        "decoded luma plane to a fixed thumbnail, resized bytes emitted "
        "as a binary column, errors in-band. Map-only over the image "
        "slice — the canonical thumbnail/normalization stage of an "
        "image-training pipeline; at 100 TB the same kernel swaps its "
        "inner two lines for a real codec + interpolating resampler. "
        "The registered parity query serializes the blob to lowercase "
        "hex (resized_hex): driver value-hashing compares Spark "
        "bytearray and DuckDB bytes by str(), which never match for "
        "binary — the kernel itself stays binary-columned.",
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    m = (
        media_df(spark, sf_dir)
        .filter(F.col("meta.media_type") == "image/png")
        .select("doc_id", "payload")
    )
    out = m.mapInPandas(_resize_kernel, RESIZE_SCHEMA)
    return out.select(
        "doc_id", "in_w", "in_h", "out_w", "out_h",
        F.lower(F.hex("resized")).alias("resized_hex"), "resize_error",
    )
