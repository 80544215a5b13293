"""Vectorized (numpy-batch) twins of the media perceptual-hash kernels
— the mvt_np.py treatment applied to the multimodal family.

The scalar kernels (multimodal.dhash64, audio.audio_fingerprint64,
video.video_signature64 over the stub decoders) hash one payload per
Python-loop iteration; at sf0.1 the three kernels dominate every media
dedup op (~6 s of media_dedup_incremental's 6.0 s). For the STUB decode
path the whole batch reduces to dense array ops, so these twins hash an
entire Arrow batch per numpy call.

Bit-exactness contract (pinned by tests/test_media_np.py A/B over the
full derived corpus, plus the standing DuckDB oracles):

* the SAME operation sequence as the scalar path — block-tile via
  ``repeat`` (values identical to ``np.kron``), pooled sums via the
  same ``np.add.reduceat`` bounds in the same axis order, the same
  divisions — so every float op is per-element identical, not
  algebraically rearranged;
* bit packing is MSB-first into a signed 64-bit int exactly as the
  scalar shift loop (``np.packbits`` + big-endian view + two's-
  complement reinterpret);
* the video strict-majority vote at 12 frames = 3 scenes x 4 identical
  frames collapses to the bitwise 2-of-3 majority
  ``(h0&h1)|(h0&h2)|(h1&h2)`` — the same identity the DuckDB oracle
  (media_sql) uses, provably equal to the scalar per-bit count.

Content dispatch is preserved: genuine PGM / RIFF / Y4M payloads route
through the REAL scalar parsers row-by-row (rare by magic-check
construction), an importable Pillow sends the whole image batch to the
scalar PIL path, and too-short payloads drop exactly as the scalar
kernels' ValueError path does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_BYTES = 32
FAKE_W, FAKE_H = 32, 24
FP_WINDOWS = 65
PCM_BLOCK_LEN = 128
N_SAMPLES = N_BYTES * PCM_BLOCK_LEN
N_SCENES = 3           # N_FRAMES_STUB // SCENE_LEN
SCENE_ROLL = 7


def _pack_bits64(bits: np.ndarray) -> np.ndarray:
    """(N, 64) bool -> (N,) int64, MSB-first — the vector twin of the
    scalar ``code = (code << 1) | bit`` loop + two's-complement fold."""
    packed = np.packbits(np.ascontiguousarray(bits), axis=1)  # (N, 8)
    return packed.view(">u8").ravel().astype(np.uint64).view(np.int64)


def dhash64_batch(g: np.ndarray) -> np.ndarray:
    """(N, 4, 8) uint8 payload grids -> (N,) int64 dHashes of the stub
    planes — multimodal.dhash64(multimodal._luma_plane_stub(p)) batched,
    op-for-op: block-tile to (24, 32), reduceat rows then cols on the
    same truncated-linspace bounds, divide by the same areas, compare
    left-to-right, pack MSB-first."""
    plane = np.repeat(np.repeat(g, FAKE_H // 4, axis=1),
                      FAKE_W // 8, axis=2).astype(np.float64)
    rows = np.linspace(0, FAKE_H, 9).astype(int)
    cols = np.linspace(0, FAKE_W, 10).astype(int)
    s = np.add.reduceat(
        np.add.reduceat(plane, rows[:-1], axis=1), cols[:-1], axis=2)
    gp = s / np.outer(np.diff(rows), np.diff(cols))
    bits = gp[:, :, 1:] > gp[:, :, :-1]
    return _pack_bits64(bits.reshape(len(g), 64))


def fingerprint64_batch(b: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 payload bytes -> (N,) int64 acoustic fingerprints —
    audio.audio_fingerprint64(audio._pcm_stub(p)) batched: levels held
    for 128 samples, x*x, reduceat on the same 65-window bounds, same
    mean division, same delta-sign packing."""
    levels = (b.astype(np.float64) - 128.0) / 128.0
    # broadcast-assign instead of np.repeat: identical (N, 4096) layout,
    # one vectorized copy (np.repeat cost ~2 s of the 3.6 s kernel — r13)
    x = np.empty((len(b), N_BYTES, PCM_BLOCK_LEN))
    x[...] = levels[:, :, None]
    x = x.reshape(len(b), N_SAMPLES)
    bounds = np.linspace(0, N_SAMPLES, FP_WINDOWS + 1).astype(int)
    e = np.add.reduceat(x * x, bounds[:-1], axis=1) / np.diff(bounds)
    return _pack_bits64(e[:, 1:] > e[:, :-1])


def signature64_batch(b: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 payload bytes -> (N,) int64 temporal signatures —
    video.video_signature64(frame dHashes of video._frames_stub(p))
    batched. Scene s hashes the payload rotated left by 7*s bytes; the
    strict-majority vote over 3 scenes x 4 identical frames is the
    bitwise 2-of-3 majority (cnt >= 8 <=> >= 2 scenes set the bit)."""
    hs = []
    for s in range(N_SCENES):
        k = (SCENE_ROLL * s) % N_BYTES
        idx = (np.arange(N_BYTES) + k) % N_BYTES
        hs.append(dhash64_batch(
            b[:, idx].reshape(-1, 4, 8)).view(np.uint64))
    h0, h1, h2 = hs
    return ((h0 & h1) | (h0 & h2) | (h1 & h2)).view(np.int64)


def hash_frame(pdf: pd.DataFrame, batch_fn, scalar_fn,
               is_real) -> pd.DataFrame:
    """One Arrow batch (doc_id, payload) -> (doc_id, phash): stub rows
    hashed in ONE numpy call, real-container rows (``is_real``) through
    the scalar parser per row, short rows dropped (the scalar kernels'
    ValueError-drop semantics). Output order (stub block first) differs
    from the scalar kernel; every consumer is a join/aggregate."""
    stub_ids: list[int] = []
    stub_payloads: list[bytes] = []
    rows = []
    for did, p in zip(pdf["doc_id"], pdf["payload"]):
        p = bytes(p)
        if is_real(p):
            try:
                rows.append({"doc_id": int(did), "phash": scalar_fn(p)})
            except ValueError:
                continue
        elif len(p) >= N_BYTES:
            stub_ids.append(int(did))
            stub_payloads.append(p[:N_BYTES])
        # else: too short for the stub decoder -> drop
    frames = []
    if stub_ids:
        b = np.frombuffer(b"".join(stub_payloads), dtype=np.uint8) \
            .reshape(-1, N_BYTES)
        frames.append(pd.DataFrame({
            "doc_id": np.asarray(stub_ids, dtype=np.int64),
            "phash": batch_fn(b)}))
    if rows:
        frames.append(pd.DataFrame(rows, columns=["doc_id", "phash"]))
    if not frames:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "phash": pd.Series(dtype="int64")})
    return pd.concat(frames, ignore_index=True)
