"""Numpy-vectorized MVT layer assembly — the scale path for big tiles.

The pure-Python encoder (geom/mvt.py) walks features one at a time; at
~600k features per overview tile that loop alone is tens of seconds of
single-task Python (measured: 20s of a 42s z7 encode at sf0.1). This
module assembles the SAME wire format (vector-tile-spec 2.1 protobuf) in
whole-array numpy passes: varint encoding, tag packing, and feature
framing are all vectorized; only the per-unique value table (a few
hundred entries) stays a Python loop.

Works on columnar inputs (ids, geometry-command bytes, prop columns) —
the distributed tile pipeline's geometry stage (operators/mvt_tiles.py)
produces exactly that shape. Decoded output is identical to
``mvt.encode`` on the same features (tests assert this); byte layout may
differ only in key/value table ordering, which the spec leaves to the
encoder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tank_spark.geom import mvt as mvtmod

_MAX_VARINT_BYTES = 10


def _varint_lengths(v: np.ndarray) -> np.ndarray:
    """Byte length of each uint64's varint encoding (1..10)."""
    lens = np.ones(len(v), dtype=np.int64)
    vmax = int(v.max()) if len(v) else 0
    for k in range(1, _MAX_VARINT_BYTES):
        t = 1 << (7 * k)
        if vmax < t:
            break  # no value needs more bytes — skip the remaining passes
        lens += v >= np.uint64(t)
    return lens


def varints_np(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encode: int array -> (flat uint8 buffer, per-value
    byte lengths). Negative ints must be zigzagged by the caller first.

    Fast paths for the 1- and 2-byte regimes (tag indices, lengths — the
    bulk of a big tile's varints) skip the per-byte mask loop: measured
    ~5x on the 4.8M-value tag stream of a 600k-feature overview tile."""
    v = vals.astype(np.uint64)
    n = len(v)
    vmax = int(v.max()) if n else 0
    if vmax < 1 << 7:
        return v.astype(np.uint8), np.ones(n, dtype=np.int64)
    if vmax < 1 << 14:
        two = v >= np.uint64(1 << 7)
        lens = np.ones(n, dtype=np.int64) + two
        buf = np.empty(int(lens.sum()), dtype=np.uint8)
        offs = np.cumsum(lens) - lens
        lo = (v & np.uint64(0x7F)).astype(np.uint8)
        buf[offs] = np.where(two, lo | 0x80, lo)
        buf[offs[two] + 1] = (v[two] >> np.uint64(7)).astype(np.uint8)
        return buf, lens
    lens = _varint_lengths(v)
    total = int(lens.sum())
    buf = np.empty(total, dtype=np.uint8)
    offs = np.cumsum(lens) - lens
    for b in range(int(lens.max()) if len(lens) else 0):
        m = lens > b
        byte = (v[m] >> np.uint64(7 * b)).astype(np.uint64) & np.uint64(0x7F)
        cont = (lens[m] - 1 > b).astype(np.uint8) << 7
        buf[offs[m] + b] = byte.astype(np.uint8) | cont
    return buf, lens


def _ranges(lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for variable-length scatter/gather."""
    c = np.cumsum(lens)
    return np.arange(int(c[-1]) if len(c) else 0, dtype=np.int64) - np.repeat(c - lens, lens)


def _scatter(buf: np.ndarray, starts: np.ndarray, flat: np.ndarray,
             lens: np.ndarray) -> None:
    idx = np.repeat(starts, lens) + _ranges(lens)
    buf[idx] = flat


def _zigzag_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def encode_point_geoms(ix: np.ndarray, iy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Command streams for single-point geometries, vectorized:
    [MoveTo(1), zz(x), zz(y)] per point -> (flat uint8, per-point lens)."""
    n = len(ix)
    zx, lx = varints_np(_zigzag_np(ix))
    zy, ly = varints_np(_zigzag_np(iy))
    lens = 1 + lx + ly
    buf = np.empty(int(lens.sum()), dtype=np.uint8)
    starts = np.cumsum(lens) - lens
    buf[starts] = (1 << 3) | 1  # MoveTo, count 1
    _scatter(buf, starts + 1, zx, lx)
    _scatter(buf, starts + 1 + lx, zy, ly)
    return buf, lens


def encode_line2_geoms(ix0: np.ndarray, iy0: np.ndarray,
                       ix1: np.ndarray, iy1: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Command streams for 2-point LineStrings, vectorized:
    [MoveTo(1), zz(x0), zz(y0), LineTo(1), zz(x1-x0), zz(y1-y0)] per row
    -> (flat uint8, per-row byte lens). Same layout mvt._encode_geometry
    emits for a 2-point LineString."""
    n = len(ix0)
    vals = np.empty((n, 6), dtype=np.uint64)
    vals[:, 0] = (1 << 3) | 1  # MoveTo, count 1
    vals[:, 1] = _zigzag_np(ix0)
    vals[:, 2] = _zigzag_np(iy0)
    vals[:, 3] = (1 << 3) | 2  # LineTo, count 1
    vals[:, 4] = _zigzag_np(ix1 - ix0)
    vals[:, 5] = _zigzag_np(iy1 - iy0)
    buf, vl = varints_np(vals.ravel())
    return buf, vl.reshape(n, 6).sum(axis=1)


def encode_ring_geoms(rings: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Command streams for single-ring polygons, vectorized over a
    (m, n+1, 2) int64 array of CLOSED rings (last vertex == first).

    Winding is normalized exactly like mvt._orient (exterior ring must
    have positive signed area in tile coords; reversed otherwise, ties
    at zero area untouched), and the stream layout matches
    mvt._encode_geometry's close=True move_line: [MoveTo(1), zz(p0),
    LineTo(n-1), zz(deltas of p1..p_{n-1}), ClosePath] -> (flat uint8,
    per-row byte lens)."""
    m, ncl, _ = rings.shape
    n = ncl - 1
    x, y = rings[:, :, 0], rings[:, :, 1]
    area2 = (x[:, :-1] * y[:, 1:] - x[:, 1:] * y[:, :-1]).sum(axis=1)
    oriented = np.where((area2 < 0)[:, None, None], rings[:, ::-1, :], rings)
    pts = oriented[:, :n, :]          # move_line never re-emits the closure
    d = pts.copy()
    d[:, 1:, :] -= pts[:, :-1, :]     # first point absolute (cursor at 0,0)
    k = 2 * n + 3
    vals = np.empty((m, k), dtype=np.uint64)
    vals[:, 0] = (1 << 3) | 1              # MoveTo, count 1
    vals[:, 1] = _zigzag_np(d[:, 0, 0])
    vals[:, 2] = _zigzag_np(d[:, 0, 1])
    vals[:, 3] = ((n - 1) << 3) | 2        # LineTo, count n-1
    vals[:, 4:k - 1:2] = _zigzag_np(d[:, 1:, 0])
    vals[:, 5:k - 1:2] = _zigzag_np(d[:, 1:, 1])
    vals[:, k - 1] = (1 << 3) | 7          # ClosePath
    buf, vl = varints_np(vals.ravel())
    return buf, vl.reshape(m, k).sum(axis=1)


def frame_values(uniques) -> bytes:
    """One column's unique values -> the concatenated, FRAMED
    ``Layer.values`` entries (``0x22 | varint(len) | Value-message``),
    vectorized by dtype.

    Numeric uniques never touch per-value Python: doubles are fixed
    11-byte records (frame + ``0x19`` double tag + 8 LE bytes), ints are
    zigzag varints through :func:`varints_np`, bools fixed 4-byte. Only
    string/object uniques fall back to the scalar encoder — after
    factorization those are few. This is what makes the single assembly
    task O(blob) with numpy constants: a 600k-unique double column used
    to cost 600k ``_encode_value`` calls plus 600k framing appends."""
    u = np.asarray(uniques) if not isinstance(uniques, np.ndarray) else uniques
    nv = len(u)
    if nv == 0:
        return b""
    kind = u.dtype.kind
    if kind == "f":
        rec = np.empty((nv, 11), dtype=np.uint8)
        rec[:, 0] = 0x22                      # Layer.values, len-delim
        rec[:, 1] = 9                         # Value payload length
        rec[:, 2] = 0x19                      # Value.double_value tag
        rec[:, 3:] = u.astype("<f8").view(np.uint8).reshape(nv, 8)
        return rec.tobytes()
    if kind in "iu":
        vbuf, vlens = varints_np(_zigzag_np(u.astype(np.int64)))
        frame_lens = 3 + vlens                # 0x22, plen (<=11, 1 byte),
        buf = np.empty(int(frame_lens.sum()), dtype=np.uint8)
        starts = np.cumsum(frame_lens) - frame_lens
        buf[starts] = 0x22
        buf[starts + 1] = (1 + vlens).astype(np.uint8)
        buf[starts + 2] = 0x30                # Value.sint_value tag
        _scatter(buf, starts + 3, vbuf, vlens)
        return buf.tobytes()
    if kind == "b":
        rec = np.empty((nv, 4), dtype=np.uint8)
        rec[:, 0] = 0x22
        rec[:, 1] = 2
        rec[:, 2] = 0x38                      # Value.bool_value tag
        rec[:, 3] = u.astype(np.uint8)
        return rec.tobytes()
    # strings / mixed objects / pre-encoded Value payload bytes
    parts = []
    for v in uniques:
        payload = v if isinstance(v, bytes) else mvtmod._encode_value(_pyval(v))
        parts.append(b"\x22" + mvtmod._varint(len(payload)) + payload)
    return b"".join(parts)


def _factorize_props(props, n: int) -> tuple[
        list[str], bytes, np.ndarray, np.ndarray]:
    """Build the layer key/value tables and per-feature packed tag arrays.

    ``props``: column name -> pandas Series, OR -> ``(codes, uniques)``
    already factorized (codes int array, -1 = null) — the pre-aggregated
    chunk path supplies the latter. ``n`` is the feature count.

    Returns (keys, values_framed, flat_tag_varint_values,
    tags_per_feature) where values_framed is the ready-to-append framed
    ``Layer.values`` byte run and flat_tag_varint_values is the raveled
    (key_ix, val_ix) stream with null-valued entries dropped per feature.
    """
    keys: list[str] = []
    framed: list[bytes] = []
    n_values = 0
    cols = []
    for name, series in props.items():
        key_ix = len(keys)
        keys.append(name)
        if isinstance(series, tuple):
            codes, uniques = series
            codes = np.asarray(codes)
            mask = codes >= 0
        else:
            mask = series.notna().to_numpy()
            codes, uniques = pd.factorize(series)
        if hasattr(uniques, "to_numpy"):      # pandas Index/ExtensionArray
            uniques = uniques.to_numpy()
        framed.append(frame_values(uniques))
        base = n_values
        n_values += len(uniques)
        cols.append((key_ix, base + codes, mask))
    flat, per_feat = _interleave_tags(cols, n)
    return keys, b"".join(framed), flat, per_feat


def _interleave_tags(cols, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Feature-major (key_ix, val_ix) tag stream from per-column
    ``(key_ix, value_codes, non-null mask)`` triples."""
    per_feat = np.zeros(n, dtype=np.int64)
    for _, _, mask in cols:
        per_feat += mask.astype(np.int64) * 2
    flat = np.empty(int(per_feat.sum()), dtype=np.int64)
    # feature-major layout: offsets per feature, then place each column's
    # pair at the running position within the feature
    feat_offs = np.cumsum(per_feat) - per_feat
    cursor = np.zeros(n, dtype=np.int64)
    for key_ix, val_codes, mask in cols:
        pos = feat_offs[mask] + cursor[mask]
        flat[pos] = key_ix
        flat[pos + 1] = val_codes[mask]
        cursor[mask] += 2
    return flat, per_feat


def _pyval(u):
    """numpy scalar -> plain python for value encoding (type tags)."""
    if isinstance(u, (np.integer,)):
        return int(u)
    if isinstance(u, (np.floating,)):
        return float(u)
    if isinstance(u, (np.bool_,)):
        return bool(u)
    return u


def assemble_layer(
    ids: np.ndarray,
    gtypes: np.ndarray,
    geom_flat: np.ndarray,
    geom_lens: np.ndarray,
    props: dict[str, pd.Series],
    layer_name: str = "io.marauder.tank",
    extent: int = 4096,
) -> bytes:
    """Columnar features -> one-layer MVT blob, fully vectorized.

    ``ids``: int64 (non-negative); ``gtypes``: MVT geom type 1..3;
    ``geom_flat``/``geom_lens``: concatenated command-stream bytes and
    per-feature lengths; ``props``: column name -> pandas Series (nulls
    skipped per feature, like the scalar encoder).
    """
    n = len(ids)
    keys, values_framed, tag_flat, tags_per_feat = _factorize_props(props, n)
    feats = frame_features(
        ids, gtypes, geom_flat, geom_lens, tag_flat, tags_per_feat)
    return layer_from_framed(
        [feats], keys, values_framed, layer_name=layer_name, extent=extent)


def frame_features(ids: np.ndarray, gtypes: np.ndarray,
                   geom_flat: np.ndarray, geom_lens: np.ndarray,
                   tag_flat: np.ndarray, tags_per_feat: np.ndarray) -> bytes:
    """Columnar features + tag stream -> the concatenated, FRAMED
    ``Layer.features`` records (``0x12 | varint(len) | Feature``), fully
    vectorized. The tag value indexes must already point into whatever
    value table the final layer will carry."""
    n = len(ids)
    id_buf, id_lens = varints_np(ids.astype(np.uint64))
    tag_buf, tag_lens_each = varints_np(tag_flat.astype(np.uint64))
    # per-feature packed-tags byte length = sum of its tag varint lengths
    tb_lens = np.zeros(n, dtype=np.int64)
    np.add.at(tb_lens, np.repeat(np.arange(n), tags_per_feat), tag_lens_each)
    tblen_buf, tblen_lens = varints_np(tb_lens.astype(np.uint64))
    glen_buf, glen_lens = varints_np(geom_lens.astype(np.uint64))

    # feature body: [08 id] [12 tl tags] [18 gt] [22 gl geom]
    body_lens = (
        (1 + id_lens)
        + (1 + tblen_lens + tb_lens)
        + 2
        + (1 + glen_lens + geom_lens)
    )
    blen_buf, blen_lens = varints_np(body_lens.astype(np.uint64))
    feat_lens = 1 + blen_lens + body_lens           # [12 bl body]
    total = int(feat_lens.sum())
    buf = np.empty(total, dtype=np.uint8)
    starts = np.cumsum(feat_lens) - feat_lens

    p = starts
    buf[p] = 0x12                                   # Layer.features tag
    _scatter(buf, p + 1, blen_buf, blen_lens)
    p = p + 1 + blen_lens
    buf[p] = 0x08                                   # Feature.id
    _scatter(buf, p + 1, id_buf, id_lens)
    p = p + 1 + id_lens
    buf[p] = 0x12                                   # Feature.tags (packed)
    _scatter(buf, p + 1, tblen_buf, tblen_lens)
    tag_starts = p + 1 + tblen_lens
    # scatter each feature's packed-tag bytes: position = feature tag start
    # repeated per byte + the byte's offset within the feature's tag block
    idx = np.repeat(tag_starts, tb_lens) + _ranges(tb_lens)
    buf[idx] = tag_buf
    p = tag_starts + tb_lens
    buf[p] = 0x18                                   # Feature.type
    buf[p + 1] = gtypes.astype(np.uint8)
    p = p + 2
    buf[p] = 0x22                                   # Feature.geometry
    _scatter(buf, p + 1, glen_buf, glen_lens)
    _scatter(buf, p + 1 + glen_lens, geom_flat, geom_lens)

    return buf.tobytes()


def layer_from_framed(feats_parts: list[bytes], keys: list[str],
                      values_framed: bytes,
                      layer_name: str = "io.marauder.tank",
                      extent: int = 4096) -> bytes:
    """Pre-framed feature byte runs + ready key/value tables -> the tile
    blob. Pure concatenation — the distributed encode's final stage."""
    layer = bytearray()
    layer += mvtmod._tag(15, 0) + mvtmod._varint(2)
    layer += mvtmod._len_delim(1, layer_name.encode("utf-8"))
    for part in feats_parts:
        layer += part
    for k in keys:
        layer += mvtmod._len_delim(3, k.encode("utf-8"))
    layer += values_framed
    layer += mvtmod._tag(5, 0) + mvtmod._varint(extent)
    return bytes(mvtmod._len_delim(3, bytes(layer)))


def split_bytes(flat: np.ndarray, lens: np.ndarray) -> list[bytes]:
    """Flat uint8 buffer + lengths -> list of bytes objects (for emitting
    a per-row binary column from a vectorized batch)."""
    mv = flat.tobytes()
    ends = np.cumsum(lens)
    starts = ends - lens
    return [mv[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


def reorder_var(flat: np.ndarray, lens: np.ndarray, order: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Reorder variable-length byte records in a flat buffer by ``order``."""
    starts = np.cumsum(lens) - lens
    new_lens = lens[order]
    idx = np.repeat(starts[order], new_lens) + _ranges(new_lens)
    return flat[idx], new_lens


# ------------------------------------------------- pre-aggregated chunks
#
# The distributed tile pipeline's scale problem: a full-fidelity overview
# tile funnels EVERY feature row through the per-tile assembly group — at
# 100x data that shuffle (and its Arrow per-row serialization) dominates.
# Chunk packing collapses it: each geometry-stage batch packs its features
# for a tile into ONE binary row of columnar numpy arrays (+ per-chunk
# value tables), so the assembly group receives #batches rows, not
# #features, and the final stage is pure numpy concatenation + remap.

def pack_chunk(keys: np.ndarray, gtypes: np.ndarray, geom_objs,
               props: dict[str, pd.Series]) -> bytes:
    """Columnar feature arrays -> one self-contained chunk blob."""
    import pickle

    n = len(keys)
    payload = {
        "n": n,
        "keys": keys.astype("<i8").tobytes(),
        "gtypes": np.asarray(gtypes).astype("<i1").tobytes(),
        "geom": b"".join(geom_objs),
        "geom_lens": np.fromiter(map(len, geom_objs), "<i4", count=n).tobytes(),
        "props": {},
    }
    for name, series in props.items():
        codes, uniques = pd.factorize(series)   # -1 = null
        payload["props"][name] = (codes.astype("<i4").tobytes(),
                                  [_pyval(u) for u in uniques])
    return pickle.dumps(payload, protocol=5)


def merge_chunks(blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray, dict]:
    """Chunk blobs -> (keys, gtypes, geom_flat, geom_lens, props) with
    per-chunk value codes remapped onto merged global value tables.
    ``props`` values are (codes, uniques) pairs ready for assemble_layer.
    """
    import pickle

    chunks = [pickle.loads(b) for b in blobs]
    keys = np.concatenate(
        [np.frombuffer(c["keys"], "<i8") for c in chunks])
    gtypes = np.concatenate(
        [np.frombuffer(c["gtypes"], "<i1") for c in chunks])
    geom_flat = np.frombuffer(b"".join(c["geom"] for c in chunks), np.uint8)
    geom_lens = np.concatenate(
        [np.frombuffer(c["geom_lens"], "<i4") for c in chunks]).astype(np.int64)

    props: dict[str, tuple[np.ndarray, list]] = {}
    names = list(chunks[0]["props"]) if chunks else []
    for name in names:
        uniq_lists = [c["props"][name][1] for c in chunks]
        # the global value table is built SORTED so the blob does not
        # depend on shuffle arrival order of the chunks (determinism)
        global_uniques = sorted({u for lst in uniq_lists for u in lst})
        ix = {u: i for i, u in enumerate(global_uniques)}
        remapped = []
        for c, lst in zip(chunks, uniq_lists):
            codes = np.frombuffer(c["props"][name][0], "<i4").astype(np.int64)
            m = codes >= 0
            out = np.full(len(codes), -1, dtype=np.int64)
            if m.any():
                local_to_global = np.fromiter(
                    (ix[u] for u in lst), dtype=np.int64, count=len(lst))
                out[m] = local_to_global[codes[m]]
            remapped.append(out)
        props[name] = (np.concatenate(remapped), global_uniques)
    return keys, gtypes, geom_flat, geom_lens, props


# ----------------------------------------------------- sub-tile merge tree
#
# A full-fidelity OVERVIEW tile (z < 9, unsampled) funnels every feature
# into one assembly task. The O(features) numpy passes there are cheap;
# what is NOT cheap is the per-unique Python value encoding (one
# _encode_value call per distinct property value — ~600k for a double
# column at sf0.1). The merge tree moves exactly that work into parallel
# sub-merge tasks (chunks salted by key % NSUB), which emit payloads whose
# value tables are already protobuf-encoded BYTES; the final task then
# only concatenates arrays, dedups ready bytes, remaps indices
# (vectorized), and varint-packs — O(blob) with numpy constants.

def merge_chunks_sorted_encoded(blobs) -> bytes:
    """Sub-merge task: stage-1 chunk blobs -> ONE merged payload, features
    sorted by key, value tables deduped/sorted and pre-encoded to protobuf
    Value bytes. Deterministic regardless of chunk arrival order."""
    import pickle

    keys, gtypes, geom_flat, geom_lens, props = merge_chunks(blobs)
    order = np.argsort(keys, kind="stable")
    geom_flat, geom_lens = reorder_var(geom_flat, geom_lens, order)
    enc_props = {}
    for name, (codes, uniques) in props.items():
        enc_props[name] = (
            codes[order].astype("<i4").tobytes(),
            [mvtmod._encode_value(_pyval(u)) for u in uniques],
        )
    payload = {
        "n": int(len(keys)),
        "keys": keys[order].astype("<i8").tobytes(),
        "gtypes": gtypes[order].astype("<i1").tobytes(),
        "geom": geom_flat.tobytes(),
        "geom_lens": geom_lens.astype("<i4").tobytes(),
        "props": enc_props,
    }
    return pickle.dumps(payload, protocol=5)


def merge_encoded(blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray, dict]:
    """Final task: merged payloads -> columnar arrays where each props
    value is (codes, value_bytes) over a DEDUPED concatenation of the
    payloads' pre-encoded value tables. Callers must pass ``blobs`` in a
    deterministic order (the first-seen dedup order follows it)."""
    import pickle

    chunks = [pickle.loads(b) for b in blobs]
    keys = np.concatenate([np.frombuffer(c["keys"], "<i8") for c in chunks])
    gtypes = np.concatenate(
        [np.frombuffer(c["gtypes"], "<i1") for c in chunks])
    geom_flat = np.frombuffer(b"".join(c["geom"] for c in chunks), np.uint8)
    geom_lens = np.concatenate(
        [np.frombuffer(c["geom_lens"], "<i4") for c in chunks]).astype(np.int64)

    props: dict[str, tuple[np.ndarray, list[bytes]]] = {}
    names = list(chunks[0]["props"]) if chunks else []
    for name in names:
        table: dict[bytes, int] = {}
        remapped = []
        for c in chunks:
            codes_b, vbytes = c["props"][name]
            codes = np.frombuffer(codes_b, "<i4").astype(np.int64)
            l2g = np.empty(len(vbytes), dtype=np.int64)
            for i, vb in enumerate(vbytes):
                g = table.get(vb)
                if g is None:
                    g = len(table)
                    table[vb] = g
                l2g[i] = g
            out = np.full(len(codes), -1, dtype=np.int64)
            m = codes >= 0
            if m.any():
                out[m] = l2g[codes[m]]
            remapped.append(out)
        props[name] = (np.concatenate(remapped), list(table))
    return keys, gtypes, geom_flat, geom_lens, props


# --------------------------------------------- global-dictionary tree path
#
# The merge-tree above still leaves O(features) framing work (varints,
# tag packing) in the ONE final task. When the layer's property columns
# have a bounded number of distinct values (checked before running — the
# usual case: enum-ish kinds/tags, bucketed scores), the pipeline can
# instead broadcast a GLOBAL value dictionary, frame every feature
# completely in the parallel sub-merge stage, and reduce the final task
# to a byte concatenation: header + framed-features runs + key/value
# tables. That is O(blob) memcpy — the design that survives an unsampled
# overview tile at 100 TB.

def pack_chunk_codes(keys: np.ndarray, gtypes: np.ndarray, geom_objs,
                     codes: dict[str, np.ndarray]) -> bytes:
    """Chunk blob for the global-dictionary path: per-prop GLOBAL value
    codes (int32, -1 = null) instead of per-chunk local value tables."""
    import pickle

    n = len(keys)
    payload = {
        "n": n,
        "keys": keys.astype("<i8").tobytes(),
        "gtypes": np.asarray(gtypes).astype("<i1").tobytes(),
        "geom": b"".join(geom_objs),
        "geom_lens": np.fromiter(map(len, geom_objs), "<i4", count=n).tobytes(),
        "codes": {name: np.asarray(c).astype("<i4").tobytes()
                  for name, c in codes.items()},
    }
    return pickle.dumps(payload, protocol=5)


def submerge_frame(blobs, dict_sizes: dict[str, int]) -> tuple[int, bytes]:
    """Sub-merge task, global-dictionary path: code-chunk blobs -> (number
    of features, fully-framed ``Layer.features`` bytes), features sorted
    by key. Tag value indexes = global code + the column's base offset in
    the concatenated global value table (``dict_sizes`` iteration order
    defines both key_ix and base)."""
    import pickle

    chunks = [pickle.loads(b) for b in blobs]
    keys = np.concatenate([np.frombuffer(c["keys"], "<i8") for c in chunks])
    gtypes = np.concatenate(
        [np.frombuffer(c["gtypes"], "<i1") for c in chunks])
    geom_flat = np.frombuffer(b"".join(c["geom"] for c in chunks), np.uint8)
    geom_lens = np.concatenate(
        [np.frombuffer(c["geom_lens"], "<i4") for c in chunks]).astype(np.int64)

    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    gtypes = gtypes[order]
    geom_flat, geom_lens = reorder_var(geom_flat, geom_lens, order)

    cols = []
    base = 0
    for key_ix, (name, size) in enumerate(dict_sizes.items()):
        codes = np.concatenate(
            [np.frombuffer(c["codes"][name], "<i4") for c in chunks]
        ).astype(np.int64)[order]
        mask = codes >= 0
        cols.append((key_ix, base + codes, mask))
        base += size
    tag_flat, per_feat = _interleave_tags(cols, len(keys))
    feats = frame_features(
        keys, gtypes, geom_flat, geom_lens, tag_flat, per_feat)
    return len(keys), feats
