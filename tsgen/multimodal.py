"""Multimodal-column plumbing (north-star extension).

Images/audio/video are opaque BINARY columns with typed metadata; decode /
feature-extraction runs as Arrow-batched mapInPandas over binary batches.
Uncompressed netpbm (P6 PPM) is decoded for REAL by decode_ppm — a
pure-numpy parser of the public spec, no image lib needed — and the
multimodal_decode query value-checks that path end-to-end. PNG (8-bit RGB,
non-interlaced) is ALSO decoded for real by decode_png: zlib is stdlib, so
chunk walk + CRC verify + IDAT inflate + scanline defiltering (all five
filter types 0–4) need no image library; multimodal_decode_png
value-checks it end-to-end against the same closed-form oracle. Audio is
decoded for REAL by decode_wav (RIFF/WAVE 16-bit PCM chunk walk — struct
only) and video by decode_y4m (YUV4MPEG2 plain-text header + raw frame
planes — the real 1→N frame explosion), each with its own end-to-end
oracle query. Baseline JPEG is ALSO decoded for real by decode_jpeg —
entropy coding is canonical Huffman and the transform one numpy matrix
product, so no codec library is needed (see the JPEG section below).
Only formats whose codecs are genuinely absent from this container
(MP3/AAC, H.264) remain behind decode_stub: their Spark-side plumbing
(schema, batching, partitioning, UDF signature) is real and tested;
swapping decode_stub for an ffmpeg call is a one-function change.

Scale notes:
- binary payloads stay opaque to the shuffle (never grouped on); feature
  extraction is a narrow mapInPandas — zero shuffles.
- maxRecordsPerBatch bounds Arrow batch memory when payloads are large
  (set spark.sql.execution.arrow.maxRecordsPerBatch for real media).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, payload binary, n_bytes int, declared_lang string"
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").cast("int").alias("n_bytes"),
        F.col("lang").alias("declared_lang"),
    )


_CKSUM_P = 1_000_003
_CKSUM_CHUNK = 1024
# _CKSUM_POWS[i] = 31^(_CKSUM_CHUNK-1-i) mod P, so a length-k chunk dots with
# the LAST k entries (powers 31^(k-1)..31^0). Entries < P (~1e6), bytes <=
# 255, so a chunk dot <= 255 * 1e6 * 1024 ~ 2.6e11 — exact in int64.
_CKSUM_POWS = None


def decode_stub(payload: bytes) -> dict:
    """STUB for the real media decoder (PIL.Image.open / soundfile / ffmpeg).

    Deterministic fake: derives features from raw bytes so the distributed
    plumbing is fully exercised and value-checkable. A real deployment
    replaces only this function.

    The checksum is the polynomial hash fold checksum_i = (checksum_{i-1}
    * 31 + byte_i) mod 1_000_003, evaluated vectorized: np.frombuffer +
    per-chunk Horner (dot with precomputed power-of-31 residues), which is
    bit-identical to the per-byte loop because each chunk's int64
    arithmetic is exact before the mod.
    """
    import numpy as np

    global _CKSUM_POWS
    if _CKSUM_POWS is None:
        _CKSUM_POWS = np.array(
            [pow(31, _CKSUM_CHUNK - 1 - i, _CKSUM_P) for i in range(_CKSUM_CHUNK)],
            dtype=np.int64,
        )
    a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
    checksum = 0
    for off in range(0, len(a), _CKSUM_CHUNK):
        chunk = a[off : off + _CKSUM_CHUNK]
        k = len(chunk)
        checksum = (
            checksum * pow(31, k, _CKSUM_P)
            + int(chunk @ _CKSUM_POWS[_CKSUM_CHUNK - k :])
        ) % _CKSUM_P
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": checksum,
    }


FEATURES_SCHEMA = "doc_id bigint, kind string, byte_len int, first_byte int, checksum bigint"


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas —
    narrow, no shuffle; batch shape (n_rows, payload bytes))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "byte_len": [f["byte_len"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


FRAME_SIZE, FRAME_STRIDE = 32, 64


def frame_sample(
    media: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Video-style frame sampling plumbing: slice each binary payload into
    fixed-size frames at a stride, one OUTPUT ROW per sampled frame — the
    1→N row-explosion shape real frame extraction has. Emits md5 + length
    per frame (stand-ins for the decoded frame tensor) so results are
    value-checkable; a real deployment decodes frame bytes instead.
    Narrow mapInPandas: no shuffle, batch memory bounded by Arrow batching.
    """
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                j = 0
                while j * stride < n:
                    chunk = payload[j * stride : j * stride + frame_size]
                    ids.append(doc_id)
                    idxs.append(j)
                    hashes.append(hashlib.md5(chunk).hexdigest())
                    lens.append(len(chunk))
                    j += 1
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes, "frame_len": lens}
            ).astype({"doc_id": "int64", "frame_idx": "int32", "frame_len": "int32"})

    return media.mapInPandas(
        fn, "doc_id bigint, frame_idx int, frame_md5 string, frame_len int"
    )


def resize_pool(media: DataFrame, out_len: int = 16) -> DataFrame:
    """Image-resize plumbing: average-pool each payload's bytes down to
    out_len buckets (the stand-in for bilinear resize; a real deployment
    decodes + PIL-resizes instead). Output is a fixed-length tiny binary —
    the schema/batch shape of a thumbnail column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"\x00" * out_len)
                    continue
                splits = np.array_split(arr, out_len)
                out.append(bytes(int(s.mean()) if len(s) else 0 for s in splits))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "thumb": out}
            )

    return media.mapInPandas(fn, "doc_id bigint, thumb binary")


AHASH_BITS, AHASH_BANDS = 64, 4


def _ahash_sig(raw, out_len: int = AHASH_BITS) -> int:
    """EXACT integer aHash of a nonneg-int array (bit i = bucket i's mean >
    mean of bucket means): array_split gives `rem` buckets of size l+1 then
    size l, so mean-of-means = (l*A + (l+1)*B) / (out_len*l*(l+1)) with
    A = sum over big buckets, B = over small — the comparison clears
    denominators and stays in int64, making the hash bit-identical in any
    engine (the float version could flip razor-tie bits under a different
    summation order). Returns a SIGNED int64 (bit 63 set -> negative)."""
    import numpy as np

    n = len(raw)
    if n == 0:
        return 0
    l, rem = divmod(n, out_len)
    sums = [int(s.sum()) for s in np.array_split(raw, out_len)]
    sizes = [len(s) for s in np.array_split(raw, out_len)]
    if l == 0:
        total = int(raw.sum())
        bits = [(sz > 0) and (sm * out_len > total) for sm, sz in zip(sums, sizes)]
    else:
        a_big = sum(sums[:rem]) if rem else 0
        b_small = sum(sums[rem:])
        m = l * a_big + (l + 1) * b_small
        scale = out_len * l * (l + 1)
        bits = [sm * scale > m * sz for sm, sz in zip(sums, sizes)]
    sig = 0
    for b in bits:
        sig = (sig << 1) | int(b)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def ahash(media: DataFrame, out_len: int = AHASH_BITS) -> DataFrame:
    """Perceptual average-hash (aHash) over the pooled thumbnail: bit i = 1
    iff bucket i's intensity is above the thumbnail mean. On real images
    (swap decode_stub for PIL) this is the classic 64-bit near-duplicate
    image fingerprint; tiny edits flip few bits, so near-dups sit at small
    Hamming distance. Narrow mapInPandas — zero shuffles to fingerprint."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                ids.append(doc_id)
                sigs.append(_ahash_sig(raw, out_len))
            yield pd.DataFrame({"doc_id": ids, "sig": sigs}).astype(
                {"doc_id": "int64", "sig": "int64"}
            )

    return media.mapInPandas(fn, "doc_id bigint, sig bigint")


def phash_pairs(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate media pairs by perceptual hash: band the 64-bit aHash
    into 4×16-bit bands and equi-join on (band, band-key). Pigeonhole: a
    pair at Hamming distance d ≤ 3 MUST share an untouched band (4 bands,
    ≤ 3 flipped bits); for 3 < d ≤ max_hamming the band join is a
    high-recall heuristic and the popcount verify is exact either way, so
    missed candidates are the only loss and false ones cost one check.
    Candidates come from a uniform-key equi-join — no all-pairs. Same shape
    as the SimHash text path (dedup.py); this is its media-column twin over
    stub-decoded thumbnails (swap decode for PIL on a real deployment)."""
    sig = ahash(media).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sig", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
                    )
                    for i in range(AHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sig", "b.band", "b.bkey")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bkey"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- real uncompressed-image decode (netpbm P6 PPM) -----------------------
#
# PIL/ffmpeg stay absent in this container, but uncompressed netpbm needs no
# library: the P6 spec (ASCII header: magic, width, height, maxval, optional
# '#' comments; then raw big-endian RGB triples) is decodable with a ~20-line
# parser + np.frombuffer. decode_ppm below is a REAL decoder — it parses the
# header from the bytes and fails loudly on malformed input — so the decode
# step of the multimodal pipeline is no longer a stub for this format.
# Compressed formats (JPEG/PNG/audio/video) remain behind decode_stub until
# the sandbox grows the libs; re-check each round.

PPM_MAXVAL = 255


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image dims (8..16 x 8..14) — the synthetic
    corpus spec shared with the DuckDB oracle."""
    return 8 + doc_id % 9, 8 + (doc_id * 3) % 7


def render_ppm(doc_id: int) -> bytes:
    """Render the deterministic test image for doc_id as REAL P6 PPM bytes.
    Channel ramps (all mod 256): r = 7x+13y+d, g = 5x+11y+2d, b = 3x+17y+5d
    — the closed-form spec the oracle integrates directly, so a decoder bug
    anywhere (header parse, offset, reshape, channel order) breaks the
    value match."""
    import numpy as np

    w, h = _ppm_dims(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    r = (7 * x + 13 * y + doc_id) % 256
    g = (5 * x + 11 * y + 2 * doc_id) % 256
    b = (3 * x + 17 * y + 5 * doc_id) % 256
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return b"P6\n%d %d\n%d\n" % (w, h, PPM_MAXVAL) + rgb.tobytes()


def synth_ppm_media(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are real P6 PPM images (one per doc_id),
    rendered in a narrow mapInPandas — the image-corpus analog of
    as_media_table's text payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_ppm(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "image/x-portable-pixmap",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


def decode_ppm(payload: bytes):
    """REAL netpbm P6 decoder (public spec, no external libs): parses the
    ASCII header — magic 'P6', whitespace-separated width/height/maxval
    with '#'-comment support — then reinterprets the raw section as an
    (h, w, 3) uint8 array. Raises on malformed input; only maxval=255
    (the 1-byte-per-sample variant) is supported."""
    import numpy as np

    if bytes(payload[:2]) != b"P6":
        raise ValueError("not a P6 PPM payload")
    i, vals = 2, []
    n = len(payload)
    while len(vals) < 3:
        while i < n and bytes(payload[i : i + 1]).isspace():
            i += 1
        if bytes(payload[i : i + 1]) == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not bytes(payload[j : j + 1]).isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        # Without this, numpy would silently accept negative values
        # (frombuffer count<0 reads the whole buffer; reshape infers a
        # negative dim) and zero dims would divide-by-zero downstream.
        raise ValueError(f"invalid dimensions {w}x{h}")
    if maxval != PPM_MAXVAL:
        raise ValueError(f"unsupported maxval {maxval} (only 255)")
    i += 1  # exactly one whitespace byte separates maxval from raster data
    if n - i < w * h * 3:
        raise ValueError("truncated raster section")
    px = np.frombuffer(bytes(payload), dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, px.reshape(h, w, 3)


IMAGE_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint,"
    " mean_r double, mean_g double, mean_b double, mean_luma double"
)


def image_stats(media: DataFrame, decoder=None) -> DataFrame:
    """Decode every payload with a REAL parser (default: the P6 decoder;
    pass decode_png for PNG payloads) and emit per-image channel statistics
    (mean R/G/B + ITU-R 601 integer-weight luma). All
    sums are exact integers, so the single mean division is deterministic
    IEEE in any engine; means are rounded half-up at 4dp (floor(x*1e4+0.5)
    — channels are nonnegative), matching the oracle's round(x+1e-9, 4).
    Narrow mapInPandas — zero shuffles."""
    decode = decoder or decode_ppm

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def r4(x: float) -> float:
            return float(np.floor((x + 1e-9) * 1e4 + 0.5) / 1e4)

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "mean_luma",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode(payload)
                npx = w * h
                s = px.astype(np.int64).sum(axis=(0, 1))
                sr, sg, sb = int(s[0]), int(s[1]), int(s[2])
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(npx)
                rows["mean_r"].append(r4(sr / npx))
                rows["mean_g"].append(r4(sg / npx))
                rows["mean_b"].append(r4(sb / npx))
                rows["mean_luma"].append(r4((299 * sr + 587 * sg + 114 * sb) / (1000 * npx)))
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "width": "int32", "height": "int32",
                 "n_pixels": "int64"}
            )

    return media.mapInPandas(fn, IMAGE_STATS_SCHEMA)


def image_stats_sql() -> str:
    """DuckDB oracle twin of synth_ppm_media → image_stats: integrates the
    closed-form channel ramps directly from the corpus spec (never touching
    bytes), so the Spark side's render → REAL header parse → frombuffer →
    reshape → sum pipeline is value-checked end-to-end — any offset/order/
    dimension bug in the decoder breaks the hash."""
    return """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 7 AS h
  FROM documents),
s AS (
  SELECT doc_id, w, h, w * h AS npx,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> (7 * x + 13 * y + doc_id) % 256)))) AS sr,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> (5 * x + 11 * y + 2 * doc_id) % 256)))) AS sg,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> (3 * x + 17 * y + 5 * doc_id) % 256)))) AS sb
  FROM d)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(npx AS BIGINT) AS n_pixels,
       round(sr / CAST(npx AS DOUBLE) + 1.0e-9, 4) + 0.0e0 AS mean_r,
       round(sg / CAST(npx AS DOUBLE) + 1.0e-9, 4) + 0.0e0 AS mean_g,
       round(sb / CAST(npx AS DOUBLE) + 1.0e-9, 4) + 0.0e0 AS mean_b,
       round((299 * sr + 587 * sg + 114 * sb) / (1000.0e0 * npx) + 1.0e-9, 4) + 0.0e0 AS mean_luma
FROM s
"""


# --- real compressed-image decode (PNG, 8-bit RGB) ------------------------
#
# PIL stays absent in this container, but PNG's compression layer is zlib —
# Python stdlib — so a real decoder for the most common web-image format
# needs only the public spec (RFC 2083 / W3C PNG): 8-byte signature, length/
# type/data/CRC chunk walk (CRC-32 verified via zlib.crc32), IHDR geometry,
# concatenated-IDAT inflate, then per-scanline defiltering of the five
# standard filter types (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth). Scope is
# bit depth 8 / color type 2 (truecolor RGB) / non-interlaced — the common
# case; anything else raises loudly. The synthetic encoder below cycles the
# filter type per scanline so EVERY defilter branch is exercised and
# value-checked by the multimodal_decode_png oracle.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter 4): nearest of left/up/up-left to the
    linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def render_png(doc_id: int) -> bytes:
    """Render the deterministic test image for doc_id (the SAME closed-form
    channel ramps render_ppm uses, so the oracle is shared) as REAL PNG
    bytes: filtered scanlines, zlib-compressed IDAT, CRC'd chunks. The
    scanline filter type cycles (y + doc_id) % 5, so across the corpus every
    filter (None/Sub/Up/Average/Paeth) is applied many times — a defilter
    bug in any branch of decode_png breaks the value match."""
    import numpy as np
    import struct
    import zlib

    w, h = _ppm_dims(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    r = (7 * x + 13 * y + doc_id) % 256
    g = (5 * x + 11 * y + 2 * doc_id) % 256
    b = (3 * x + 17 * y + 5 * doc_id) % 256
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)

    bpp, stride = 3, w * 3
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for row in range(h):
        line = rgb[row].reshape(-1).astype(np.int64)
        ft = (row + doc_id) % 5
        if ft == 0:
            enc = line.copy()
        elif ft == 2:
            enc = (line - prior) % 256
        else:
            # Sub/Average/Paeth predict from the UNFILTERED current and
            # prior scanlines (the spec's recon bytes, which the encoder
            # has as the original pixels) — serial in x only through the
            # a/c taps, and images here are tiny.
            enc = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                up = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + up) // 2
                else:
                    pred = _paeth(a, up, c)
                enc[i] = (int(line[i]) - pred) % 256
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prior = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL PNG decoder (public spec, stdlib zlib only): verifies the
    signature and every chunk CRC, walks chunks to IHDR/IDAT/IEND, inflates
    the concatenated IDAT stream, and reverses the per-scanline filter
    (types 0–4, including the Paeth predictor, with the correct per-format
    bpp for the a/c taps). Supports the 8-bit non-interlaced non-palette
    family — grayscale (color 0), RGB (2), RGBA (6) — and raises loudly on
    anything else. Returns (w, h, uint8 array (h, w, channels)); the RGB
    case matches decode_ppm's shape. A real deployment may still swap this
    for PIL; the point is the decode step is no longer a stub for PNG."""
    import numpy as np
    import struct
    import zlib

    buf = bytes(payload)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(buf)
    ihdr = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        if pos + 12 + length > n:
            raise ValueError(f"truncated {typ!r} chunk")
        data = buf[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            saw_iend = True
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    if not saw_iend:
        # a stream that just stops (e.g. a truncated trailing chunk fell
        # under the 8-byte header minimum) must not decode silently
        raise ValueError("missing IEND chunk")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    # 8-bit non-interlaced grayscale (0), RGB (2), or RGBA (6) — the
    # non-palette truecolor family; palette (3), 16-bit, and Adam7 raise.
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if depth != 8 or channels is None or (comp, filt, interlace) != (0, 0, 0):
        raise ValueError(
            f"unsupported PNG variant depth={depth} color={ctype} "
            f"interlace={interlace} (only 8-bit gray/RGB/RGBA non-interlaced)"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid dimensions {w}x{h}")

    raw = zlib.decompress(bytes(idat))
    bpp, stride = channels, w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("inflated raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for row in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int64
        )
        pos += stride
        prior = out[row - 1].astype(np.int64) if row else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prior) % 256
        elif ft in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + up) // 2
                else:
                    pred = _paeth(a, up, c)
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"unknown filter type {ft} on scanline {row}")
        out[row] = rec.astype(np.uint8)
    return w, h, out.reshape(h, w, channels)


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are real PNG images (one per doc_id),
    rendered in a narrow mapInPandas — the compressed-image twin of
    synth_ppm_media."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_png(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "image/png",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


# --- real audio decode (RIFF/WAVE 16-bit PCM) ------------------------------
#
# WAV needs no codec library either: the RIFF container (public spec) is a
# chunk walk — 'RIFF' size 'WAVE', then (id, LE size, data, odd-size pad)
# chunks of which 'fmt ' declares the sample format and 'data' holds raw
# LE int16 PCM. decode_wav parses it with struct + np.frombuffer and raises
# loudly on anything but 16-bit mono PCM; the synthetic encoder inserts a
# junk LIST chunk so the unknown-chunk skip path is always exercised. All
# audio_stats outputs are exact integers (sums, peak, zero crossings) —
# bit-identical in any engine, no float rounding to negotiate.

_WAV_SAMPLE_MOD = 4096


def _wav_params(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc (n_samples, sample_rate) — the synthetic
    corpus spec shared with the DuckDB oracle."""
    return 600 + (doc_id % 17) * 50, 8000 * (1 + doc_id % 3)


def _wav_samples(doc_id: int):
    """Closed-form int16 sawtooth: s_i = ((7 + d%13)*i + 11*d) % 4096 - 2048
    — integer-exact, sign-alternating (real zero-crossing structure), and
    directly integrable by the oracle."""
    import numpy as np

    n, _ = _wav_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    return (((7 + doc_id % 13) * i + 11 * doc_id) % _WAV_SAMPLE_MOD - 2048).astype(
        np.int16
    )


def render_wav(doc_id: int) -> bytes:
    """Render the deterministic test waveform as a REAL RIFF/WAVE file:
    fmt chunk (PCM, mono, 16-bit), a junk LIST chunk (so decoders must
    skip unknown chunks, per spec), then the data chunk."""
    import struct

    n, rate = _wav_params(doc_id)
    pcm = _wav_samples(doc_id).tobytes()  # little-endian int16
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    junk = b"INFOtsgen"  # odd length: exercises the pad-byte rule
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes):
    """REAL RIFF/WAVE decoder (public spec, struct only): verifies the
    RIFF/WAVE container, walks chunks honoring the odd-size pad byte,
    requires a PCM mono 16-bit 'fmt ' chunk, and reinterprets 'data' as
    LE int16 samples. Returns (sample_rate, np.int16 array)."""
    import numpy as np
    import struct

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(buf)
    rate = None
    data = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + size > n:
            raise ValueError(f"truncated {cid!r} chunk")
        body = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            afmt, nch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (afmt, nch, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV variant fmt={afmt} ch={nch} bits={bits}"
                    " (only 16-bit mono PCM)"
                )
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM byte length")
    return rate, np.frombuffer(data, dtype="<i2")


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are real WAV files (one per doc_id),
    rendered in a narrow mapInPandas — the audio twin of synth_ppm_media."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_wav(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "audio/wav",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


AUDIO_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate bigint, peak bigint,"
    " zero_cross bigint, sum_amp bigint, sum_sq bigint"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode every payload with the REAL WAV parser and emit per-clip
    statistics — ALL exact integers (peak |s|, sign-change count, Σs, Σs²),
    so the cross-engine match is bit-for-bit with no rounding protocol.
    Narrow mapInPandas — zero shuffles."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_samples", "sample_rate", "peak",
                "zero_cross", "sum_amp", "sum_sq",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav(payload)
                a = s.astype(np.int64)
                nonneg = a >= 0
                rows["doc_id"].append(int(doc_id))
                rows["n_samples"].append(len(a))
                rows["sample_rate"].append(int(rate))
                rows["peak"].append(int(np.abs(a).max()) if len(a) else 0)
                rows["zero_cross"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
                rows["sum_amp"].append(int(a.sum()))
                rows["sum_sq"].append(int((a * a).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(fn, AUDIO_STATS_SCHEMA)


def audio_stats_sql() -> str:
    """DuckDB oracle twin of synth_wav_media → audio_stats: integrates the
    closed-form sample spec directly (never touching bytes), so the Spark
    side's render → RIFF chunk walk → frombuffer → integer-stats pipeline
    is value-checked end-to-end — any offset/endianness/pad-byte bug in
    the decoder breaks the match."""
    return f"""
WITH d AS (
  SELECT doc_id, 600 + (doc_id % 17) * 50 AS n,
         8000 * (1 + doc_id % 3) AS rate
  FROM documents),
s AS (
  SELECT doc_id, n, rate,
         list_transform(range(0, n),
           i -> ((7 + doc_id % 13) * i + 11 * doc_id) % {_WAV_SAMPLE_MOD} - 2048) AS smp
  FROM d)
SELECT doc_id, CAST(n AS BIGINT) AS n_samples, CAST(rate AS BIGINT) AS sample_rate,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS BIGINT) AS peak,
       CAST(coalesce(list_sum(list_transform(range(1, n),
         i -> CASE WHEN (smp[i + 1] >= 0) <> (smp[i] >= 0) THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_cross,
       CAST(list_sum(smp) AS BIGINT) AS sum_amp,
       CAST(list_sum(list_transform(smp, v -> v * v)) AS BIGINT) AS sum_sq
FROM s
"""


# --- real video decode (YUV4MPEG2 / .y4m) ----------------------------------
#
# Y4M is ffmpeg's uncompressed interchange format: a plain-text header
# ("YUV4MPEG2 W.. H.. F.. C444\n"), then per frame a "FRAME...\n" marker
# followed by raw Y, U, V planes. No codec — a real parser is a header
# tokenizer plus plane-sized frombuffer slices, and frame extraction is the
# REAL 1→N row explosion frame_sample stubs for compressed video. Only C444
# (full-resolution chroma) is supported; anything else raises.


def _y4m_params(doc_id: int) -> tuple[int, int, int]:
    """Deterministic per-doc (width, height, n_frames) — the synthetic
    corpus spec shared with the DuckDB oracle."""
    return 8 + doc_id % 5, 6 + doc_id % 4, 3 + doc_id % 3


def render_y4m(doc_id: int) -> bytes:
    """Render the deterministic test clip as REAL Y4M bytes. Per-frame
    plane ramps (all mod 256, with PER-DOC multipliers so different clips
    are genuinely diverse while frames of one clip stay near-identical —
    the similarity structure real video corpora have):
        Y = (3+d%7)x + (5+d%11)y + 7t + d
        U = (2+d%5)x + (1+d%3)y + 11t + 3d
        V = (1+d%4)x + (4+d%9)y + 13t + 5d
    — the closed-form spec the oracle integrates, so a decoder bug
    (header parse, plane offsets, frame stride) breaks the value match."""
    import numpy as np

    w, h, nf = _y4m_params(doc_id)
    d = doc_id
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h))
    y, x = np.mgrid[0:h, 0:w]
    for t in range(nf):
        out += b"FRAME\n"
        out += (((3 + d % 7) * x + (5 + d % 11) * y + 7 * t + d) % 256).astype(np.uint8).tobytes()
        out += (((2 + d % 5) * x + (1 + d % 3) * y + 11 * t + 3 * d) % 256).astype(np.uint8).tobytes()
        out += (((1 + d % 4) * x + (4 + d % 9) * y + 13 * t + 5 * d) % 256).astype(np.uint8).tobytes()
    return bytes(out)


def decode_y4m(payload: bytes):
    """REAL YUV4MPEG2 decoder (public spec, pure numpy): tokenizes the
    stream header (W/H/C tags; only C444 supported — the format DEFAULTS
    to 420 when the C tag is absent, so an explicit C444 is required),
    then walks FRAME markers slicing raw Y/U/V planes. Returns
    (w, h, uint8 array (n_frames, 3, h, w))."""
    import numpy as np

    buf = bytes(payload)
    eol = buf.find(b"\n")
    if eol < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420"  # spec default when the C tag is absent
    for tok in buf[:eol].split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            colorspace = "C" + val.decode("ascii", "replace")
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("missing or invalid W/H header tags")
    # exact match required: C444 variants (C444alpha, C444p16, ...) have
    # different plane counts/sizes — slicing them as plain C444 would fail
    # later with a misleading FRAME-marker error (ADVICE r12)
    if colorspace != "C444":
        raise ValueError(f"unsupported colorspace {colorspace} (only C444)")
    plane = w * h
    pos, n = eol + 1, len(buf)
    frames = []
    while pos < n:
        feol = buf.find(b"\n", pos)
        if feol < 0 or buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = feol + 1
        if pos + 3 * plane > n:
            raise ValueError("truncated frame planes")
        yuv = np.frombuffer(buf, dtype=np.uint8, count=3 * plane, offset=pos)
        frames.append(yuv.reshape(3, h, w))
        pos += 3 * plane
    if not frames:
        raise ValueError("no frames")
    return w, h, np.stack(frames)


def synth_y4m_media(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are real Y4M clips (one per doc_id),
    rendered in a narrow mapInPandas — the video twin of synth_ppm_media."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_y4m(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "video/x-yuv4mpeg",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, width bigint, height bigint,"
    " sum_y bigint, sum_u bigint, sum_v bigint"
)


def video_frame_stats(media: DataFrame) -> DataFrame:
    """Decode every clip with the REAL Y4M parser and emit one row per
    FRAME (the genuine 1→N video explosion) with exact-integer plane sums
    — bit-identical cross-engine, no float protocol. Narrow mapInPandas:
    the explosion happens inside the Arrow batch, zero shuffles."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_idx", "width", "height",
                "sum_y", "sum_u", "sum_v",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_y4m(payload)
                sums = frames.astype(np.int64).sum(axis=(2, 3))  # (n, 3)
                for t in range(frames.shape[0]):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(t)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_y"].append(int(sums[t, 0]))
                    rows["sum_u"].append(int(sums[t, 1]))
                    rows["sum_v"].append(int(sums[t, 2]))
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(fn, VIDEO_FRAME_SCHEMA)


def video_frame_stats_sql() -> str:
    """DuckDB oracle twin of synth_y4m_media → video_frame_stats:
    integrates the closed-form plane ramps per (doc, frame) and UNNESTs
    the frame dimension, value-checking the Spark side's render → header
    tokenize → plane slice → per-frame sums end-to-end."""
    return """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
         3 + doc_id % 3 AS nf
  FROM documents),
f AS (
  SELECT doc_id, w, h, unnest(range(0, nf)) AS t FROM d),
s AS (
  SELECT doc_id, t, w, h,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> ((3 + doc_id % 7) * x + (5 + doc_id % 11) * y + 7 * t + doc_id) % 256)))) AS sy,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> ((2 + doc_id % 5) * x + (1 + doc_id % 3) * y + 11 * t + 3 * doc_id) % 256)))) AS su,
         list_sum(flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w), x -> ((1 + doc_id % 4) * x + (4 + doc_id % 9) * y + 13 * t + 5 * doc_id) % 256)))) AS sv
  FROM f)
SELECT doc_id, CAST(t AS BIGINT) AS frame_idx, CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height, CAST(sy AS BIGINT) AS sum_y,
       CAST(su AS BIGINT) AS sum_u, CAST(sv AS BIGINT) AS sum_v
FROM s
"""


_FRAME_GID_STRIDE = 8  # frames per doc < 8, so gid = doc_id*8 + t is unique


def frame_signatures(media: DataFrame, out_len: int = AHASH_BITS) -> DataFrame:
    """Per-FRAME perceptual hash of a video corpus: decode each Y4M clip
    and aHash every frame's luma (Y) plane with the exact-integer bucket
    rule (_ahash_sig) — decode and fingerprint in ONE narrow mapInPandas
    pass, zero shuffles. gid = doc_id*8 + frame_idx gives each frame a
    unique join key for the banded self-join downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "gid", "sig")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, frames = decode_y4m(payload)
                if frames.shape[0] >= _FRAME_GID_STRIDE:
                    # gid = doc_id*STRIDE + t is only unique while every
                    # clip has < STRIDE frames; a _y4m_params change that
                    # breaks this must fail loudly, not corrupt pairs
                    raise ValueError(
                        f"clip {int(doc_id)} has {frames.shape[0]} frames"
                        f" >= _FRAME_GID_STRIDE={_FRAME_GID_STRIDE}"
                    )
                for t in range(frames.shape[0]):
                    luma = frames[t, 0].reshape(-1).astype(np.int64)
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(t)
                    rows["gid"].append(int(doc_id) * _FRAME_GID_STRIDE + t)
                    rows["sig"].append(_ahash_sig(luma, out_len))
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(
        fn, "doc_id bigint, frame_idx bigint, gid bigint, sig bigint"
    )


def video_frame_neardup(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Keyframe-level video dedup: near-duplicate FRAME pairs across the
    whole corpus (within and across clips) by banded perceptual hash —
    the video twin of phash_pairs. Candidates come from a uniform-key
    equi-join on 4×16-bit signature bands (no all-pairs); the popcount
    verify is exact. At 100 TB this is the plan that finds re-encoded /
    re-uploaded video segments: signatures shrink each frame to 8 bytes,
    and the band join shuffles only (band, 16-bit key) groups."""
    sig = frame_signatures(media).localCheckpoint(eager=False)
    bands = sig.select(
        "gid",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sig", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bkey"),
                    )
                    for i in range(AHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("gid", "sig", "b.band", "b.bkey")
    a = bands.select(
        F.col("gid").alias("gid_a"), F.col("sig").alias("sig_a"), "band", "bkey"
    )
    b = bands.select(
        F.col("gid").alias("gid_b"), F.col("sig").alias("sig_b"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("gid_a") < F.col("gid_b"))
        .select("gid_a", "gid_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    s = _FRAME_GID_STRIDE  # integer div/mod, never float division (exact at any gid)
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.expr(f"gid_a div {s}").alias("doc_a"),
            (F.col("gid_a") % s).cast("bigint").alias("frame_a"),
            F.expr(f"gid_b div {s}").alias("doc_b"),
            (F.col("gid_b") % s).cast("bigint").alias("frame_b"),
            "hamming",
        )
    )


def video_neardup_profile(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Corpus-level video near-dup PROFILE: the full banded-join + popcount
    pair evaluation of video_frame_neardup, aggregated to (within-clip vs
    cross-clip) × hamming counts. The synthetic ramp corpus is near-dup
    dense (smooth gradients collapse to few aHash patterns), so raw pairs
    are O(M) rows; the profile keeps the heavy distributed work — ONE
    signature pass + ONE banded self-join — while the compared result
    stays ≤ 2·(max_hamming+1) rows, the same shape discipline as the
    frontier tables."""
    pairs = video_frame_neardup(media, max_hamming)
    return (
        pairs.groupBy(
            (F.col("doc_a") == F.col("doc_b")).cast("bigint").alias("same_clip"),
            "hamming",
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("same_clip", "hamming")
    )


def video_frame_neardup_sql(max_hamming: int = 8, out_len: int = AHASH_BITS) -> str:
    """DuckDB oracle twin of frame_signatures → video_frame_neardup: the
    per-frame luma plane is the closed-form Y ramp (never touching bytes),
    bucket splits replicate numpy.array_split, and the bit test is the
    exact integer inequality _ahash_sig uses — so the whole decode →
    fingerprint → band-join → popcount pipeline is value-checked."""
    big = (
        "CASE WHEN l = 0 THEN "
        "CASE WHEN bsizes[i + 1] > 0 AND bsums[i + 1] * {OL} > total THEN 1 ELSE 0 END "
        "ELSE CASE WHEN bsums[i + 1] * ({OL} * l * (l + 1)) > "
        "(l * abig + (l + 1) * (total - abig)) * bsizes[i + 1] THEN 1 ELSE 0 END END"
    ).format(OL=out_len)
    return f"""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
         3 + doc_id % 3 AS nf
  FROM documents),
fr AS (
  SELECT doc_id, w, h, unnest(range(0, nf)) AS t FROM d),
bl AS (
  SELECT doc_id, t, doc_id * {_FRAME_GID_STRIDE} + t AS gid,
         CAST(w * h AS BIGINT) AS n,
         flatten(list_transform(range(0, h), y ->
           list_transform(range(0, w),
             x -> ((3 + doc_id % 7) * x + (5 + doc_id % 11) * y + 7 * t + doc_id) % 256))) AS bytes
  FROM fr),
par AS (
  SELECT doc_id, t, gid, n, bytes, n // {out_len} AS l, n % {out_len} AS rem,
         coalesce(list_sum(bytes), 0) AS total
  FROM bl),
bk AS (
  SELECT doc_id, t, gid, n, l, rem, total,
         list_transform(range(0, {out_len}),
           i -> coalesce(list_sum(bytes[i * l + least(i, rem) + 1 :
                                        i * l + least(i, rem) + l + CASE WHEN i < rem THEN 1 ELSE 0 END]), 0)) AS bsums,
         list_transform(range(0, {out_len}),
           i -> l + CASE WHEN i < rem THEN 1 ELSE 0 END) AS bsizes
  FROM par),
ab AS (SELECT *, coalesce(list_sum(bsums[1 : rem]), 0) AS abig FROM bk),
bits AS (
  SELECT gid,
         CASE WHEN n = 0 THEN list_transform(range(0, {out_len}), i -> 0)
              ELSE list_transform(range(0, {out_len}), i -> {big}) END AS bits
  FROM ab),
sig AS (
  -- CAST to BIGINT is load-bearing: list_sum returns HUGEINT, and
  -- xor(hugeint) on a negative sig sign-extends 64 extra one-bits, so the
  -- hamming filter silently drops every mixed-sign near-dup pair
  SELECT gid,
         CAST((CASE WHEN bits[1] = 1 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)
         + coalesce(list_sum(list_transform(range(1, {out_len}),
             i -> CAST(bits[i + 1] AS BIGINT) * (CAST(1 AS BIGINT) << ({out_len - 1} - i)))), 0) AS BIGINT) AS sig
  FROM bits),
banded AS (
  {" UNION ALL ".join(f"SELECT gid, sig, {k} AS band, (sig >> {16 * k}) & 65535 AS bkey FROM sig" for k in range(AHASH_BANDS))}),
cand AS (
  SELECT DISTINCT a.gid AS gid_a, b.gid AS gid_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.gid < b.gid),
pairs AS (
  SELECT gid_a // {_FRAME_GID_STRIDE} AS doc_a, gid_b // {_FRAME_GID_STRIDE} AS doc_b,
         CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
  FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming})
SELECT CAST(doc_a = doc_b AS BIGINT) AS same_clip, hamming,
       count(*) AS n_pairs
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def phash_pairs_sql(max_hamming: int = 8, out_len: int = AHASH_BITS) -> str:
    """DuckDB oracle twin of ahash → phash_pairs: utf-8 bytes recovered
    from hex(encode(text)); bucket splits replicate numpy.array_split
    (`rem` buckets of l+1 then size l); the bit test is the exact integer
    inequality the kernel now uses, so signatures match bit-for-bit."""
    hexd = "'0123456789ABCDEF'"
    byte_i = (
        f"(strpos({hexd}, substr(hx, 2 * i - 1, 1)) - 1) * 16"
        f" + strpos({hexd}, substr(hx, 2 * i, 1)) - 1"
    )
    big = (
        "CASE WHEN l = 0 THEN "
        "CASE WHEN bsizes[i + 1] > 0 AND bsums[i + 1] * {OL} > total THEN 1 ELSE 0 END "
        "ELSE CASE WHEN bsums[i + 1] * ({OL} * l * (l + 1)) > "
        "(l * abig + (l + 1) * (total - abig)) * bsizes[i + 1] THEN 1 ELSE 0 END END"
    ).format(OL=out_len)
    return f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents),
bl AS (
  SELECT doc_id, n,
         list_transform(range(1, n + 1), i -> {byte_i}) AS bytes
  FROM b),
par AS (
  SELECT doc_id, n, bytes, n // {out_len} AS l, n % {out_len} AS rem,
         coalesce(list_sum(bytes), 0) AS total
  FROM bl),
bk AS (
  SELECT doc_id, n, l, rem, total,
         list_transform(range(0, {out_len}),
           i -> coalesce(list_sum(bytes[i * l + least(i, rem) + 1 :
                                        i * l + least(i, rem) + l + CASE WHEN i < rem THEN 1 ELSE 0 END]), 0)) AS bsums,
         list_transform(range(0, {out_len}),
           i -> l + CASE WHEN i < rem THEN 1 ELSE 0 END) AS bsizes
  FROM par),
ab AS (SELECT *, coalesce(list_sum(bsums[1 : rem]), 0) AS abig FROM bk),
bits AS (
  SELECT doc_id,
         CASE WHEN n = 0 THEN list_transform(range(0, {out_len}), i -> 0)
              ELSE list_transform(range(0, {out_len}), i -> {big}) END AS bits
  FROM ab),
sig AS (
  -- CAST to BIGINT is load-bearing (same reason as video_frame_neardup_sql):
  -- list_sum returns HUGEINT, and xor(hugeint) on a negative sig
  -- sign-extends 64 extra one-bits, dropping mixed-sign near-dup pairs.
  -- Verified a value-no-op on the current corpus (no qualifying
  -- mixed-sign pair exists at any SF), but latent against future data.
  SELECT doc_id,
         CAST((CASE WHEN bits[1] = 1 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)
         + coalesce(list_sum(list_transform(range(1, {out_len}),
             i -> CAST(bits[i + 1] AS BIGINT) * (CAST(1 AS BIGINT) << ({out_len - 1} - i)))), 0) AS BIGINT) AS sig
  FROM bits),
banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, sig, {k} AS band, (sig >> {16 * k}) & 65535 AS bkey FROM sig" for k in range(AHASH_BANDS))}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
"""


# --- real image codec #2: baseline JPEG (ITU-T T.81, grayscale) -------------
#
# Baseline sequential JPEG needs no external codec: the container is a
# marker stream (struct-level slicing), entropy coding is canonical Huffman
# (T.81 Annex C code generation from DHT BITS/HUFFVAL lists), and the
# transform is an 8x8 DCT-II (one numpy matrix product). render_jpeg emits
# REAL baseline JFIF files (SOI/APP0/COM/DQT/SOF0/DHT/SOS/EOI with a
# byte-stuffed entropy scan); decode_jpeg parses them back using tables
# rebuilt from the file's own DQT/DHT segments, never the encoder's
# constants. Corpus design makes the cross-engine check exact-integer:
#   * pixel corpus: per-block CONSTANT samples with EVEN values — a
#     constant block has only a DC coefficient, and with Q[0,0]=16 the
#     quantize/dequantize round-trip of 8*(v-128) is exact, so decoded
#     pixels equal the closed-form spec bit-for-bit;
#   * coefficient corpus: the image is DEFINED in quantized-coefficient
#     space (planted DC + three AC slots, one past a 16-zero gap so the
#     encoder must emit ZRL), and the decoder's dequantized coefficients
#     are exact integers the oracle integrates directly.
# The reference (B1h14/Time-Series-Data-Generation) has no media path at
# all — this is the north-star multimodal extension, same contract as the
# PNG/WAV/Y4M decoders above.

_JPEG_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]  # Annex-K-style luminance table, row-major; Q[0,0]=16 is load-bearing


def _zigzag_order() -> list:
    """The T.81 zigzag scan order, GENERATED (not typed) to avoid
    transcription bugs: diagonals s=r+c ascending; odd diagonals walk r
    ascending, even ones descending."""
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        out.extend((r, s - r) for r in (rng if s % 2 == 1 else reversed(rng)))
    return out


_ZIGZAG = _zigzag_order()
_QUANT_ZZ = [_JPEG_QUANT[r * 8 + c] for r, c in _ZIGZAG]

# Annex-K-style Huffman specs (BITS = #codes per length 1..16, then symbols
# in canonical order). The decoder never reads these constants — it rebuilds
# tables from the file's DHT segment — so round-trip correctness depends
# only on the spec being a valid canonical table covering the emitted
# symbols (all DC sizes 0-11; every AC (run,size) with size 1-10, plus ZRL
# and EOB).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_spec_codes(bits: list, vals: list) -> dict:
    """Canonical code assignment (T.81 Annex C): symbols get consecutive
    codes in increasing code-length order. Returns sym -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator emitting the byte-stuffed entropy stream
    (a 0xFF data byte is followed by 0x00 so decoders can find markers)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self._out)


def _mag_bits(v: int) -> tuple:
    """(size, value-bits) for a DC diff / AC coefficient: negatives are
    stored as their size-bit one's complement (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _encode_scan(blocks_zz) -> bytes:
    """Entropy-encode quantized blocks (zigzag int arrays of 64): DC is
    diff-coded vs the previous block; AC as (run,size) Huffman symbols
    with ZRL for 16-zero runs and EOB when the tail is all zero."""
    dc_codes = _huff_spec_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_spec_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    pred = 0
    for zz in blocks_zz:
        size, bits = _mag_bits(int(zz[0]) - pred)
        pred = int(zz[0])
        code, n = dc_codes[size]
        w.write(code, n)
        if size:
            w.write(bits, size)
        nz = [i for i in range(1, 64) if int(zz[i])]
        prev = 0
        for i in nz:
            run = i - prev - 1
            prev = i
            while run >= 16:
                code, n = ac_codes[0xF0]  # ZRL
                w.write(code, n)
                run -= 16
            size, bits = _mag_bits(int(zz[i]))
            code, n = ac_codes[(run << 4) | size]
            w.write(code, n)
            w.write(bits, size)
        if not nz or nz[-1] != 63:
            code, n = ac_codes[0x00]  # EOB
            w.write(code, n)
    return w.flush()


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    import struct

    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jpeg_wrap(w: int, h: int, scan: bytes) -> bytes:
    """Assemble a complete baseline JFIF file around an entropy scan:
    APP0 + a COM segment (unknown-segment skip path), one DQT, SOF0, and
    BOTH Huffman tables in a single DHT segment (decoders must loop over
    tables within one segment — a real-world parser trap)."""
    import struct

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\x00" + bytes(_QUANT_ZZ)  # Pq=0 (8-bit), Tq=0, zigzag order
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht = (
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, app0)
        + _jpeg_seg(0xFE, b"tsgen synthetic corpus")
        + _jpeg_seg(0xDB, dqt)
        + _jpeg_seg(0xC0, sof)
        + _jpeg_seg(0xC4, dht)
        + _jpeg_seg(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )


def _jpeg_params(doc_id: int) -> tuple:
    """Deterministic per-doc (width, height), both multiples of 8 — the
    synthetic corpus spec shared with the DuckDB oracle."""
    return 8 * (2 + doc_id % 4), 8 * (2 + doc_id % 3)


def _jpeg_block_value(doc_id: int, bx: int, by: int) -> int:
    """Per-8x8-block constant sample value. EVEN by construction: with
    Q[0,0]=16 the DC quantize round-trip of 8*(v-128) is then exact
    ((v-128)/2 is an integer), so decoded pixels equal this spec
    bit-for-bit and the oracle needs no rounding protocol."""
    return 2 * ((7 * doc_id + 17 * bx + 29 * by) % 113) + 14


_DCT_M = None


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix M (rows = basis): the JPEG FDCT
    (1/4)C(u)C(v)SS convention equals M @ B @ M.T exactly."""
    global _DCT_M
    if _DCT_M is None:
        import numpy as np

        u = np.arange(8, dtype=np.float64)[:, None]
        x = np.arange(8, dtype=np.float64)[None, :]
        m = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
        m[0] *= np.sqrt(0.5)
        _DCT_M = m
    return _DCT_M


def render_jpeg(doc_id: int) -> bytes:
    """Render the deterministic block-constant test image as a REAL
    baseline JPEG: level shift -> float64 8x8 DCT-II -> quantize
    (round-to-nearest; exact for this corpus) -> zigzag -> canonical
    Huffman with byte stuffing -> full JFIF marker stream."""
    import numpy as np

    w, h = _jpeg_params(doc_id)
    m = _dct_matrix()
    qt = np.asarray(_JPEG_QUANT, dtype=np.float64).reshape(8, 8)
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            v = _jpeg_block_value(doc_id, bx, by)
            b = np.full((8, 8), float(v) - 128.0)
            q = np.rint((m @ b @ m.T) / qt)
            blocks.append(
                np.array([int(q[r, c]) for r, c in _ZIGZAG], dtype=np.int64)
            )
    return _jpeg_wrap(w, h, _encode_scan(blocks))


_JPEG_PLANT_Z = (1, 4, 21)  # zigzag slots: low AC, mid AC, and one past a
#                             16-zero gap so the encoder must emit ZRL


def _jpeg_planted_block(doc_id: int, bx: int, by: int) -> dict:
    """Quantized-coefficient spec for the AC-path corpus: DC plus three
    planted AC slots (a value of 0 is simply absent from the stream).
    Signed ranges exercise negative magnitudes in DC diffs and ACs."""
    return {
        0: ((11 * doc_id + 5 * bx + 3 * by) % 21) - 10,
        1: ((doc_id + bx + 2 * by) % 7) - 3,
        4: ((3 * doc_id + bx) % 5) - 2,
        21: ((doc_id + by) % 3) - 1,
    }


def render_jpeg_planted(doc_id: int) -> bytes:
    """AC-corpus encoder: the image is DEFINED in coefficient space
    (every JPEG is — pixels are IDCT output), so quantized blocks come
    straight from the closed-form spec and the decoder's dequantized
    coefficients are exact integers the oracle integrates directly."""
    import numpy as np

    w, h = _jpeg_params(doc_id)
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = np.zeros(64, dtype=np.int64)
            for z, k in _jpeg_planted_block(doc_id, bx, by).items():
                zz[z] = k
            blocks.append(zz)
    return _jpeg_wrap(w, h, _encode_scan(blocks))


class _BitReader:
    """MSB-first reader over the unstuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, n: int) -> int:
        while self._nbits < n:
            if self._pos >= len(self._d):
                raise ValueError("entropy stream exhausted")
            self._acc = (self._acc << 8) | self._d[self._pos]
            self._pos += 1
            self._nbits += 8
        self._nbits -= n
        v = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map size-bit magnitude bits back to a signed value."""
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes):
    """REAL baseline JPEG decoder (public ITU-T T.81 spec; numpy+struct
    only): marker walk skipping APPn/COM, DQT (multi-table, zigzag), DHT
    (canonical tables rebuilt from BITS/HUFFVAL, multiple per segment),
    SOF0 (8-bit grayscale only — progressive/color/restart raise), SOS,
    byte-unstuffed Huffman scan with diff-coded DC and run-length/ZRL/EOB
    AC, dequantization, and a float64 IDCT back to clamped uint8 samples.

    Returns (width, height, pixels[h,w] uint8, dq[n_blocks,64] int64) —
    dq holds DEQUANTIZED coefficients in zigzag order, row-major block
    order, so coefficient-domain oracles stay exact-integer."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, n = 2, len(buf)
    qtables: dict = {}
    htables: dict = {}
    w = h = None
    comp_tq = 0
    scan = None
    dc_id = ac_id = 0
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        body = buf[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        pos += seglen
        if marker == 0xDB:  # DQT — may hold several tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT table")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT table")
                codes = _huff_spec_codes(bits, vals)
                htables[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampling meaningless for grayscale")
            comp_tq = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} (baseline only)"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if body[0] != 1:
                raise ValueError("interleaved scans unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 15
            data = bytearray()
            while pos < n:
                b0 = buf[pos]
                if b0 == 0xFF:
                    if pos + 1 < n and buf[pos + 1] == 0x00:
                        data.append(0xFF)  # stuffed data byte
                        pos += 2
                        continue
                    break  # a real marker ends the scan
                data.append(b0)
                pos += 1
            scan = bytes(data)
        # all other length-bearing markers (APPn, COM, ...) are skipped
    if w is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    if comp_tq not in qtables:
        raise ValueError("missing quant table")
    dc_tab, ac_tab = htables.get((0, dc_id)), htables.get((1, ac_id))
    if dc_tab is None or ac_tab is None:
        raise ValueError("missing Huffman table")
    q = np.asarray(qtables[comp_tq], dtype=np.int64)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    reader = _BitReader(scan)
    m = _dct_matrix()
    dq = np.zeros((bw * bh, 64), dtype=np.int64)
    canvas = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    pred = 0
    for bi in range(bw * bh):
        zz = np.zeros(64, dtype=np.int64)
        size = _huff_decode(reader, dc_tab)
        pred += _extend(reader.read(size), size) if size else 0
        zz[0] = pred
        k = 1
        while k < 64:
            sym = _huff_decode(reader, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            k += sym >> 4
            size = sym & 15
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(reader.read(size), size)
            k += 1
        deq = zz * q
        dq[bi] = deq
        blk = np.zeros((8, 8), dtype=np.float64)
        for z, (r, c) in enumerate(_ZIGZAG):
            blk[r, c] = deq[z]
        px = np.clip(np.rint(m.T @ blk @ m) + 128.0, 0, 255).astype(np.uint8)
        by, bx = divmod(bi, bw)
        canvas[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    return w, h, canvas[:h, :w], dq


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are real baseline JPEGs (pixel corpus),
    rendered in a narrow mapInPandas — the JPEG twin of synth_png_media."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_jpeg(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "image/jpeg",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


def synth_jpeg_planted_media(docs: DataFrame) -> DataFrame:
    """Media table for the AC-path corpus (coefficient-space images)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render_jpeg_planted(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "image/jpeg",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            ).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


JPEG_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_px bigint,"
    " sum_px bigint, sum_sq bigint, min_px bigint, max_px bigint"
)


def jpeg_stats(media: DataFrame) -> DataFrame:
    """Decode every payload with the REAL JPEG decoder and emit per-image
    pixel statistics — ALL exact integers on the block-constant corpus,
    so the cross-engine match is bit-for-bit. Narrow mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_px",
                "sum_px", "sum_sq", "min_px", "max_px",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px, _ = decode_jpeg(payload)
                a = px.astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(a.size)
                rows["sum_px"].append(int(a.sum()))
                rows["sum_sq"].append(int((a * a).sum()))
                rows["min_px"].append(int(a.min()))
                rows["max_px"].append(int(a.max()))
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(fn, JPEG_STATS_SCHEMA)


def jpeg_stats_sql() -> str:
    """DuckDB oracle twin of synth_jpeg_media -> jpeg_stats: integrates
    the closed-form block-value spec directly (never touching bytes), so
    the render -> FDCT -> quantize -> Huffman -> byte-stuff -> parse ->
    Huffman-decode -> dequantize -> IDCT pipeline is value-checked
    end-to-end — any marker, table, bit-order, stuffing, predictor, or
    transform bug breaks the match."""
    return """
WITH d AS (
  SELECT doc_id, 8 * (2 + doc_id % 4) AS w, 8 * (2 + doc_id % 3) AS h
  FROM documents),
b AS (
  SELECT doc_id, w, h,
         flatten(list_transform(range(0, h // 8), by ->
           list_transform(range(0, w // 8), bx ->
             2 * ((7 * doc_id + 17 * bx + 29 * by) % 113) + 14))) AS vs
  FROM d)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(64 * list_sum(vs) AS BIGINT) AS sum_px,
       CAST(64 * list_sum(list_transform(vs, v -> v * v)) AS BIGINT) AS sum_sq,
       CAST(list_min(vs) AS BIGINT) AS min_px,
       CAST(list_max(vs) AS BIGINT) AS max_px
FROM b
"""


JPEG_COEFF_SCHEMA = (
    "doc_id bigint, n_blocks bigint, dc_sum_dq bigint, ac_sum_dq bigint,"
    " nnz bigint, sum_abs_dq bigint"
)


def jpeg_coeff_stats(media: DataFrame) -> DataFrame:
    """Decode payloads and emit per-image DEQUANTIZED-coefficient stats
    (exact integers): the AC-path certification surface — run lengths,
    ZRL, EOB, negative magnitudes, and DC prediction all feed these sums."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_blocks", "dc_sum_dq", "ac_sum_dq",
                "nnz", "sum_abs_dq",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, _, dq = decode_jpeg(payload)
                rows["doc_id"].append(int(doc_id))
                rows["n_blocks"].append(dq.shape[0])
                rows["dc_sum_dq"].append(int(dq[:, 0].sum()))
                rows["ac_sum_dq"].append(int(dq[:, 1:].sum()))
                rows["nnz"].append(int((dq != 0).sum()))
                rows["sum_abs_dq"].append(int(np.abs(dq).sum()))
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(fn, JPEG_COEFF_SCHEMA)


def jpeg_coeff_stats_sql() -> str:
    """DuckDB oracle twin of synth_jpeg_planted_media -> jpeg_coeff_stats:
    the quant constants are interpolated FROM the Python table via the
    generated zigzag order (no hand-typed duplicates to drift)."""
    q0, q1, q4, q21 = (_QUANT_ZZ[z] for z in (0,) + _JPEG_PLANT_Z)
    return f"""
WITH d AS (
  SELECT doc_id, 8 * (2 + doc_id % 4) AS w, 8 * (2 + doc_id % 3) AS h
  FROM documents),
g AS (SELECT doc_id, w, h, unnest(range(0, h // 8)) AS by FROM d),
blk AS (SELECT doc_id, w, h, by, unnest(range(0, w // 8)) AS bx FROM g),
k AS (
  SELECT doc_id,
         ((11 * doc_id + 5 * bx + 3 * by) % 21) - 10 AS k0,
         ((doc_id + bx + 2 * by) % 7) - 3 AS k1,
         ((3 * doc_id + bx) % 5) - 2 AS k4,
         ((doc_id + by) % 3) - 1 AS k21
  FROM blk)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(k0 * {q0}) AS BIGINT) AS dc_sum_dq,
       CAST(sum(k1 * {q1} + k4 * {q4} + k21 * {q21}) AS BIGINT) AS ac_sum_dq,
       CAST(sum(CASE WHEN k0 <> 0 THEN 1 ELSE 0 END
              + CASE WHEN k1 <> 0 THEN 1 ELSE 0 END
              + CASE WHEN k4 <> 0 THEN 1 ELSE 0 END
              + CASE WHEN k21 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
       CAST(sum(abs(k0) * {q0} + abs(k1) * {q1} + abs(k4) * {q4}
              + abs(k21) * {q21}) AS BIGINT) AS sum_abs_dq
FROM k GROUP BY doc_id
"""


# --- cross-codec content-addressed dedup ------------------------------------
#
# The training-data problem this demonstrates: the SAME image circulates in
# a crawl under different codecs (a PNG master and a JPEG re-encode), so
# byte-level dedup can never see the duplicate — only decoding both to
# pixels and content-addressing the DECODED samples can. The corpus pairs
# every doc's block-constant image (the JPEG pixel corpus, which is exact
# under baseline JPEG by design) with a lossless grayscale PNG twin; a
# deterministic subset of PNGs is perturbed (+2 on every block) so the
# query must BOTH find the true cross-codec duplicates and keep the
# perturbed pairs apart. Content key = the exact decoded-pixel stats
# tuple (w, h, sum, sum_sq, min, max) — in production you'd md5 the
# canonical pixel buffer; the stats tuple keeps the key closed-form for
# the oracle while still separating every planted case.

CROSS_PERTURB_MOD, CROSS_PERTURB_RES, CROSS_PERTURB = 7, 3, 2


def render_png_gray_blocks(doc_id: int, perturb: int = 0) -> bytes:
    """Grayscale 8-bit PNG of the SAME block-constant image as
    render_jpeg (+perturb on every block) — the lossless twin for the
    cross-codec corpus. Filter-0 scanlines: filter breadth is certified
    by render_png's cycling corpus; content identity is the property
    under test here."""
    import struct
    import zlib

    import numpy as np

    w, h = _jpeg_params(doc_id)
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _jpeg_block_value(doc_id, bx, by) + perturb
            )
    raw = bytearray()
    for row in range(h):
        raw.append(0)
        raw += img[row].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def synth_cross_codec_media(docs: DataFrame) -> DataFrame:
    """Two media rows per doc: the PNG master (perturbed for doc_id %
    CROSS_PERTURB_MOD == CROSS_PERTURB_RES) and the JPEG re-encode."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "payload": [], "n_bytes": []}
            for d in pdf["doc_id"]:
                d = int(d)
                pv = CROSS_PERTURB if d % CROSS_PERTURB_MOD == CROSS_PERTURB_RES else 0
                for kind, payload in (
                    ("image/png", render_png_gray_blocks(d, pv)),
                    ("image/jpeg", render_jpeg(d)),
                ):
                    rows["doc_id"].append(d)
                    rows["kind"].append(kind)
                    rows["payload"].append(payload)
                    rows["n_bytes"].append(len(payload))
            yield pd.DataFrame(rows).astype({"doc_id": "int64", "n_bytes": "int32"})

    return docs.select("doc_id").mapInPandas(
        fn, "doc_id bigint, kind string, payload binary, n_bytes int"
    )


CROSS_CODEC_SCHEMA = (
    "width bigint, height bigint, sum_px bigint, sum_sq bigint,"
    " min_px bigint, max_px bigint, is_png bigint, is_jpeg bigint"
)


def cross_codec_dedup(media: DataFrame) -> DataFrame:
    """Decode every payload with ITS OWN real codec (PNG chunk walk or
    T.81 baseline), content-address the decoded pixels, and group: rows
    where n_copies >= 2 with both formats present are cross-codec
    duplicates found ONLY because both decoders agree on the pixels.
    Scale shape: narrow decode pass, then ONE shuffle of 6-int key rows
    (8 ints/payload — never the payload bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "width", "height", "sum_px", "sum_sq",
                "min_px", "max_px", "is_png", "is_jpeg",
            )}
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image/png":
                    w, h, px = decode_png(payload)
                else:
                    w, h, px, _ = decode_jpeg(payload)
                a = px.reshape(-1).astype(np.int64)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_px"].append(int(a.sum()))
                rows["sum_sq"].append(int((a * a).sum()))
                rows["min_px"].append(int(a.min()))
                rows["max_px"].append(int(a.max()))
                rows["is_png"].append(int(kind == "image/png"))
                rows["is_jpeg"].append(int(kind == "image/jpeg"))
            yield pd.DataFrame(rows).astype("int64")

    st = media.mapInPandas(fn, CROSS_CODEC_SCHEMA)
    keys = ["width", "height", "sum_px", "sum_sq", "min_px", "max_px"]
    return st.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.sum("is_png").alias("n_png"),
        F.sum("is_jpeg").alias("n_jpeg"),
    )


def cross_codec_dedup_sql() -> str:
    """DuckDB oracle twin of synth_cross_codec_media -> cross_codec_dedup:
    integrates the block spec (+ the PNG perturbation rule) per (doc,
    format) and groups by the same content key — so a decode divergence
    in EITHER codec, or a perturbed pair wrongly matched, breaks it."""
    return f"""
WITH d AS (
  SELECT doc_id, 8 * (2 + doc_id % 4) AS w, 8 * (2 + doc_id % 3) AS h
  FROM documents),
fmtd AS (
  SELECT doc_id, w, h, f.fmt,
         CASE WHEN f.fmt = 'png' AND doc_id % {CROSS_PERTURB_MOD} = {CROSS_PERTURB_RES}
              THEN {CROSS_PERTURB} ELSE 0 END AS dv
  FROM d, (SELECT unnest(['png', 'jpeg']) AS fmt) f),
b AS (
  SELECT doc_id, fmt, w, h,
         flatten(list_transform(range(0, h // 8), by ->
           list_transform(range(0, w // 8), bx ->
             2 * ((7 * doc_id + 17 * bx + 29 * by) % 113) + 14 + dv))) AS vs
  FROM fmtd),
st AS (
  SELECT fmt, w, h,
         CAST(64 * list_sum(vs) AS BIGINT) AS sum_px,
         CAST(64 * list_sum(list_transform(vs, v -> v * v)) AS BIGINT) AS sum_sq,
         CAST(list_min(vs) AS BIGINT) AS min_px,
         CAST(list_max(vs) AS BIGINT) AS max_px
  FROM b)
SELECT CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       sum_px, sum_sq, min_px, max_px,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(sum(CASE WHEN fmt = 'png' THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
       CAST(sum(CASE WHEN fmt = 'jpeg' THEN 1 ELSE 0 END) AS BIGINT) AS n_jpeg
FROM st GROUP BY w, h, sum_px, sum_sq, min_px, max_px
"""
