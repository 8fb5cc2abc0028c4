"""Multimodal-column plumbing (north-star extension).

Images/audio/video are opaque BINARY columns with typed metadata; decode /
feature-extraction runs as Arrow-batched mapInPandas over binary batches.
The actual media decode is STUBBED (no image/audio libs in this container —
see decode_stub): the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested; swapping decode_stub for a PIL/ffmpeg
call is a one-function change.

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


def decode_stub(payload: bytes) -> dict:
    """STUB for the real media decoder (PIL.Image.open / soundfile / ffmpeg).

    Deterministic fake: derives features from raw bytes so the distributed
    plumbing is fully exercised and value-checkable. A real deployment
    replaces only this function.
    """
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % 1_000_003
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
                n = len(raw)
                if n == 0:
                    ids.append(doc_id)
                    sigs.append(0)
                    continue
                # EXACT integer form of "bucket mean > mean of bucket means":
                # array_split gives `rem` buckets of size l+1 then size l, so
                # mean-of-means = (l*A + (l+1)*B) / (out_len*l*(l+1)) with
                # A = sum over big buckets, B = over small — the comparison
                # clears denominators and stays in int64, making the hash
                # bit-identical in any engine (the float version could flip
                # razor-tie bits under a different summation order).
                l, rem = divmod(n, out_len)
                sums = np.array(
                    [int(s.sum()) for s in np.array_split(raw, out_len)], dtype=object
                )
                sizes = np.array(
                    [len(s) for s in np.array_split(raw, out_len)], dtype=object
                )
                if l == 0:
                    total = int(raw.sum())
                    bits = [
                        (int(sz) > 0) and (int(sm) * out_len > total)
                        for sm, sz in zip(sums, sizes)
                    ]
                else:
                    a_big = int(sums[:rem].sum()) if rem else 0
                    b_small = int(sums[rem:].sum())
                    m = l * a_big + (l + 1) * b_small
                    scale = out_len * l * (l + 1)
                    bits = [
                        int(sm) * scale > m * int(sz) for sm, sz in zip(sums, sizes)
                    ]
                sig = 0
                for b in bits:
                    sig = (sig << 1) | int(b)
                # keep in signed-int64 range (bit 63 set -> negative is fine)
                ids.append(doc_id)
                sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
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
  SELECT doc_id,
         (CASE WHEN bits[1] = 1 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)
         + coalesce(list_sum(list_transform(range(1, {out_len}),
             i -> CAST(bits[i + 1] AS BIGINT) * (CAST(1 AS BIGINT) << ({out_len - 1} - i)))), 0) AS sig
  FROM bits),
banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, sig, {k} AS band, (sig >> {16 * k}) & 65535 AS bkey FROM sig" for k in range(AHASH_BANDS))}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
"""
