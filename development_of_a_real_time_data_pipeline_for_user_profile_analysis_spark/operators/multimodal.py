"""Multimodal column plumbing.

Convention: media travel as opaque ``binary`` payload columns with a
typed metadata struct alongside. Decode / feature-extract run as
Arrow-batched ``mapInPandas`` — the only sanctioned Python-in-the-
loop path, because media decoding is genuinely not expressible in
Spark SQL. The image/audio libraries are not in this container, so
the decode *content* is stubbed (deterministic fake, clearly marked);
the Spark-side plumbing — schema, Arrow batch shape, partitioning —
is real and tested.

At 100 TB: payloads dominate I/O, so metadata predicates must prune
*before* payload bytes move — keep metadata in separate columns (not
inside the binary), store parquet with large row groups, and filter
on metadata first so column pruning skips payload pages entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, mime string, fake_width long, fake_height long"
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal table: utf-8 bytes of
    the text stand in for an encoded media payload, plus a metadata
    struct. (With real media this column comes off the wire/object
    store as-is.)"""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text")).cast("long").alias("declared_len"),
        ).alias("meta"),
    )


def decode_payload(media: DataFrame) -> DataFrame:
    """'Decode' each payload via Arrow-batched mapInPandas.

    STUB: a real implementation would PIL/ffmpeg-decode here; this
    container has no media libs, so the decode derives deterministic
    fake dimensions from the byte length. The batch plumbing (Arrow
    transfer, vectorized pandas ops, output schema) is the real thing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    # deterministic fake of image dimensions
                    "fake_width": n_bytes % 640,
                    "fake_height": n_bytes % 480,
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def real_decode_stub(media: DataFrame) -> DataFrame:
    """Where true media decoding would plug in. Raises until the
    runtime has decode libraries."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg; not available in this runtime — "
        "use decode_payload (deterministic fake) for plumbing tests"
    )


RESIZED_SCHEMA = "doc_id long, width long, height long, n_bytes_out long"


def resize_payload(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """'Resize' stub over mapInPandas: real image resize needs PIL
    (absent here), so the output byte count is a deterministic fake
    (w*h*3); the Arrow batch plumbing and the fixed output geometry
    contract are the real part — a training pipeline's resize stage
    has exactly this shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes_out": width * height * 3,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """'Frame sampling' plan for video-like payloads: emit one row per
    sampled offset — pure JVM sequence/explode; the (stubbed) frame
    decode would map over the offsets."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.length(F.col("payload")) - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_offset"),
    )


FEATURES_SCHEMA = "doc_id long, n_bytes long, " + ", ".join(
    f"h{b} double" for b in range(8)
)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extract stage (decode → FEATURES → downstream ANN):
    a per-payload byte-histogram descriptor — 8 buckets over the byte
    value range, L1-normalized — computed batch-at-a-time in numpy
    over the Arrow stream. This is the stand-in for a real
    CNN/embedding feature step with the identical batch shape and a
    vector-per-payload output; unlike the decode stub it is a real
    computation over the payload BYTES, so it is value-checked
    against a SQL oracle end to end. floor-based 4dp rounding keeps
    the fractions engine-exact (see text.round4).
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            n = np.array([a.size for a in arrs], dtype=np.int64)
            hists = np.stack(
                [np.bincount(a >> 5, minlength=8) for a in arrs]
            ).astype(np.float64)
            frac = hists / np.maximum(n, 1)[:, None]
            out = {"doc_id": pdf["doc_id"], "n_bytes": n}
            for b in range(8):
                out[f"h{b}"] = np.floor(frac[:, b] * 10000 + 0.5) / 10000.0
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def similar_payloads(media: DataFrame, query_doc_id: int = 0, k: int = 10) -> DataFrame:
    """decode → feature-extract → similarity, end to end: brute-force
    cosine top-k over the byte-histogram feature vectors (the same
    TakeOrderedAndProject shape as similarity.cosine_topk). The query
    row broadcasts; ties in the 6dp-rounded cosine break on doc_id so
    the top-k is deterministic in any engine."""
    from .similarity import cosine

    feats = extract_features(media).select(
        "doc_id", F.array(*[F.col(f"h{b}") for b in range(8)]).alias("fv")
    )
    q = feats.filter(F.col("doc_id") == query_doc_id).select(
        F.col("fv").alias("q_fv")
    )
    return (
        feats.filter(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(q))
        .select(
            "doc_id",
            F.round(cosine(F.col("fv"), F.col("q_fv")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(k)
    )


def ahash_payloads(media: DataFrame, bits: int = 32) -> DataFrame:
    """Perceptual average-hash over the payload bytes: stride-sample
    `bits` bytes, threshold each against the sample mean, pack into a
    `bits`-bit signature. The image-near-dup primitive (for real
    images this runs on decoded, downscaled pixels; the byte-domain
    version here has the identical Arrow batch shape and signature
    contract). Integer-only thresholding (bits*sample > sum) keeps
    the signature engine-exact.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8)
                n = max(b.size, 1)
                s = max(1, n // bits)
                samp = b[(np.arange(bits) * s) % n].astype(np.int64)
                total = int(samp.sum())
                h = 0
                for i, v in enumerate(samp):
                    if bits * int(v) > total:
                        h |= 1 << i
                hashes.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ahash": hashes})

    return media.mapInPandas(batches, schema="doc_id long, ahash long")


def ahash_payload_dupes(
    media: DataFrame, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Payload near-duplicate pairs by perceptual hash: 32-bit aHash,
    banded into `bands` 8-bit chunks — a candidate pair must agree
    exactly on at least one band (Hamming ≤ 3 over 32 bits guarantees
    one clean band by pigeonhole, so banding loses nothing) — then
    exact Hamming verify on the XOR popcount.

    Scale shape: the same banded-signature discipline as SimHash/LSH
    text dedup — candidates come from |band-bucket|² joins, never an
    all-pairs product; verify is a pure integer map over candidate
    rows.
    """
    hashed = ahash_payloads(media)
    banded = hashed.select(
        "doc_id",
        "ahash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                "b -> named_struct('b', b, "
                "'v', shiftright(ahash, 8 * b) & 255))"
            )
        ).alias("bd"),
    ).select(
        "doc_id", "ahash", F.col("bd.b").alias("b"), F.col("bd.v").alias("v")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.b") == F.col("r.b"))
            & (F.col("l.v") == F.col("r.v"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.ahash").alias("ha"),
            F.col("r.ahash").alias("hb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# magic-byte prefixes the sniffer recognizes (hex → format label)
MAGIC_FORMATS = [
    ("89504E47", "png"),
    ("FFD8FFE0", "jpeg"),
    ("52494646", "riff"),
]


def attach_mixed_payloads(documents: DataFrame) -> DataFrame:
    """Multimodal ingest fixture: each doc's utf-8 bytes get a
    deterministic magic-byte header (md5(doc_id) mod 4 chooses
    png/jpeg/riff/none) — modeling a mixed-format media column as it
    lands from an object store, before any format metadata exists."""
    h = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 4
    )
    header = F.when(h == 0, F.unhex(F.lit(MAGIC_FORMATS[0][0])))
    for i, (magic, _) in enumerate(MAGIC_FORMATS[1:], start=1):
        header = header.when(h == i, F.unhex(F.lit(magic)))
    header = header.otherwise(F.lit(b""))
    return documents.select(
        "doc_id",
        F.concat(header, F.encode(F.col("text"), "utf-8")).alias("payload"),
    )


def payload_format_audit(documents: DataFrame) -> DataFrame:
    """Magic-byte format sniffing over an untyped binary media column
    — the first pass a 100 TB multimodal ingest runs so later stages
    can route payloads to the right decoder (and quarantine the
    unknowns). Reads ONLY the first 4 bytes per payload (at scale:
    a range-read per object, never the full bytes) and rolls up per
    detected format: count, total/mean payload bytes.

    Pure JVM (substring/hex on binary) — no Python in the scan.
    """
    media = attach_mixed_payloads(documents)
    sig = F.hex(F.substring(F.col("payload"), 1, 4))
    fmt = F.lit("unknown")
    for magic, label in reversed(MAGIC_FORMATS):
        fmt = F.when(sig == magic, label).otherwise(fmt)
    return (
        media.select(
            fmt.alias("format"),
            F.length("payload").cast("long").alias("n_bytes"),
        )
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            (
                F.floor(F.avg("n_bytes") * 100 + 0.5).cast("long") / 100.0
            ).alias("mean_bytes"),
        )
        .orderBy("format")
    )
