"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contracts here are REAL and tested: schemas, batch
iteration, partition sizing, error isolation. The codec step itself is
stubbed — this container has no image/audio libraries — behind
``DECODERS``; production swaps in Pillow/torchaudio/PyAV without
touching the plumbing. A deterministic fake decoder ships for tests.

Why mapInPandas (not a row UDF, not mapPartitions-over-Rows): media
bytes move driver→executor→Python as Arrow buffers with zero copies per
batch, the pandas iterator lets one output row expand to many (frame
sampling), and batch size is tunable via
spark.sql.execution.arrow.maxRecordsPerBatch to keep executor memory
bounded when payloads are megabytes each.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("media_format", StringType(), True),  # png | wav | mp4 ...
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("payload_sha256", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("feature_mean", DoubleType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo
    width/height/duration/feature from the payload digest. Replace with
    Pillow/torchaudio/PyAV in production (see DECODERS)."""
    if payload is None:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    w = 16 + digest[0] % 240
    h = 16 + digest[1] % 240
    return {
        "width": int(w) if modality == "image" else None,
        "height": int(h) if modality == "image" else None,
        "duration_s": round(digest[2] / 8.0, 3) if modality in ("audio", "video") else None,
        "feature_mean": round(sum(digest[:16]) / 16.0 / 255.0, 6),
    }


def real_decode(payload: bytes, modality: str) -> dict:  # pragma: no cover
    """Production codec hook — not available in this container."""
    raise NotImplementedError(
        "media codecs (Pillow/torchaudio/PyAV) are not installed; "
        "register a decoder in DECODERS"
    )


DECODERS: dict[str, Callable[[bytes, str], dict]] = {
    "fake": fake_decode,
    "real": real_decode,
}


def extract_features(assets: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract each asset via Arrow-batched mapInPandas.

    Per-asset decode failures are ISOLATED into ``decode_error`` rows —
    one corrupt file must never kill a 100 TB job.
    """
    from .relational import spread_compute

    decode = DECODERS[decoder]
    # decode is CPU-bound, not IO-bound: repartition first so a
    # single-file input doesn't serialize every decode on one task
    assets = spread_compute(assets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {
                    "asset_id": row.asset_id,
                    "modality": row.modality,
                    "n_bytes": len(row.payload) if row.payload is not None else 0,
                    "payload_sha256": hashlib.sha256(row.payload).hexdigest()
                    if row.payload is not None
                    else None,
                    "width": None,
                    "height": None,
                    "duration_s": None,
                    "feature_mean": None,
                    "decode_error": None,
                }
                try:
                    rec.update(decode(row.payload, row.modality))
                except Exception as exc:  # noqa: BLE001 — isolate per asset
                    rec["decode_error"] = repr(exc)
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    cols = ["asset_id", "modality", "payload"]
    return assets.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n: int = 2, max_frames: int = 4, decoder: str = "fake"
) -> DataFrame:
    """Frame sampling: each video row EXPANDS to multiple frame rows —
    the one-to-many shape mapInPandas exists for. Frame payloads are
    deterministic digests under the fake decoder."""
    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_index", IntegerType(), False),
            StructField("frame_sha256", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.modality != "video" or row.payload is None:
                    continue
                for i in range(0, max_frames * every_n, every_n):
                    # frame-index suffix is an ASCII tag (not raw int
                    # bytes): NUL bytes are illegal in DuckDB VARCHARs,
                    # and the ASCII form keeps frame hashes SQL-replayable
                    frame = hashlib.sha256(
                        row.payload + f":frame:{i}".encode()
                    ).hexdigest()
                    rows.append(
                        {"asset_id": row.asset_id, "frame_index": i, "frame_sha256": frame}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=schema
    )


def synthesize_assets(spark, documents: DataFrame, modality_cycle=("image", "audio", "video")) -> DataFrame:
    """Build a synthetic asset table from the documents fixture: text
    bytes become the opaque payload. Exercises the real binary-column
    path (Arrow binary transfer, batch shapes) without media libs."""
    n_mod = len(modality_cycle)
    modality = F.element_at(
        F.array(*[F.lit(m) for m in modality_cycle]),
        (F.col("doc_id") % n_mod + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.lit("synthetic").alias("media_format"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        # octet_length: byte size of the UTF-8 payload, matching
        # len(payload) downstream — F.length counts CHARACTERS and
        # disagrees for any non-ASCII text
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


#: number of pseudo-pixels in the perceptual-hash grid. 63 (not 64) so
#: the packed hash Σ bit_i << i stays inside a signed BIGINT in both
#: engines without touching the sign bit.
PHASH_PIXELS = 63


def perceptual_hashes(assets: DataFrame, decoder: str = "fake") -> DataFrame:
    """Perceptual (average-hash) fingerprints for image assets: decode
    to a small grayscale grid, threshold each pixel against the grid
    mean, pack the bits into one BIGINT. Visually-identical images
    produce identical hashes and small corruptions flip few bits, so
    Hamming distance ranks near-duplicates — the image-side analogue of
    SimHash for text.

    Under the stub decoder the "grid" is the deterministic sha256 chain
    of the payload (digest + sha256(digest), first 63 bytes) — exactly
    replayable in SQL, so the full mapInPandas path stays oracle-
    gated; production swaps a real thumbnail via DECODERS without
    touching the packing or pairing. The mean comparison is the exact
    integer cross-multiplication p_i * 63 > sum(p) (no float mean, no
    boundary disagreement).

    Output: (asset_id, phash bigint) for image-modality assets.
    """
    if decoder not in DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "real":  # pragma: no cover - production hook
        raise NotImplementedError("real thumbnail decode not available here")

    from .relational import spread_compute

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("phash", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.modality != "image" or row.payload is None:
                    continue
                d1 = hashlib.sha256(row.payload).digest()
                # second block chains on the lowercase HEX of d1 (not
                # raw bytes): DuckDB's sha256 only accepts VARCHAR, so
                # hex-chaining is the form both engines can compute
                d2 = hashlib.sha256(d1.hex().encode()).digest()
                grid = (d1 + d2)[:PHASH_PIXELS]
                total = sum(grid)
                h = 0
                for i, p in enumerate(grid):
                    if p * PHASH_PIXELS > total:
                        h |= 1 << i
                rows.append({"asset_id": row.asset_id, "phash": h})
            yield pd.DataFrame(rows, columns=["asset_id", "phash"])

    return (
        spread_compute(assets)
        .select("asset_id", "modality", "payload")
        .mapInPandas(run, schema=schema)
    )


def phash_near_dup_pairs(
    assets: DataFrame,
    decoder: str = "fake",
    max_hamming: int = 6,
    n_bands: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-dup pairs: perceptual hashes + the generic Hamming
    band-pairing shared with SimHash (``dedup.fingerprint_band_pairs``)
    — 63 bits in 7 nine-bit bands, so pigeonhole guarantees every pair
    within hamming <= 6 shares a band. ``max_bucket`` is the usual
    star-pairing cap for duplicate-heavy image corpora."""
    from .dedup import fingerprint_band_pairs

    fp = perceptual_hashes(assets, decoder)
    return fingerprint_band_pairs(
        fp,
        fp_col="phash",
        id_col="asset_id",
        bits=PHASH_PIXELS,
        max_hamming=max_hamming,
        n_bands=n_bands,
        max_bucket=max_bucket,
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
        StructField("thumb_sha256", StringType(), True),
        StructField("n_out_bytes", LongType(), True),
        StructField("resize_error", StringType(), True),
    ]
)


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real thumbnailer: the resized
    payload is the sha256 digest of (payload || ':resize:WxH') — 32
    opaque bytes whose hex DuckDB can replay byte-for-byte. Replace
    with a Pillow `Image.resize` in production (RESIZERS hook)."""
    if payload is None:
        raise ValueError("empty payload")
    return hashlib.sha256(payload + f":resize:{w}x{h}".encode()).digest()


def real_resize(payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover
    """Production thumbnailer hook — not available in this container."""
    raise NotImplementedError(
        "image libs (Pillow) are not installed; register a resizer in "
        "RESIZERS"
    )


RESIZERS: dict[str, Callable[[bytes, int, int], bytes]] = {
    "fake": fake_resize,
    "real": real_resize,
}


def resize_assets(
    assets: DataFrame, w: int = 64, h: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Resize/thumbnail every image asset via Arrow-batched mapInPandas
    — the third leg of the multimodal battery next to decode
    (:func:`extract_features`) and frame sampling (:func:`sample_frames`).

    Non-image modalities are tagged ``unsupported modality`` and null
    payloads ``empty payload`` — per-asset isolation, same contract as
    the decoder: one corrupt or mistyped asset never kills the job. The
    resized payload is carried as its sha256 hex (the fake resizer's
    32-byte stub; production registers a real thumbnailer in RESIZERS
    and the column becomes the actual thumbnail digest)."""
    from .relational import spread_compute

    resize = RESIZERS[decoder]
    assets = spread_compute(assets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rec = {
                    "asset_id": row.asset_id,
                    "modality": row.modality,
                    "out_w": None,
                    "out_h": None,
                    "thumb_sha256": None,
                    "n_out_bytes": None,
                    "resize_error": None,
                }
                if row.modality != "image":
                    rec["resize_error"] = (
                        f"unsupported modality: {row.modality}"
                    )
                else:
                    try:
                        thumb = resize(row.payload, w, h)
                        rec.update(
                            out_w=w,
                            out_h=h,
                            thumb_sha256=thumb.hex(),
                            n_out_bytes=len(thumb),
                        )
                    except Exception as exc:  # noqa: BLE001 — isolate
                        rec["resize_error"] = repr(exc)
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )
