"""L-tier multimodal columns (L4): opaque binary payloads + typed metadata,
with decode / feature-extract as Arrow-batched mapInPandas stages.
SURVEY.md §2.12.

Modeling: a multimodal column is `payload: binary` + a metadata struct
(mime, n_bytes, content hash) — the blob carrier pattern (§1.2: CQL blob →
BinaryType). The documents fixture stands in: payload = utf-8 bytes of
text. The Spark-side plumbing (schema, partition-preserving mapInPandas,
Arrow batch shape) is real and tested; the actual image/audio decode is
STUBBED deterministically because no media libraries exist in this
container (decode_image raises NotImplementedError unless the caller opts
into the fake decoder).

Scale posture: payload bytes never shuffle through an aggregate — metadata
projects out first; mapInPandas streams Arrow batches so one partition
never materializes as a whole in Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query


@query(
    "l4_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha,
           md5(text) AS content_md5,
           octet_length(encode(text)) > 0 AS is_valid
    FROM documents
    """,
)
def l4_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata projection: size / content hashes / validity of
    the binary payload. These are the dedup + integrity signals computed
    WITHOUT decoding — the cheap pass that runs over all 100 TB."""
    cat = Catalog(spark, sf_dir)
    payload = F.col("text").cast("binary")
    return cat.documents.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
        F.md5(payload).alias("content_md5"),
        (F.octet_length(payload) > 0).alias("is_valid"),
    )


# --- decode plumbing (mapInPandas) ----------------------------------------

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, "
    "width int, height int, n_channels int, feat array<float>"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, channels, 4-dim feature) from the payload bytes alone.
    Replace with PIL/torchvision in a real deployment."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    checksum = sum(payload[:256]) % 997
    feat = [float(n % 251), float(checksum), float(width), float(height)]
    return width, height, 3, feat


def decode_batch(
    pdfs: Iterator[pd.DataFrame], *, allow_stub: bool
) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: each incoming batch of (doc_id, payload) rows
    yields a batch of decoded metadata + features. Real decoders slot in
    here unchanged — the batch shape is the contract."""
    for pdf in pdfs:
        if not allow_stub:
            raise NotImplementedError(
                "no media codec libraries in this environment; "
                "pass allow_stub=True for the deterministic fake decoder"
            )
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, c, feat = _fake_decode(bytes(payload))
            rows.append((doc_id, "image/fake", len(payload), w, h, c, feat))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "mime",
                "n_bytes",
                "width",
                "height",
                "n_channels",
                "feat",
            ],
        )


def decode_documents(
    docs: DataFrame, *, allow_stub: bool = False, n_partitions: int | None = None
) -> DataFrame:
    """The decode pipeline: project (key, payload) → repartition for even
    decode parallelism (payloads can be skewed in size) → mapInPandas.
    Returns the decoded-feature DataFrame with a stable schema."""
    src = docs.select(
        F.col("doc_id"), F.col("text").cast("binary").alias("payload")
    )
    if n_partitions:
        src = src.repartition(n_partitions, "doc_id")
    return src.mapInPandas(
        lambda it: decode_batch(it, allow_stub=allow_stub), DECODED_SCHEMA
    )


# --- resize (decoded image → target box) -----------------------------------

RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "out_width int, out_height int, scale double"
)


def resize_decoded(
    decoded: DataFrame, max_side: int = 32, *, allow_stub: bool = False
) -> DataFrame:
    """Resize stage: aspect-preserving fit into a max_side box. The stub
    computes only the output geometry (a real resampler slots into the same
    batch loop); geometry math is the tested contract — it decides bytes
    shuffled downstream, which at 100 TB matters more than the pixels."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not allow_stub:
                raise NotImplementedError(
                    "no image libraries in this environment; "
                    "pass allow_stub=True for the geometry-only resizer"
                )
            scale = (
                pd.concat(
                    [max_side / pdf["width"], max_side / pdf["height"]], axis=1
                )
                .min(axis=1)
                .clip(upper=1.0)
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    # round, don't truncate: width*(max/width) in floats can
                    # land at 31.999…, and the long side must hit the box
                    "out_width": (pdf["width"] * scale)
                    .round()
                    .astype(int)
                    .clip(lower=1),
                    "out_height": (pdf["height"] * scale)
                    .round()
                    .astype(int)
                    .clip(lower=1),
                    "scale": scale,
                }
            )
            yield out

    return decoded.select("doc_id", "width", "height").mapInPandas(
        run, RESIZED_SCHEMA
    )


# --- frame sampling (video payload → frame rows) ---------------------------

FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms bigint, frame_sha string"


def sample_frames(
    docs: DataFrame,
    every_ms: int = 1000,
    *,
    allow_stub: bool = False,
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame — the
    row-expanding (UDTF-shaped) mapInPandas. The stub derives a fake
    duration from payload size (1 KB ≈ 1 s) and hashes the payload slice
    each frame would decode from; a real demuxer (pyav/ffmpeg) keeps the
    same contract: iterate batches, emit (key, frame_idx, ts, content)."""
    import hashlib

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not allow_stub:
                raise NotImplementedError(
                    "no video demuxer in this environment; "
                    "pass allow_stub=True for the deterministic fake sampler"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                duration_ms = len(payload)  # 1 byte ≈ 1 ms in the stub
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    chunk = payload[ts : ts + every_ms]
                    rows.append(
                        (
                            doc_id,
                            i,
                            ts,
                            hashlib.sha1(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    src = docs.select(
        F.col("doc_id"), F.col("text").cast("binary").alias("payload")
    )
    return src.mapInPandas(run, FRAMES_SCHEMA)
