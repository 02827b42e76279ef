"""Multimodal columns — SURVEY.md §2.3 E5.

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` operators.
The decode step itself is STUBBED (no image/audio libs in this
container — see ``DeterministicFakeDecoder``); everything around it —
schema, batch iteration, partitioning, UDF signatures — is the real
100 TB plumbing:

- media rows are large → ``spark.sql.files.maxPartitionBytes`` and a
  repartition on ingest keep a batch's decoded payloads within
  executor memory;
- decode/feature-extract is per-row independent → mapInPandas, no
  shuffle, and the iterator contract means only one Arrow batch of
  decoded frames is alive at a time;
- downstream joins (features ⋈ documents/embeddings) are ordinary
  equi-joins on the id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<double>"


class DeterministicFakeDecoder:
    """Stand-in for PIL/libav decode: derives a fixed-length feature
    from the payload bytes, deterministically. Swap for a real decoder
    (``PIL.Image.open(io.BytesIO(b))`` …) when the libs exist."""

    DIM = 8

    @staticmethod
    def decode(payload: bytes | None) -> list[float]:
        if payload is None:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/av — not in this container"
            )
        # deterministic byte-histogram-ish feature
        acc = [0.0] * DeterministicFakeDecoder.DIM
        for i, b in enumerate(payload):
            acc[i % DeterministicFakeDecoder.DIM] += float(b)
        n = max(len(payload), 1)
        return [a / n for a in acc]


def synth_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    utf-8 bytes of the text (stands in for encoded pixels). Gives the
    plumbing real, content-dependent bytes to chew on."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.col("doc_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + feature-extract every media row via mapInPandas.

    The Arrow batch iterator is the memory-safety contract: at most one
    batch of decoded payloads lives per task. At 100 TB you also
    repartition upstream so each task's input stays ~128 MB of payload.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [DeterministicFakeDecoder.decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize over binary payloads (mapInPandas; the pixel
    resample itself is the stubbed step — a real deployment swaps in
    PIL's ``Image.resize``). The deterministic fake emits a payload of
    exactly width*height bytes derived from the source bytes, so batch
    shapes, output sizes and metadata rewriting are all real and
    testable."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                if p is None:
                    raise NotImplementedError("real decode requires PIL — not in container")
                src = bytes(p)
                # deterministic fake resample: stride-sample / tile source bytes
                outs.append(bytes(src[(i * max(len(src), 1)) // n_out % len(src)] for i in range(n_out)) if src else b"\x00" * n_out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": outs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(
        _resize,
        schema="media_id long, kind string, payload binary, width int, height int",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.
    Offsets come from the typed metadata (duration), the frame decode
    is the stubbed step. Pure DataFrame explode — the expensive decode
    only runs on the sampled offsets, not the full stream."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ms"),
    )


def join_modalities(documents: DataFrame, embeddings: DataFrame, features: DataFrame | None = None) -> DataFrame:
    """E5 — one row per document with text + embedding (+ media
    features): plain equi-joins on the shared id. documents/embeddings
    are co-keyed (doc_id == vec_id) in the fixtures."""
    out = documents.join(
        embeddings.withColumnRenamed("vec_id", "doc_id"), "doc_id", "inner"
    )
    if features is not None:
        out = out.join(features.withColumnRenamed("media_id", "doc_id"), "doc_id", "left")
    return out
