"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.  The
image/audio codec libraries are NOT available in this container, so the
decode kernels are STUBBED (deterministic fake features, clearly marked) —
the Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested.

At 100 TB: media rows are far wider than text rows — repartition by size
before a decode stage (``target_rows_per_batch``) so one Arrow batch stays
within executor memory, and keep the decode stage OFF the critical path of
schema validation (validation reads metadata only).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "with_media_meta",
    "decode_image_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("byte_size", T.LongType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("magic", T.StringType()),        # sniffed container
    ]
)

_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi
    "00000018": "mp4",
    "00000020": "mp4",
    "1a45dfa3": "webm",
}


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct from the raw bytes — pure JVM expressions
    (hex-prefix container sniffing, size, content hash)."""
    payload = F.col(payload_col)
    prefix = F.lower(F.hex(F.substring(payload, 1, 4)))
    magic = F.lit(None).cast("string")
    for sig, name in _MAGIC.items():
        magic = F.when(prefix.startswith(sig.lower()), F.lit(name)).otherwise(magic)
    media_type = (
        F.when(magic.isin("png", "jpeg", "gif"), F.lit("image"))
        .when(magic.isin("riff"), F.lit("audio"))
        .when(magic.isin("mp4", "webm"), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )
    meta = F.struct(
        media_type.alias("media_type"),
        F.length(payload).cast("long").alias("byte_size"),
        F.xxhash64(payload).alias("content_hash"),
        magic.alias("magic"),
    )
    return df.withColumn("media_meta", meta)


_IMAGE_FEATURES_SCHEMA = "id bigint, width int, height int, embedding array<float>"


def decode_image_features(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    embedding_dim: int = 8,
    use_stub: bool = True,
) -> DataFrame:
    """Decode images and extract features via Arrow-batched mapInPandas.

    The real kernel would PIL-decode and run a vision encoder; this container
    has neither, so ``use_stub=True`` produces DETERMINISTIC FAKE features
    (hash-derived) with the exact same schema, batch shape, and partition
    behavior. ``use_stub=False`` raises NotImplementedError at the decode
    site, marking where the real kernel plugs in.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision; not available "
                    "in this environment — use use_stub=True"
                )
            ids = pdf[id_col]
            sizes = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
            out = pd.DataFrame(
                {
                    "id": ids,
                    "width": (sizes % 1920).astype("int32"),
                    "height": (sizes % 1080).astype("int32"),
                    "embedding": [
                        [float(((int(s) * (j + 1) * 2654435761) % 1000) / 1000.0)
                         for j in range(embedding_dim)]
                        for s in sizes
                    ],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=_IMAGE_FEATURES_SCHEMA
    )


_FRAME_SCHEMA = "id bigint, frame_idx int, frame_hash bigint"


def sample_video_frames(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    n_frames: int = 4,
    use_stub: bool = True,
) -> DataFrame:
    """Frame sampling stub: one output row per sampled frame per video."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/pyav; not available "
                    "in this environment — use use_stub=True"
                )
            rows = []
            for _, r in pdf.iterrows():
                size = len(r[payload_col]) if r[payload_col] is not None else 0
                for j in range(n_frames):
                    rows.append(
                        {
                            "id": r[id_col],
                            "frame_idx": j,
                            "frame_hash": (size * 1315423911 + j * 2654435761)
                            % (1 << 62),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_hash"])

    return df.select(id_col, payload_col).mapInPandas(batches, schema=_FRAME_SCHEMA)
