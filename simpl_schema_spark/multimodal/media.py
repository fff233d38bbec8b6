"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
Image decode has a REAL path (pillow when importable, else the vendored
pure-Python PNG decoder in :mod:`.minipng` — exercised in CI); audio has a
REAL path for PCM WAV (stdlib ``wave`` + numpy RMS profile — exercised in
CI); video frame sampling has a REAL path for uncompressed YUV4MPEG2
(from-scratch parser in :mod:`.y4m` — exercised in CI).  Compressed
codecs (jpeg-without-pillow, mp3/flac, mp4/webm) remain STUBBED
(deterministic fake features, clearly marked) since their codec libraries
are absent here.  The Spark-side plumbing (schemas, batch iteration,
partition sizing, UDF signatures) is real and tested in all modes.

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
    "decode_audio_features",
    "sample_video_frames",
    "video_near_duplicates",
    "wav_mono_samples",
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
    "59555634": "y4m",  # "YUV4"MPEG2 — uncompressed video
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
        .when(magic.isin("mp4", "webm", "y4m"), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )
    meta = F.struct(
        media_type.alias("media_type"),
        F.length(payload).cast("long").alias("byte_size"),
        F.xxhash64(payload).alias("content_hash"),
        magic.alias("magic"),
    )
    return df.withColumn("media_meta", meta)


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "skip"):
        raise ValueError(
            f"on_error must be 'raise' or 'skip', got {on_error!r}"
        )


_IMAGE_FEATURES_SCHEMA = "id bigint, width int, height int, embedding array<float>"


def pil_available() -> bool:
    """True when the optional pillow dependency is importable (executors and
    driver must agree — ship it with --py-files / the image in production)."""
    try:
        import importlib.util

        return importlib.util.find_spec("PIL") is not None
    except Exception:  # noqa: BLE001
        return False


def decode_image_features(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    embedding_dim: int = 8,
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Decode images and extract features via Arrow-batched mapInPandas.

    ``use_stub=False`` uses the REAL decode path: pillow when importable
    (any format), else the vendored pure-Python PNG decoder
    (:mod:`.minipng`) for PNG payloads — actual width/height and a coarse
    luminance-histogram embedding (deterministic, no ML deps).  Non-PNG
    payloads without pillow raise NotImplementedError at the decode site,
    marking where a production vision encoder plugs in.  ``use_stub=True``
    produces DETERMINISTIC FAKE features (hash-derived) with the exact same
    schema, batch shape, and partition behavior.

    ``on_error='skip'`` drops undecodable payloads instead of aborting the
    whole job on one corrupt row — the right default posture for a web
    crawl, where a 10^12-row decode stage WILL meet truncated bytes;
    ``'raise'`` (default) keeps the loud fail-fast contract.
    """
    _check_on_error(on_error)

    def _bucketize(hist: list[int]) -> list[float]:
        # coarse luminance histogram, L1-normalized to embedding_dim buckets
        per = 256 // embedding_dim
        buckets = [
            float(sum(hist[j * per:(j + 1) * per])) for j in range(embedding_dim)
        ]
        total = sum(buckets) or 1.0
        return [b / total for b in buckets]

    def _pil_features(payload: bytes) -> tuple[int, int, list[float]]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        img.load()
        gray = img.convert("L")
        return img.width, img.height, _bucketize(gray.histogram())

    def _minipng_features(payload: bytes) -> tuple[int, int, list[float]]:
        from .minipng import PngError, luminance_histogram

        if not payload.startswith(b"\x89PNG"):
            raise NotImplementedError(
                "real decode of non-PNG payloads requires pillow; not "
                "installed — use use_stub=True or ship PIL to the executors"
            )
        try:
            w, h, hist = luminance_histogram(payload)
        except PngError as e:
            raise NotImplementedError(
                f"vendored PNG decoder cannot handle this payload ({e}); "
                "ship pillow to the executors"
            ) from e
        return w, h, _bucketize(hist)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = not use_stub
        decode = _pil_features if pil_available() else _minipng_features
        skip = on_error == "skip"
        for pdf in it:
            ids = pdf[id_col]
            if real:
                out_ids, widths, heights, embs = [], [], [], []
                for rid, b in zip(ids, pdf[payload_col]):
                    if b is None:
                        w, h, e = 0, 0, [0.0] * embedding_dim
                    else:
                        try:
                            w, h, e = decode(bytes(b))
                        except Exception:  # noqa: BLE001 — per-row policy
                            if skip:
                                continue
                            raise
                    out_ids.append(rid)
                    widths.append(w); heights.append(h); embs.append(e)
                out = pd.DataFrame(
                    {"id": pd.Series(out_ids, dtype="int64"),
                     "width": pd.Series(widths, dtype="int32"),
                     "height": pd.Series(heights, dtype="int32"),
                     # dtype=object: an empty/uniform list column would
                     # otherwise arrive at Arrow as a 2-D ndarray it
                     # cannot convert to list<float>
                     "embedding": pd.Series(embs, dtype=object)}
                )
                yield out
                continue
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


_AUDIO_FEATURES_SCHEMA = (
    "id bigint, sample_rate int, n_channels int, duration_sec double, "
    "embedding array<float>"
)


def wav_mono_samples(payload: bytes):
    """Decode a PCM WAV payload to ``(rate, n_channels, n_frames,
    mono_float64_samples)`` via stdlib ``wave`` — the shared real-decode
    path for audio features and fingerprints; raises NotImplementedError
    for non-WAV/compressed payloads (the codec plug-point)."""
    import io
    import wave

    import numpy as np

    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise NotImplementedError(
            "real decode of non-WAV audio requires a codec library "
            "(ffmpeg/soundfile); not installed — use use_stub=True"
        )
    with wave.open(io.BytesIO(payload)) as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(
            f"{8 * width}-bit PCM not supported by the stdlib decode path"
        )
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, nch, n, x


def decode_audio_features(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    embedding_dim: int = 8,
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Decode audio and extract features via Arrow-batched mapInPandas.

    ``use_stub=False`` uses a REAL decode path for PCM WAV payloads
    (stdlib ``wave`` — no codec libraries needed): actual sample rate,
    channel count, duration, and an ``embedding_dim``-segment RMS energy
    profile (L2-normalized, numpy-vectorized over the raw frames).
    Non-WAV / compressed payloads raise NotImplementedError at the decode
    site, marking where a production codec (ffmpeg/soundfile) plugs in.
    ``use_stub=True`` produces DETERMINISTIC FAKE features with the same
    schema and batch shape.  ``on_error='skip'`` drops undecodable
    payloads instead of aborting the job (see
    :func:`decode_image_features`).
    """
    _check_on_error(on_error)

    def _wav_features(payload: bytes) -> tuple[int, int, float, list[float]]:
        import numpy as np

        rate, nch, n, x = wav_mono_samples(payload)
        duration = n / float(rate) if rate else 0.0
        if x.size == 0:
            return rate, nch, duration, [0.0] * embedding_dim
        segs = np.array_split(x, embedding_dim)
        rms = np.array(
            [float(np.sqrt(np.mean(s * s))) if s.size else 0.0 for s in segs]
        )
        norm = float(np.linalg.norm(rms)) or 1.0
        return rate, nch, duration, [float(v / norm) for v in rms]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        skip = on_error == "skip"
        for pdf in it:
            ids = pdf[id_col]
            if not use_stub:
                out_ids, rates, chans, durs, embs = [], [], [], [], []
                for rid, b in zip(ids, pdf[payload_col]):
                    if b is None:
                        r, c, d, e = 0, 0, 0.0, [0.0] * embedding_dim
                    else:
                        try:
                            r, c, d, e = _wav_features(bytes(b))
                        except Exception:  # noqa: BLE001 — per-row policy
                            if skip:
                                continue
                            raise
                    out_ids.append(rid)
                    rates.append(r); chans.append(c); durs.append(d)
                    embs.append(e)
                yield pd.DataFrame(
                    {"id": pd.Series(out_ids, dtype="int64"),
                     "sample_rate": pd.Series(rates, dtype="int32"),
                     "n_channels": pd.Series(chans, dtype="int32"),
                     "duration_sec": pd.Series(durs, dtype="float64"),
                     "embedding": pd.Series(embs, dtype=object)}
                )
                continue
            sizes = pdf[payload_col].map(
                lambda b: len(b) if b is not None else 0
            )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "sample_rate": ((sizes % 3) * 8000 + 16000).astype("int32"),
                    "n_channels": ((sizes % 2) + 1).astype("int32"),
                    "duration_sec": (sizes / 32000.0).astype("float64"),
                    "embedding": [
                        [float(((int(s) * (j + 7) * 2654435761) % 1000) / 1000.0)
                         for j in range(embedding_dim)]
                        for s in sizes
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=_AUDIO_FEATURES_SCHEMA
    )


_FRAME_SCHEMA = (
    "id bigint, frame_idx int, frame_hash bigint, mean_luma double"
)

_FRAME_COLS = ["id", "frame_idx", "frame_hash", "mean_luma"]


def _y4m_frame_rows(rid, payload: bytes, n_frames: int) -> "list[dict]":
    """Real frame sampling for YUV4MPEG2 payloads (see :mod:`.y4m`):
    ≤ ``n_frames`` evenly spaced frames, each with the md5-derived hash
    and mean of its ACTUAL luma plane."""
    import hashlib

    import numpy as np

    from .y4m import Y4mError, frame_offsets, parse_header, y_plane

    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "real frame sampling of compressed containers (mp4/webm) "
            "requires ffmpeg/pyav — not installed; uncompressed "
            "YUV4MPEG2 decodes natively (multimodal/y4m.py)"
        )
    try:
        info = parse_header(payload)
        offs = frame_offsets(payload, info)
    except Y4mError as e:
        raise NotImplementedError(f"malformed y4m payload ({e})") from e
    total = len(offs)
    if total == 0:
        return []
    idxs = sorted({min(total - 1, j * total // n_frames) for j in range(n_frames)})
    rows = []
    for j in idxs:
        y = y_plane(payload, info, offs[j])
        luma = float(np.frombuffer(y, dtype=np.uint8).mean()) if y else 0.0
        h = int.from_bytes(hashlib.md5(y).digest()[:8], "big") >> 2
        rows.append(
            {"id": rid, "frame_idx": j, "frame_hash": h, "mean_luma": luma}
        )
    return rows


def sample_video_frames(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    n_frames: int = 4,
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Sample frames from video payloads: one output row per sampled frame.

    ``use_stub=False`` is a REAL path for uncompressed YUV4MPEG2 payloads
    (from-scratch parser, :mod:`.y4m` — no codec libraries): ≤ ``n_frames``
    evenly spaced frames with the hash and mean of each frame's actual
    luma plane (dedup/filter primitives for video corpora).  Compressed
    containers (mp4/webm) raise NotImplementedError at the decode site —
    the ffmpeg/pyav plug-point.  ``use_stub=True`` emits exactly
    ``n_frames`` DETERMINISTIC FAKE rows per video with the same schema
    and batch shape.  ``on_error='skip'`` emits no frames for
    undecodable payloads instead of aborting the job (see
    :func:`decode_image_features`).
    """
    _check_on_error(on_error)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        skip = on_error == "skip"
        for pdf in it:
            rows = []
            for r in pdf.to_dict("records"):
                if not use_stub:
                    # real path: NULL payload has no frames to sample
                    if r[payload_col] is None:
                        continue
                    try:
                        rows.extend(
                            _y4m_frame_rows(
                                r[id_col], bytes(r[payload_col]), n_frames
                            )
                        )
                    except Exception:  # noqa: BLE001 — per-row policy
                        if not skip:
                            raise
                    continue
                # stub keeps its historical contract: exactly n_frames
                # deterministic rows per video, NULL treated as size 0
                size = len(r[payload_col]) if r[payload_col] is not None else 0
                for j in range(n_frames):
                    rows.append(
                        {
                            "id": r[id_col],
                            "frame_idx": j,
                            "frame_hash": (size * 1315423911 + j * 2654435761)
                            % (1 << 62),
                            "mean_luma": float((size * 31 + j * 17) % 256),
                        }
                    )
            yield pd.DataFrame(rows, columns=_FRAME_COLS)

    return df.select(id_col, payload_col).mapInPandas(batches, schema=_FRAME_SCHEMA)


def video_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    n_frames: int = 8,
    min_shared: int = 2,
    max_bucket_size: int = 500,
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Near-duplicate video pairs by SHARED SAMPLED-FRAME HASHES:
    ``(id_a, id_b, n_shared)`` for pairs sharing at least ``min_shared``
    distinct frame hashes among their ≤ ``n_frames`` sampled frames.

    The video analog of the text shingle overlap: re-containered or
    trimmed copies keep identical luma planes, so their sampled-frame
    hashes collide even when the files differ byte-wise.  Shape: frame
    sampling (:func:`sample_video_frames`, mapInPandas) → hot-hash
    bounded buckets (the package's standard candidate generator — a
    black-frame hash shared by half the corpus is capped out, not
    pair-exploded) → in-bucket pair expansion → one count aggregation.
    Frame HASHES shuffle, never frames.
    """
    from ..dedup.buckets import bounded_buckets

    frames = sample_video_frames(
        df,
        id_col=id_col,
        payload_col=payload_col,
        n_frames=n_frames,
        use_stub=use_stub,
        on_error=on_error,
    ).select("id", "frame_hash").distinct()
    buckets = bounded_buckets(
        frames, ["frame_hash"], F.col("id"),
        max_bucket_size=max_bucket_size,
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda a: F.filter(
                        F.transform(
                            F.col("members"),
                            lambda b: F.when(
                                a < b,
                                F.struct(
                                    a.alias("id_a"), b.alias("id_b")
                                ),
                            ),
                        ),
                        lambda s: s.isNotNull(),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
