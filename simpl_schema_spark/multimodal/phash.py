"""Perceptual image near-dup — dHash over decoded luma.

Text dedup misses the multimodal duplication mode: the same image
re-encoded, resized, or re-compressed across mirrors.  The standard
cheap answer is a difference hash (dHash): block-mean the grayscale
image to a ``(rows, cols+1)`` grid and emit one bit per
horizontally-adjacent cell comparison — 64 bits at the default 8x9,
robust to scaling and mild recompression, and Hamming distance ranks
similarity.  (Public algorithm; widely described, e.g. the
"Kind of Like That" dHash write-up and the imagehash library docs.)

Pipeline shape: decode + hash is one Arrow-batched ``mapInPandas`` pass
(numpy block-mean — integral-image row/column sums, no interpolation
dependence on any codec library), then candidate pairs reuse the
package's banded Hamming machinery
(:func:`..dedup.simhash.hamming_near_duplicates`) — fingerprints
shuffle as one long per image, never pixels.

Decode reality in this sandbox (same policy as media.py): pillow when
importable, else the vendored pure-Python PNG codec; non-PNG payloads
without pillow raise at the decode site (``on_error='skip'`` drops
them).  ``use_stub=True`` emits deterministic hash-derived fakes with
the real schema/partition behavior.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .media import pil_available

__all__ = ["dhash64", "image_dhash", "image_near_duplicates"]


def dhash64(gray, grid_rows: int = 8, grid_cols: int = 8) -> int:
    """dHash of a 2-D uint8 luma array: block-mean to
    ``grid_rows x (grid_cols+1)``, one bit per left<right comparison,
    row-major MSB-first.  Pure numpy, deterministic for any input size
    >= the grid."""
    import numpy as np

    a = np.asarray(gray, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 1 or a.shape[1] < 2:
        raise ValueError(f"need a 2-D luma array, got shape {a.shape}")
    h, w = a.shape
    # block-mean via bucketed row/col sums (no interpolation): cell (i,j)
    # averages the pixels whose scaled coordinates land in that cell
    row_idx = (np.arange(h) * grid_rows) // h
    col_idx = (np.arange(w) * (grid_cols + 1)) // w
    sums = np.zeros((grid_rows, grid_cols + 1), dtype=np.float64)
    cnts = np.zeros((grid_rows, grid_cols + 1), dtype=np.float64)
    np.add.at(sums, (row_idx[:, None], col_idx[None, :]), a)
    np.add.at(cnts, (row_idx[:, None], col_idx[None, :]), 1.0)
    grid = sums / np.maximum(cnts, 1.0)
    bits = (grid[:, :-1] < grid[:, 1:]).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # interpret as signed 64-bit so the value fits Spark's bigint
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def _gray_pixels(payload: bytes):
    """2-D uint8 luma array via pillow (any format) or the vendored PNG
    decoder (ITU-R 601-2 luma, matching pillow's convert('L'))."""
    import numpy as np

    if pil_available():
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        img.load()
        return np.asarray(img.convert("L"), dtype=np.uint8)
    from .minipng import PngError

    if not payload.startswith(b"\x89PNG"):
        raise NotImplementedError(
            "real decode of non-PNG payloads requires pillow; not "
            "installed — use use_stub=True or ship PIL to the executors"
        )
    from .minipng import decode_png

    try:
        w, h, rows, nch = decode_png(payload)
    except PngError as e:
        raise NotImplementedError(
            f"vendored PNG decoder cannot handle this payload ({e}); "
            "ship pillow to the executors"
        ) from e
    raw = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w * nch)
    if nch == 1:
        return raw
    if nch == 2:  # gray + alpha
        return raw.reshape(h, w, 2)[:, :, 0]
    px = raw.reshape(h, w, nch)[:, :, :3].astype(np.int64)
    lum = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return lum.astype(np.uint8)


def image_dhash(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """``(id, dhash)`` per image — one Arrow-batched decode+hash pass.

    NULL payloads hash to NULL (kept, like the media decoders' null
    policy); ``on_error='skip'`` drops undecodable rows instead of
    failing the job.
    """
    from .media import _check_on_error

    _check_on_error(on_error)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        skip = on_error == "skip"
        for pdf in it:
            out_ids, hashes = [], []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    h = None
                elif use_stub:
                    # deterministic fake: hash of the payload bytes
                    import hashlib

                    d = hashlib.md5(bytes(b)).digest()[:8]
                    h = int.from_bytes(d, "big", signed=True)
                else:
                    try:
                        h = dhash64(_gray_pixels(bytes(b)))
                    except Exception:  # noqa: BLE001 — per-row policy
                        if skip:
                            continue
                        raise
                out_ids.append(rid)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "id": pd.Series(out_ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema="id bigint, dhash bigint"
    )


def image_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 500,
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a, id_b, hamming)`` by banded
    dHash Hamming search; recall exact for ``max_hamming < bands``."""
    from ..dedup.simhash import hamming_near_duplicates

    sigs = image_dhash(
        df,
        id_col=id_col,
        payload_col=payload_col,
        use_stub=use_stub,
        on_error=on_error,
    )
    return hamming_near_duplicates(
        sigs,
        "id",
        "dhash",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )
