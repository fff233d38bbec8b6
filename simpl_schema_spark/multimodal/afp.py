"""Audio fingerprint near-dup — energy-envelope difference hash.

The audio analog of :mod:`.phash`: the same recording re-encoded,
trimmed of silence padding, or gain-adjusted should collide.  The
classic robust-hash family (Haitsma–Kalker / chromaprint lineage)
thresholds energy DIFFERENCES between adjacent analysis windows; this
module implements the 1-band, 64-window member of that family:

- mix to mono, split the signal into 65 equal windows (FIXED count, so
  the hash is sample-rate- and duration-invariant),
- per-window mean absolute energy,
- bit i = ``energy[i+1] > energy[i]`` — invariant to constant gain
  (both sides scale together) and to resampling (envelope shape is
  preserved).

Pipeline shape mirrors phash: one Arrow-batched ``mapInPandas``
decode+hash pass (REAL PCM-WAV decode via the shared stdlib path in
:mod:`.media`; compressed codecs are the documented plug-point), then
pairs via :func:`..dedup.simhash.hamming_near_duplicates` — 64-bit
fingerprints shuffle, never samples.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["audio_fingerprint64", "audio_fingerprint", "audio_near_duplicates"]


def audio_fingerprint64(samples) -> int:
    """64-bit energy-envelope difference hash of a mono sample array
    (any length >= 65; any numeric dtype); MSB = first window pair."""
    import numpy as np

    x = np.abs(np.asarray(samples, dtype=np.float64))
    if x.ndim != 1 or x.size < 65:
        raise ValueError(
            f"need a 1-D array of >= 65 samples, got shape {np.shape(samples)}"
        )
    idx = (np.arange(x.size) * 65) // x.size
    sums = np.zeros(65)
    cnts = np.zeros(65)
    np.add.at(sums, idx, x)
    np.add.at(cnts, idx, 1.0)
    env = sums / np.maximum(cnts, 1.0)
    out = 0
    for i in range(64):
        out = (out << 1) | int(env[i + 1] > env[i])
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    use_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """``(id, afp)`` per audio payload — one Arrow-batched decode+hash
    pass; NULL payloads fingerprint to NULL, sub-65-sample clips too
    short to fingerprint map to NULL as well (not an error);
    ``on_error='skip'`` drops undecodable rows."""
    from .media import _check_on_error, wav_mono_samples

    _check_on_error(on_error)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        skip = on_error == "skip"
        for pdf in it:
            out_ids, fps = [], []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    fp = None
                elif use_stub:
                    import hashlib

                    d = hashlib.md5(b"afp:" + bytes(b)).digest()[:8]
                    fp = int.from_bytes(d, "big", signed=True)
                else:
                    try:
                        _rate, _nch, _n, x = wav_mono_samples(bytes(b))
                        fp = (
                            audio_fingerprint64(x) if x.size >= 65 else None
                        )
                    except Exception:  # noqa: BLE001 — per-row policy
                        if skip:
                            continue
                        raise
                out_ids.append(rid)
                fps.append(fp)
            yield pd.DataFrame(
                {
                    "id": pd.Series(out_ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema="id bigint, afp bigint"
    )


def audio_near_duplicates(
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
    """Near-duplicate audio pairs ``(id_a, id_b, hamming)`` by banded
    fingerprint Hamming search; recall exact for
    ``max_hamming < bands``."""
    from ..dedup.simhash import hamming_near_duplicates

    sigs = audio_fingerprint(
        df,
        id_col=id_col,
        payload_col=payload_col,
        use_stub=use_stub,
        on_error=on_error,
    )
    return hamming_near_duplicates(
        sigs,
        "id",
        "afp",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )
