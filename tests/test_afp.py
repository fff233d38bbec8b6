"""Audio fingerprint near-dup (multimodal/afp.py)."""

import io
import math
import wave

import numpy as np
import pytest

from simpl_schema_spark.multimodal.afp import (
    audio_fingerprint,
    audio_fingerprint64,
    audio_near_duplicates,
)


def _wav(samples: np.ndarray, rate=16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                int(v).to_bytes(2, "little", signed=True)
                for v in samples.astype(np.int64)
            )
        )
    return buf.getvalue()


def _melody(n=16000, seed=3):
    rng = np.random.RandomState(seed)
    env = np.repeat(rng.uniform(0.1, 1.0, 80), n // 80 + 1)[:n]
    t = np.arange(n)
    return (12000 * env * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)


class TestFingerprint64:
    def test_gain_invariance(self):
        x = _melody()
        assert audio_fingerprint64(x) == audio_fingerprint64(x * 0.25)

    def test_resample_invariance(self):
        x = _melody()
        assert (
            bin(
                (audio_fingerprint64(x) ^ audio_fingerprint64(np.repeat(x, 2)))
                & ((1 << 64) - 1)
            ).count("1")
            <= 4
        )

    def test_distinct_signals_differ(self):
        h1 = audio_fingerprint64(_melody(seed=3))
        h2 = audio_fingerprint64(_melody(seed=4))
        assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") > 10

    def test_rejects_short_input(self):
        with pytest.raises(ValueError):
            audio_fingerprint64(np.zeros(10))


class TestAudioFingerprintSpark:
    def test_real_decode_matches_direct(self, spark):
        x = _melody()
        df = spark.createDataFrame(
            [(1, bytearray(_wav(x))), (2, None)], "id long, payload binary"
        )
        rows = {
            r.id: r.afp
            for r in audio_fingerprint(df, use_stub=False).collect()
        }
        assert rows[1] == audio_fingerprint64(x)
        assert rows[2] is None

    def test_skip_policy(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(_wav(_melody()))), (2, bytearray(b"RIFFnope"))],
            "id long, payload binary",
        )
        ids = {
            r.id
            for r in audio_fingerprint(
                df, use_stub=False, on_error="skip"
            ).collect()
        }
        assert ids == {1}

    def test_near_duplicates_end_to_end(self, spark):
        x = _melody()
        quieter = (x * 0.5).astype(np.int64)  # same content, lower gain
        other = _melody(seed=9)
        df = spark.createDataFrame(
            [
                (1, bytearray(_wav(x))),
                (2, bytearray(_wav(quieter))),
                (3, bytearray(_wav(other))),
            ],
            "id long, payload binary",
        )
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in audio_near_duplicates(
                df, use_stub=False, max_hamming=6
            ).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 2
        assert (1, 3) not in pairs and (2, 3) not in pairs
