"""Real WAV codec: round trip, stdlib-wave cross-validation, features."""

from __future__ import annotations

import io
import math
import wave as stdlib_wave

import numpy as np
import pytest

from aiotcvectordb_spark.operators import audiocodec as A


def test_roundtrip_exact():
    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype="<i2")
    payload = A.encode_wav(samples, 8000)
    got, rate = A.decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_stdlib_wave_reads_our_files():
    samples = A.text_to_samples("hello spark audio", n=None)
    payload = A.encode_wav(samples, 8000)
    with stdlib_wave.open(io.BytesIO(payload)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == samples.size
        raw = w.readframes(w.getnframes())
    assert np.array_equal(np.frombuffer(raw, dtype="<i2"), samples)


def test_we_read_stdlib_wave_files_with_extra_layout():
    buf = io.BytesIO()
    samples = np.arange(-50, 50, dtype="<i2")
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    got, rate = A.decode_wav(buf.getvalue())
    assert rate == 16000
    assert np.array_equal(got, samples)


def test_stereo_downmix_and_rejects():
    # stereo: interleave L=100, R=300 -> mono mean 200
    inter = np.empty(8, dtype="<i2")
    inter[0::2] = 100
    inter[1::2] = 300
    hdr = A.encode_wav(inter, 8000)
    # patch channels=2 in the fmt chunk (offset 22) and byte rate fields
    b = bytearray(hdr)
    b[22:24] = (2).to_bytes(2, "little")
    got, _ = A.decode_wav(bytes(b))
    assert np.array_equal(got, np.full(4, 200, dtype="<i2"))

    with pytest.raises(ValueError):
        A.decode_wav(b"not a wav at all....")
    with pytest.raises(ValueError):
        A.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_features_match_hand_computation():
    text = "abc xyz"
    samples = A.text_to_samples(text, n=None)
    f = A.wav_features(A.encode_wav(samples, 8000))
    x = samples.astype(np.float64) / 32768.0
    assert f["n_samples"] == len(text.encode())
    assert f["duration_ms"] == (len(text.encode()) * 1000) // 8000
    assert math.isclose(f["rms"], float(np.sqrt((x * x).mean())), rel_tol=1e-12)
    assert 0.0 <= f["zcr"] <= 1.0
    assert math.isclose(f["peak"], float(np.abs(x).max()), rel_tol=1e-12)


def test_spark_audio_pipeline(spark, sf_dir):
    from aiotcvectordb_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    wav = MM.with_wav_payload(docs, n_samples=None)
    feats = MM.audio_features(wav).collect()
    n_chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    assert len(feats) == len(n_chars)
    for r in feats:
        assert r.sample_rate == 8000
        assert r.n_samples == n_chars[r.doc_id]
        assert 0.0 <= r.rms <= 1.0
