"""Audio operators: fake-codec decode, features, fingerprint near-dup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.audio import (
    _fake_pcm,
    _fingerprint,
    audio_features,
    near_duplicate_audio,
    synthetic_audio,
)


@pytest.fixture(scope="module")
def audio(spark):
    df = synthetic_audio(spark, 80).cache()
    df.count()
    return df


def test_stub_decoder_raises(spark, audio):
    with pytest.raises(Exception, match="NotImplementedError|audio decoding"):
        audio_features(audio, decoder="stub").collect()


def test_features_shape_and_determinism(spark, audio):
    feats = audio_features(audio)
    rows = feats.collect()
    assert len(rows) == 80
    for r in rows[:5]:
        assert r["n_samples"] > 0
        assert 0.0 < r["rms"] < 1.0
        assert 0.0 < r["zero_cross_rate"] < 1.0
    # determinism at a different parallelism (partitioning-independence)
    again = {
        (r["media_id"], r["afp"])
        for r in audio_features(audio.repartition(7)).collect()
    }
    assert again == {(r["media_id"], r["afp"]) for r in rows}


def test_planted_duplicates_found(spark, audio):
    """Every 10th+1 clip shares payload with its predecessor → hamming 0
    pair must be recovered by the banded join."""
    pairs = near_duplicate_audio(audio_features(audio), max_hamming=0).collect()
    got = {(r["id1"], r["id2"]) for r in pairs}
    want = {(f"a{i:06d}", f"a{i + 1:06d}") for i in range(0, 80, 10)}
    assert want <= got
    # and nothing with hamming > 0 sneaks in at max_hamming=0
    assert all(r["hamming"] == 0 for r in pairs)


def test_fingerprint_is_63_bit(spark):
    fp = _fingerprint(_fake_pcm(b"some payload"))
    assert 0 <= fp < (1 << 63)


def test_near_dup_band_blocking_not_all_pairs(spark, audio):
    """The join must be band-bucketed: candidate pairs evaluated are far
    fewer than n^2/2 (random fingerprints rarely share a 16-bit band)."""
    feats = audio_features(audio).cache()
    banded_plan = near_duplicate_audio(feats)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in banded_plan
    assert "BroadcastNestedLoopJoin" not in banded_plan


def test_real_audio_codec_guard():
    """soundfile absent (this container): decoder='real' raises a loud
    NotImplementedError; where present, it decodes a real WAV through
    the same fingerprint path."""
    import pytest as _pytest

    from dedupe_spark.operators.audio import _decode_pcm

    try:
        import soundfile  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError, match="soundfile"):
            _decode_pcm(b"not-audio", "real")
        return
    import io as _io

    import numpy as _np
    import soundfile as sf

    buf = _io.BytesIO()
    sf.write(buf, _np.sin(_np.linspace(0, 100, 4608)), 16000, format="WAV")
    pcm = _decode_pcm(buf.getvalue(), "real")
    assert pcm.ndim == 1 and len(pcm) == 4608
