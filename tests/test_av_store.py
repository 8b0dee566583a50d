"""Audio/video multimodal CORRECTNESS fixtures: the WAV/Y4M store's
decoded features must match the ANALYTIC spec (constant-signal
formulas), and the DuckDB VALUES oracle must agree — codec-independent
both ways. Spark legs run the real binaryFile -> mapInPandas path.
Reference analogue: opaque-bytes media handling of
toddleocr/engine.py:214-216, generalized to the audio/video columns a
training-data pipeline needs."""

import os

import duckdb
import numpy as np
import pytest

from paddleocr_spark.kernels.audio import decode_wav, rms_frames
from paddleocr_spark.kernels.video import (
    decode_y4m,
    sample_frame_indices,
)
from paddleocr_spark.sources.av_store import (
    _FRAME,
    _VIDS,
    AUDIO_SPEC,
    VIDEO_SPEC,
    audio_features,
    audio_oracle_sql,
    ensure_av_store,
    video_frames,
    video_oracle_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return ensure_av_store(str(tmp_path_factory.mktemp("av")))


def test_wav_rms_matches_analytic_spec(store):
    got = []
    adir = os.path.join(store, "audio")
    for name in sorted(os.listdir(adir)):
        with open(os.path.join(adir, name), "rb") as fh:
            samples, rate = decode_wav(fh.read())
        for k, e in enumerate(rms_frames(samples.mean(axis=1),
                                         _FRAME, _FRAME)):
            got.append((name, k, float(e), rate, samples.shape[1]))
    # bit-exact equality, not approx: the store is built so every RMS
    # is an exactly-representable double (see av_store docstring)
    assert sorted(got) == sorted(AUDIO_SPEC)


def test_y4m_sampled_frames_match_analytic_spec(store):
    got = []
    vdir = os.path.join(store, "video")
    k_by_file = {name: k for name, _, _, _, _, k in _VIDS}
    for name in sorted(os.listdir(vdir)):
        with open(os.path.join(vdir, name), "rb") as fh:
            frames, meta = decode_y4m(fh.read())
        for i in sample_frame_indices(meta["n_frames"], k_by_file[name]):
            fr = frames[i]
            if "u" in fr:
                from paddleocr_spark.kernels.video import yuv420_to_rgb

                rgb = yuv420_to_rgb(fr)
                r, g, b = (int(rgb[0, 0, c]) for c in range(3))
                # constant planes -> constant RGB image
                assert (rgb == rgb[0, 0]).all()
            else:
                r = g = b = int(fr["y"][0, 0])
            got.append((name, i, meta["n_frames"], meta["h"], meta["w"],
                        float(fr["y"].mean()), r, g, b))
    assert sorted(got) == sorted(VIDEO_SPEC)


def test_oracle_values_match_spec():
    assert sorted(duckdb.sql(audio_oracle_sql()).fetchall()) == \
        sorted(AUDIO_SPEC)
    assert sorted(duckdb.sql(video_oracle_sql()).fetchall()) == \
        sorted(VIDEO_SPEC)


def test_specs_are_not_degenerate():
    # guard against the fixtures collapsing into all-zero / single-value
    # expectations (which would make the hash check vacuous)
    assert len({r[2] for r in AUDIO_SPEC}) >= 10
    assert len({(r[6], r[7], r[8]) for r in VIDEO_SPEC}) >= 5
    # every decoded RMS is exactly representable: reconstructible from
    # its dyadic numerator/denominator
    for _, _, rms, _, _ in AUDIO_SPEC:
        assert rms == float(np.float64(rms))


def test_spark_legs_match_oracles(spark):
    for q, osql in ((audio_features, audio_oracle_sql()),
                    (video_frames, video_oracle_sql())):
        sdf = q(spark, SF).toPandas().sort_values(["file", "frame"])
        odf = duckdb.sql(osql).df().sort_values(["file", "frame"])
        assert list(sdf.columns) == list(odf.columns)
        for col in sdf.columns:
            assert sdf[col].tolist() == odf[col].tolist(), col
