"""WAV codec + audio feature kernels, incl. the Spark multimodal
plumbing (binary column → decode → framed features in one Arrow
stage)."""

import numpy as np
import pytest

from paddleocr_spark.kernels.audio import decode_wav, encode_wav, rms_frames


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 8000, endpoint=False)
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (8000, 1)
    assert np.allclose(s[:, 0], mono, atol=1.0 / 32767)
    stereo = np.stack([mono, -mono], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, 8000))
    assert s2.shape == (8000, 2)
    assert np.allclose(s2, stereo, atol=1.0 / 32767)


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(np.zeros(100), 8000))
    data[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"ID3\x03mp3-ish")


def test_rms_frames_analytic():
    # constant amplitude a -> every frame RMS == a
    x = np.full(1000, 0.25)
    f = rms_frames(x, frame=100, hop=50)
    assert len(f) == 1 + (1000 - 100) // 50
    assert np.allclose(f, 0.25)
    # full-scale sine RMS = 1/sqrt(2) over whole periods
    t = np.arange(8000)
    sine = np.sin(2 * np.pi * 100 * t / 8000)  # 80-sample period
    f2 = rms_frames(sine, frame=400, hop=400)
    assert np.allclose(f2, 1 / np.sqrt(2), atol=1e-3)
    assert len(rms_frames(np.zeros(10), frame=100)) == 0


def test_spark_audio_feature_stage(spark, tmp_path):
    """Multimodal plumbing: WAV bytes in a binary column → decode +
    framed RMS features through one mapInPandas stage."""
    rng = np.random.default_rng(9)
    rows = []
    for i, amp in enumerate([0.1, 0.4, 0.8]):
        sig = amp * np.sin(2 * np.pi * 200 *
                           np.arange(4000) / 16000)
        rows.append((f"a{i}", encode_wav(sig, 16000)))
    df = spark.createDataFrame(rows, "asset_id string, payload binary")

    def feats(batches):
        import pandas as pd

        from paddleocr_spark.kernels.audio import decode_wav, rms_frames

        for pdf in batches:
            out = {"asset_id": [], "n_frames": [], "mean_rms": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(payload))
                f = rms_frames(s[:, 0], frame=400, hop=160)
                out["asset_id"].append(aid)
                out["n_frames"].append(len(f))
                out["mean_rms"].append(float(f.mean()))
            yield pd.DataFrame(out)

    got = {r.asset_id: r for r in df.mapInPandas(
        feats, schema="asset_id string, n_frames int, mean_rms double"
    ).collect()}
    assert got["a0"].n_frames == 1 + (4000 - 400) // 160
    # RMS ordering tracks amplitude
    assert got["a0"].mean_rms < got["a1"].mean_rms < got["a2"].mean_rms
    assert abs(got["a2"].mean_rms - 0.8 / np.sqrt(2)) < 5e-3


def test_zero_channels_raises_value_error():
    import struct

    import pytest

    from paddleocr_spark.kernels.audio import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    data = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="channels"):
        decode_wav(data)


def test_truncated_data_chunk_raises():
    """A chunk whose declared size exceeds the remaining bytes is a
    truncated upload — must raise (quarantine-able), never silently
    return fewer samples."""
    import pytest

    from paddleocr_spark.kernels.audio import decode_wav, encode_wav

    wav = encode_wav(np.linspace(-0.5, 0.5, 400), rate=8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-100])
