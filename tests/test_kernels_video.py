"""Y4M video codec + frame sampling (kernels/video.py): round-trip,
colourspaces, RGB conversion, sampling policy, malformed inputs."""

import numpy as np
import pytest

from paddleocr_spark.kernels.video import (
    decode_y4m,
    encode_y4m,
    sample_frame_indices,
    sniff_y4m,
    yuv420_to_rgb,
)


def _frames_420(n, h=8, w=12, seed=0):
    rng = np.random.default_rng(seed)
    return [{"y": rng.integers(0, 256, (h, w), dtype=np.uint8),
             "u": rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
             "v": rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)}
            for _ in range(n)]


def test_y4m_roundtrip_420():
    frames = _frames_420(5)
    data = encode_y4m(frames, fps=(30, 1))
    assert sniff_y4m(data)
    got, meta = decode_y4m(data)
    assert meta["w"] == 12 and meta["h"] == 8
    assert meta["fps"] == (30, 1) and meta["n_frames"] == 5
    for a, b in zip(frames, got):
        for k in ("y", "u", "v"):
            assert (a[k] == b[k]).all()


def test_y4m_roundtrip_mono_and_444():
    rng = np.random.default_rng(1)
    mono = [{"y": rng.integers(0, 256, (4, 6), dtype=np.uint8)}]
    got, meta = decode_y4m(encode_y4m(mono, cs="mono"))
    assert meta["cs"] == "mono" and (got[0]["y"] == mono[0]["y"]).all()
    f444 = [{k: rng.integers(0, 256, (4, 6), dtype=np.uint8)
             for k in ("y", "u", "v")}]
    got, meta = decode_y4m(encode_y4m(f444, cs="444"))
    assert meta["cs"] == "444" and (got[0]["v"] == f444[0]["v"]).all()


def test_yuv420_to_rgb_neutral_chroma_is_gray():
    y = np.full((4, 4), 77, np.uint8)
    f = {"y": y, "u": np.full((2, 2), 128, np.uint8),
         "v": np.full((2, 2), 128, np.uint8)}
    rgb = yuv420_to_rgb(f)
    assert rgb.shape == (4, 4, 3)
    assert (rgb == 77).all()  # U=V=128 → R=G=B=Y


def test_sample_frame_indices_uniform():
    assert sample_frame_indices(10, 2) == [2, 7]
    assert sample_frame_indices(5, 5) == [0, 1, 2, 3, 4]
    assert sample_frame_indices(3, 10) == [0, 1, 2]  # capped, no dups
    assert sample_frame_indices(0, 3) == []
    idx = sample_frame_indices(100, 7)
    assert idx == sorted(set(idx)) and all(0 <= i < 100 for i in idx)


def test_malformed_streams_raise():
    with pytest.raises(ValueError):
        decode_y4m(b"NOTAVIDEO")
    good = encode_y4m(_frames_420(2))
    with pytest.raises(ValueError):
        decode_y4m(good[:-5])  # truncated frame
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 F25:1\nFRAME\n")  # missing H
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 C422\n")  # unsupported cs


def test_video_frame_feature_stage(spark):
    """Spark plumbing: binary y4m column → mapInPandas frame-sample →
    per-sampled-frame mean luma rows (1 video → k frame rows, the
    UDTF shape of the page-explode stage)."""
    import pandas as pd

    vids = [(f"v{i}", encode_y4m(_frames_420(6, seed=i))) for i in range(3)]
    df = spark.createDataFrame(vids, "ref string, content binary")

    def feats(batches):
        from paddleocr_spark.kernels.video import (
            decode_y4m as _dec,
            sample_frame_indices as _sfi,
        )

        for pdf in batches:
            out = {"ref": [], "frame_idx": [], "mean_luma": []}
            for ref, content in zip(pdf["ref"], pdf["content"]):
                frames, meta = _dec(bytes(content))
                for fi in _sfi(meta["n_frames"], 2):
                    out["ref"].append(ref)
                    out["frame_idx"].append(fi)
                    out["mean_luma"].append(
                        float(frames[fi]["y"].mean()))
            yield pd.DataFrame(out)

    rows = (df.mapInPandas(
        feats, schema="ref string, frame_idx int, mean_luma double")
        .collect())
    assert len(rows) == 6  # 3 videos x 2 sampled frames
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["ref"], []).append(r["frame_idx"])
    assert all(sorted(v) == [1, 4] for v in by_ref.values())
    # value check against the sequential path
    f0, _ = decode_y4m(vids[0][1])
    want = float(f0[1]["y"].mean())
    got = [r["mean_luma"] for r in rows
           if r["ref"] == "v0" and r["frame_idx"] == 1][0]
    assert got == want


def test_yuv444_chroma_passes_through_full_size():
    """A non-constant 444 frame must use its full-resolution chroma —
    the 420 upsampler would stretch the top-left quadrant."""
    import numpy as np

    from paddleocr_spark.kernels.video import yuv420_to_rgb

    h = w = 4
    y = np.full((h, w), 128, dtype=np.uint8)
    u = np.full((h, w), 128, dtype=np.uint8)
    v = np.full((h, w), 128, dtype=np.uint8)
    v[3, 3] = 255  # red only in the bottom-right pixel
    rgb = yuv420_to_rgb({"y": y, "u": u, "v": v})
    assert rgb[3, 3, 0] > 200          # the red pixel is red
    assert rgb[0, 0, 0] == 128         # the rest untouched
    assert (rgb[:3, :3] == 128).all()  # no quadrant stretching


def test_odd_dimension_420_frame_converts():
    """decode_y4m accepts odd dims (floor-divided chroma); the RGB
    conversion must edge-pad instead of crashing on the broadcast."""
    import numpy as np

    from paddleocr_spark.kernels.video import yuv420_to_rgb

    y = np.full((5, 5), 100, dtype=np.uint8)
    u = np.full((2, 2), 128, dtype=np.uint8)
    v = np.full((2, 2), 200, dtype=np.uint8)
    rgb = yuv420_to_rgb({"y": y, "u": u, "v": v})
    assert rgb.shape == (5, 5, 3)
    # edge replication: last row/col carry the nearest chroma
    assert (rgb[4, 4] == rgb[3, 3]).all()


def test_decoded_planes_are_writable_and_unpinned():
    """Planes must be owned copies: read-only frombuffer views break
    in-place ops and pin the whole clip's bytes while one sampled
    frame is retained."""
    from paddleocr_spark.kernels.video import decode_y4m, encode_y4m

    rng = np.random.default_rng(91)
    frames = [{"y": rng.integers(0, 256, (16, 16), dtype=np.uint8),
               "u": rng.integers(0, 256, (8, 8), dtype=np.uint8),
               "v": rng.integers(0, 256, (8, 8), dtype=np.uint8)}
              for _ in range(4)]
    dec, _ = decode_y4m(encode_y4m(frames))
    for fr in dec:
        for plane in fr.values():
            assert plane.flags.writeable
            assert plane.base is None  # owns its data, no buffer pin
    dec[0]["y"] -= 16  # in-place op must not raise
