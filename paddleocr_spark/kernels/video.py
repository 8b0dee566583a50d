"""Pure-NumPy video codec + frame sampling for multimodal columns.

Format: YUV4MPEG2 (``.y4m``) — a real, public, uncompressed video
container (plain-text stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d>
[I<i>] [A<a>] [C<cs>]`` followed by ``FRAME<params>\\n`` + raw planar
pixel data per frame). Chosen because, like the PNG/BMP/PPM image and
PCM WAV audio codecs in this repo, it is fully decodable with NumPy
alone — no external codec library — so the Spark-side plumbing
(binary column → frame sample → per-frame features) is REAL and
value-tested end to end. Compressed containers (mp4/mkv/webm) would
need ffmpeg-class decoders absent from this environment and raise
ValueError, mirroring ``imgcodec.decode_image``'s JPEG/GIF policy.

The reference consumes video only as "GIF → first frame"
(``toddleocr/utils/utility.py:92-104`` check_and_read); frame
sampling generalizes that to the every-k-th/uniform-n policies a
training-data pipeline needs before running the per-frame OCR
pipeline on sampled frames.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_y4m", "encode_y4m", "yuv420_to_rgb",
           "sample_frame_indices", "sniff_y4m"]

_MAGIC = b"YUV4MPEG2"


def sniff_y4m(data: bytes) -> bool:
    return bytes(data[:9]) == _MAGIC


def _parse_header(line: bytes):
    meta = {"cs": "420"}
    for tok in line.split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            meta["w"] = int(val)
        elif tag == b"H":
            meta["h"] = int(val)
        elif tag == b"F":
            n, d = val.split(b":")
            meta["fps"] = (int(n), int(d))
        elif tag == b"C":
            meta["cs"] = val.decode("ascii")
    if "w" not in meta or "h" not in meta:
        raise ValueError("y4m: missing W/H in stream header")
    return meta


def _frame_size(w: int, h: int, cs: str) -> tuple[int, tuple]:
    if cs.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2)), ("420",)
    if cs.startswith("444"):
        return 3 * w * h, ("444",)
    if cs.startswith("mono"):
        return w * h, ("mono",)
    raise ValueError(f"y4m: unsupported colourspace C{cs}")


def decode_y4m(data: bytes):
    """bytes → (frames, meta). ``frames`` is a list of dicts with
    planar uint8 arrays: Y (h, w) and, unless mono, U/V subsampled per
    the colourspace. ``meta`` = {w, h, fps, cs, n_frames}."""
    data = bytes(data)
    if not sniff_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    meta = _parse_header(data[:nl])
    w, h, cs = meta["w"], meta["h"], meta["cs"]
    fsize, _ = _frame_size(w, h, cs)
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"y4m: bad FRAME marker at byte {pos}")
        fnl = data.index(b"\n", pos)
        pos = fnl + 1
        raw = np.frombuffer(data[pos:pos + fsize], dtype=np.uint8)
        if raw.size != fsize:
            raise ValueError("y4m: truncated frame")
        pos += fsize
        # .copy() per plane: frombuffer views are read-only (in-place
        # ops like `fr['y'] -= 16` would raise) and each view pins the
        # WHOLE input buffer — a sampler keeping 3 frames of a
        # 1000-frame clip would hold the full clip's bytes alive
        if cs.startswith("mono"):
            frames.append({"y": raw.reshape(h, w).copy()})
        elif cs.startswith("444"):
            y, u, v = np.split(raw, 3)
            frames.append({"y": y.reshape(h, w).copy(),
                           "u": u.reshape(h, w).copy(),
                           "v": v.reshape(h, w).copy()})
        else:  # 420
            y = raw[:w * h].reshape(h, w)
            c = raw[w * h:].reshape(2, h // 2, w // 2)
            frames.append({"y": y.copy(), "u": c[0].copy(),
                           "v": c[1].copy()})
    meta["n_frames"] = len(frames)
    return frames, meta


def encode_y4m(frames, fps=(25, 1), cs: str = "420") -> bytes:
    """Inverse of decode_y4m (tests + fixture synthesis)."""
    h, w = frames[0]["y"].shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
    out = [head.encode("ascii")]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f["y"], dtype=np.uint8).tobytes())
        if not cs.startswith("mono"):
            out.append(np.ascontiguousarray(f["u"], dtype=np.uint8)
                       .tobytes())
            out.append(np.ascontiguousarray(f["v"], dtype=np.uint8)
                       .tobytes())
    return b"".join(out)


def yuv420_to_rgb(frame: dict) -> np.ndarray:
    """BT.601 full-range YUV → RGB uint8 (H, W, 3); 420 chroma
    upsampled by nearest-neighbour (the deterministic choice — no
    interpolation ambiguity across engines). 444 frames (chroma
    already full-size) pass through without the 2x repeat — repeating
    a full-size plane would stretch its top-left quadrant over the
    image and silently wreck the colors of any non-constant frame."""
    y = frame["y"].astype(np.float64)
    u, v = frame["u"], frame["v"]
    if u.shape != y.shape:
        u = u.repeat(2, axis=0).repeat(2, axis=1)
        v = v.repeat(2, axis=0).repeat(2, axis=1)
        # odd luma dims: floor-divided chroma upsamples one short —
        # edge-replicate the last row/column (nearest-neighbour,
        # consistent with the upsampling policy)
        pads = ((0, max(0, y.shape[0] - u.shape[0])),
                (0, max(0, y.shape[1] - u.shape[1])))
        if pads != ((0, 0), (0, 0)):
            u = np.pad(u, pads, mode="edge")
            v = np.pad(v, pads, mode="edge")
    u = u[:y.shape[0], :y.shape[1]].astype(np.float64) - 128.0
    v = v[:y.shape[0], :y.shape[1]].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def sample_frame_indices(n_frames: int, n_samples: int) -> list[int]:
    """Uniform temporal sampling: n_samples indices at the centers of
    equal spans (the standard clip-sampling policy; deterministic,
    duplicate-free for n_samples <= n_frames)."""
    if n_frames <= 0 or n_samples <= 0:
        return []
    n_samples = min(n_samples, n_frames)
    edges = np.linspace(0, n_frames, n_samples + 1)
    return [int((a + b) // 2) for a, b in zip(edges[:-1], edges[1:])]
