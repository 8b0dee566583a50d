"""Audio decode + feature extraction — the audio leg of the multimodal
column support (opaque binary + typed metadata; north-rule
training-data-pipeline operators).

- ``decode_wav``: real RIFF/WAVE parser for PCM 8/16-bit mono/stereo
  (pure NumPy; no external codec). Compressed formats (mp3/ogg/aac)
  need external codecs absent from this environment and raise
  ValueError, exactly like JPEG in ``imgcodec``.
- ``encode_wav``: writer for round-trip tests and fixture synthesis.
- ``rms_frames``: framed root-mean-square energy (frame/hop in
  samples) — the standard first feature of any audio pipeline, used
  by the Spark-side feature-extract UDF.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "rms_frames"]


def decode_wav(data: bytes):
    """WAV bytes → (samples (N, C) float32 in [-1, 1], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            # a truncated upload would otherwise silently return
            # fewer samples (and wrong downstream frame counts) —
            # raise so the decode-stage quarantine can catch it
            raise ValueError(
                f"wav: chunk {cid!r} declares {size} bytes but only "
                f"{len(body)} remain (truncated file)")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM supported (format {audio_format}; "
                         "compressed audio needs external codecs)")
    if channels < 1:
        raise ValueError("wav: fmt chunk declares 0 channels")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(raw, dtype=np.uint8)
                   .astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(samples) // channels
    return samples[:n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(N,) or (N, C) float in [-1, 1] → 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    raw = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def rms_frames(signal: np.ndarray, frame: int = 400, hop: int = 160):
    """Mono signal (N,) → per-frame RMS energies (F,) float64; frames
    are [k*hop, k*hop+frame), last partial frame dropped."""
    x = np.asarray(signal, dtype=np.float64)
    if len(x) < frame:
        return np.zeros(0)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    return np.sqrt((x[idx] ** 2).mean(axis=1))
