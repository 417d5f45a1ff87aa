"""Minimal dependency-free video muxing: MJPEG-in-AVI.

The reference muxes orbit frames with ffmpeg into H.264 mp4 (reference:
run.py:1536-1559); this image has no ffmpeg and no codec libraries. An AVI
container of JPEG frames (fourcc 'MJPG') needs only a JPEG encoder (PIL,
already a dependency) plus ~100 lines of RIFF bookkeeping, and plays in
every mainstream player. `train.common.make_video` uses this as the
fallback when ffmpeg is missing, so the video deliverable always exists.

AVI-RIFF layout written here (OpenDML not needed below 1 GB):
  RIFF('AVI ')
    LIST('hdrl') { avih, LIST('strl'){ strh('vids','MJPG'), strf(BMIH) } }
    LIST('movi') { '00dc' <jpeg> ... }
    idx1 { entries }
"""

from __future__ import annotations

import io
import os
import struct
from typing import List


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    data = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        data += b"\x00"
    return data


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_mjpeg_avi(frame_paths: List[str], out_path: str,
                    framerate: int = 24, quality: int = 92) -> str:
    """Mux image files into an MJPEG AVI. Returns `out_path`.

    Frames are JPEG-encoded via PIL at `quality`; all frames are resized
    to the first frame's size if they differ (they should not).
    """
    from PIL import Image

    if not frame_paths:
        raise ValueError("no frames to mux")

    jpegs = []
    size = None
    for p in frame_paths:
        im = Image.open(p).convert("RGB")
        if size is None:
            size = im.size
        elif im.size != size:
            im = im.resize(size)
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())
    w, h = size
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    # 56-byte main AVI header (avih).
    avih = struct.pack(
        "<14I",
        1_000_000 // framerate,      # dwMicroSecPerFrame
        max_bytes * framerate,       # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        0x10 | 0x100,                # AVIF_HASINDEX | AVIF_ISINTERLEAVED
        n, 0,                        # dwTotalFrames, dwInitialFrames
        1,                           # dwStreams
        max_bytes,                   # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)

    # 56-byte stream header (strh) for a video stream: fccType/fccHandler
    # then dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate
    # (frame time = scale/rate = 1/framerate), dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality (-1 = default), dwSampleSize (0 =
    # variable-size samples, required for VBR video), rcFrame as 4 int16.
    strh = (b"vids" + b"MJPG"
            + struct.pack("<I2H8I4h", 0, 0, 0, 0, 1, framerate, 0, n,
                          max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h))
    # BITMAPINFOHEADER (strf).
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_payload = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_payload)

    idx = b""
    for off, j in zip(offsets, jpegs):
        # offset is relative to the start of the 'movi' fourcc.
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
    idx1 = _chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(out_path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload))
                + riff_payload)
    return out_path


def mux_frame_dir(picture_dir: str, out_path: str,
                  framerate: int = 24) -> str:
    """Mux every frame_%03d.png (sorted) in `picture_dir` into an AVI."""
    frames = sorted(
        os.path.join(picture_dir, f) for f in os.listdir(picture_dir)
        if f.startswith("frame_") and f.endswith(".png"))
    return write_mjpeg_avi(frames, out_path, framerate)
