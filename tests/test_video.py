"""MJPEG-AVI muxer (utils/video.py): container structure + payloads."""

import io
import os
import struct

import numpy as np
from PIL import Image

from nerf_tpu.utils.video import mux_frame_dir


def test_mjpeg_avi_structure(tmp_path):
    d = str(tmp_path)
    for i in range(5):
        img = (np.random.rand(32, 48, 3) * 255).astype("uint8")
        Image.fromarray(img).save(os.path.join(d, f"frame_{i:03d}.png"))
    out = mux_frame_dir(d, os.path.join(d, "v.avi"), framerate=24)
    data = open(out, "rb").read()

    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data[:300] and b"idx1" in data

    # Every movi chunk must be a decodable JPEG at the frame size.
    i = data.find(b"movi") + 4
    n = 0
    while data[i:i + 4] == b"00dc":
        sz = struct.unpack("<I", data[i + 4:i + 8])[0]
        im = Image.open(io.BytesIO(data[i + 8:i + 8 + sz]))
        im.load()
        assert im.size == (48, 32)
        i += 8 + sz + (sz % 2)
        n += 1
    assert n == 5

    # strh must be the exact 56-byte AVISTREAMHEADER: demuxers read
    # dwScale/dwRate for timestamps and treat nonzero dwSampleSize as
    # fixed-sample-size (broken duration), so assert the layout.
    j = data.find(b"strh")
    strh_len = struct.unpack("<I", data[j + 4:j + 8])[0]
    assert strh_len == 56
    body = data[j + 8:j + 8 + strh_len]
    assert body[:4] == b"vids" and body[4:8] == b"MJPG"
    (flags, prio, lang, init_frames, scale, rate, start, length,
     bufsize, quality, sample_size) = struct.unpack("<I2H8I", body[8:48])
    left, top, right, bottom = struct.unpack("<4h", body[48:56])
    assert (scale, rate) == (1, 24)
    assert start == 0 and length == 5
    assert sample_size == 0
    assert (left, top, right, bottom) == (0, 0, 48, 32)
