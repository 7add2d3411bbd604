"""Pure-stdlib media codec tests (operators/imagecodec.py): PNG
encode/decode pinned byte-for-byte against hand-built streams for all
five scanline filter types, WAV and MP4 round-trips, header sniffing,
and nearest-neighbor resize."""

from __future__ import annotations

import struct
import zlib

import pytest

from big_data_tools_spark.operators.imagecodec import (
    decode_mp4_duration,
    decode_png,
    decode_wav,
    encode_mp4_header,
    encode_png,
    encode_wav,
    image_dimensions,
    resize_nearest,
)

W, H = 5, 4
PIXELS = bytes(
    (x * 37 + y * 11 + c * 3) % 256 for y in range(H) for x in range(W) for c in range(3)
)


def test_png_rgb_roundtrip():
    assert decode_png(encode_png(W, H, PIXELS, 3)) == (W, H, 3, PIXELS)


def test_png_greyscale_and_rgba_roundtrip():
    grey = bytes((x * 7 + y) % 256 for y in range(3) for x in range(6))
    assert decode_png(encode_png(6, 3, grey, 1)) == (6, 3, 1, grey)
    rgba = bytes(range(2 * 2 * 4))
    assert decode_png(encode_png(2, 2, rgba, 4)) == (2, 2, 4, rgba)


def _hand_encode(ftype: int) -> bytes:
    """Build a PNG whose every scanline uses filter ``ftype``, applying
    the filter transform by hand — decode must invert it exactly."""
    stride = W * 3
    raw, prev = b"", bytearray(stride)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for y in range(H):
        line = PIXELS[y * stride : (y + 1) * stride]
        enc = bytearray(line)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (enc[i] - enc[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                enc[i] = (enc[i] - paeth(left, prev[i], ul)) & 0xFF
        raw += bytes([ftype]) + bytes(enc)
        prev = bytearray(line)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_all_types(ftype):
    assert decode_png(_hand_encode(ftype))[3] == PIXELS


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_resize_nearest_exact():
    # 2x2 -> 4x4 nearest neighbor: each source pixel becomes a 2x2 block
    src = bytes([10, 20, 30, 40])  # greyscale 2x2
    out = resize_nearest(src, 2, 2, 1, 4, 4)
    assert out == bytes([10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40])


def test_wav_roundtrip():
    samples = [0, 1000, -1000, 32767, -32768]
    assert decode_wav(encode_wav(samples, 8000)) == (8000, 5, samples)


def test_mp4_duration_roundtrip():
    assert decode_mp4_duration(encode_mp4_header(12.5)) == pytest.approx(12.5)
    with pytest.raises(ValueError):
        decode_mp4_duration(b"\x00" * 32)


def test_image_dimensions_sniffers():
    assert image_dimensions(encode_png(W, H, PIXELS, 3)) == ("png", W, H)
    gif = b"GIF89a" + struct.pack("<HH", 100, 60) + b"\x00" * 10
    assert image_dimensions(gif) == ("gif", 100, 60)
    bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 7, -9) + b"\x00" * 20
    assert image_dimensions(bmp) == ("bmp", 7, 9)
    jpeg = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 33, 44) + b"\x00" * 6
    assert image_dimensions(jpeg) == ("jpeg", 44, 33)
    assert image_dimensions(b"plain text") is None


def test_mp4_video_roundtrip_real_sample_table():
    """encode_mp4_video/decode_mp4_video: genuine stts/stsz/mdat boxes
    round-trip every frame payload and timestamp, and the mvhd
    duration equals n_frames/fps for the legacy duration reader."""
    from big_data_tools_spark.operators.imagecodec import (
        decode_mp4_duration,
        decode_mp4_video,
        decode_png,
        encode_mp4_video,
        encode_png,
    )

    frames = [
        encode_png(2, 2, bytes((i * 31 + k) % 256 for k in range(12)), channels=3)
        for i in range(5)
    ]
    data = encode_mp4_video(frames, fps=2.0)
    assert decode_mp4_duration(data) == 2.5  # 5 frames at 2 fps
    samples = decode_mp4_video(data)
    assert [t for t, _ in samples] == [0.0, 0.5, 1.0, 1.5, 2.0]
    for i, (_, payload) in enumerate(samples):
        assert payload == frames[i]
        w, h, ch, px = decode_png(payload)
        assert (w, h, ch) == (2, 2, 3)
        assert px == bytes((i * 31 + k) % 256 for k in range(12))


def test_mp4_video_decode_rejects_metadata_only():
    import pytest

    from big_data_tools_spark.operators.imagecodec import (
        decode_mp4_video,
        encode_mp4_header,
    )

    with pytest.raises(ValueError, match="sample table"):
        decode_mp4_video(encode_mp4_header(4.0))


def test_video_dispatch_stdlib_fallback():
    """decode_video_samples must agree byte-for-byte with the stdlib
    sample-table path whenever PyAV is not installed (or cannot parse
    the PNG-in-BMFF fixture layout, which carries no ffmpeg codec)."""
    from big_data_tools_spark.operators.imagecodec import (
        decode_mp4_video,
        decode_video_samples,
        encode_mp4_video,
        encode_png,
        video_backend,
    )

    assert video_backend() in ("av", "stdlib")
    frames = [
        encode_png(2, 2, bytes((i * 31 + k) % 256 for k in range(12)), 3)
        for i in range(4)
    ]
    data = encode_mp4_video(frames, fps=2.0)
    assert decode_video_samples(data) == decode_mp4_video(data)


def test_video_dispatch_av_real_codec():
    """Pin the PyAV branch against a real H.264 stream when the lib is
    present (environment-gated: skipped in containers without av)."""
    import pytest

    av = pytest.importorskip("av")
    import io

    import numpy as np

    from big_data_tools_spark.operators.imagecodec import (
        decode_png,
        decode_video_samples,
        video_backend,
    )

    assert video_backend() == "av"
    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("h264", rate=2)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for i in range(4):
            arr = np.full((16, 16, 3), i * 60, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    samples = decode_video_samples(buf.getvalue())
    assert len(samples) == 4
    for i, (_, payload) in enumerate(samples):
        w, h, ch, px = decode_png(payload)
        assert (w, h, ch) == (16, 16, 3)
        # yuv420p round-trip is lossy; pin the mean within a tolerance
        mean = sum(px) / len(px)
        assert abs(mean - i * 60) < 12
