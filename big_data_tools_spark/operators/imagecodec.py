"""Pure-stdlib media codecs for the multimodal operators (§2.11).

The container ships no media libraries (PIL/torchaudio/av), but "decode
stubbed" was the one `partial` in the round-2 coverage audit — so this
module implements REAL decoding for the formats the synthetic media
fixtures use, with nothing beyond ``zlib``/``struct``:

- **PNG**: full encode/decode of 8-bit greyscale/RGB/RGBA — zlib
  inflate, scanline unfiltering (all five filter types: None/Sub/Up/
  Average/Paeth), and the matching encoder (filter 0) for fixtures and
  for re-encoding resized output.
- **WAV**: PCM16 RIFF encode/decode (sample rate, duration, samples).
- **MP4**: minimal ISO-BMFF box framing — a writer for ``ftyp`` +
  ``moov/mvhd`` and a parser that walks the box tree to the real
  ``mvhd`` timescale/duration. Frame *extraction* stays stubbed in
  `operators/multimodal.py` (that genuinely needs an H.264 decoder),
  but container metadata is decoded for real.
- **Header sniffing**: width/height from PNG/GIF/BMP/JPEG headers
  without a full pixel decode — the cheap path when only dimensions
  are needed.
- **Nearest-neighbor resize** over decoded pixel buffers.

Everything here runs executor-side inside Arrow ``mapInPandas``
batches (see `operators/multimodal.py`); nothing touches the driver.
When PIL *is* installed the multimodal operators prefer it (more
formats); these functions are the always-available fallback, and the
tests pin them against hand-computed byte layouts.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw 8-bit interleaved pixels (len = w*h*channels) as a
    valid PNG (filter type 0 per scanline)."""
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; expected "
            f"{width}x{height}x{channels}={width * height * channels}"
        )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG -> (width, height, channels,
    raw interleaved pixels). Supports greyscale/grey+alpha/RGB/RGBA and
    all five scanline filter types."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, 0
    height = channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    bpp = channels  # bytes per pixel at 8-bit depth
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        line_start = y * (stride + 1)
        ftype = raw[line_start]
        line = bytearray(raw[line_start + 1 : line_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up_left = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resize of a raw interleaved pixel buffer."""
    out = bytearray(new_width * new_height * channels)
    for ny in range(new_height):
        sy = min(height - 1, ny * height // new_height)
        src_row = sy * width * channels
        dst_row = ny * new_width * channels
        for nx in range(new_width):
            sx = min(width - 1, nx * width // new_width)
            s = src_row + sx * channels
            d = dst_row + nx * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


# --------------------------------------------------------------------- WAV
def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """PCM16 mono RIFF/WAVE encoder (samples are int16 values)."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode PCM16 mono WAV -> (sample_rate, n_samples, samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, 0, []
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            _fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if _fmt != 1 or n_ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body[: len(body) // 2 * 2]))
        pos += 8 + length
    return rate, len(samples), samples


# --------------------------------------------------------------------- MP4
def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def encode_mp4_header(duration_sec: float, timescale: int = 1000) -> bytes:
    """Minimal valid ISO-BMFF container: ``ftyp`` + ``moov/mvhd`` with
    a real timescale/duration. No media tracks — enough for container-
    metadata decoding; frame payloads are out of scope by design."""
    mvhd = struct.pack(
        ">BBBBIIII",
        0, 0, 0, 0,  # version + flags
        0, 0,  # creation/modification time
        timescale,
        int(round(duration_sec * timescale)),
    ) + b"\x00" * 80  # rate/volume/matrix/next_track_id defaults
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _mp4_box(
        b"moov", _mp4_box(b"mvhd", mvhd)
    )


def decode_mp4_duration(data: bytes) -> float:
    """Walk the box tree to ``moov/mvhd`` and return the real duration
    in seconds (version 0 and 1 boxes)."""
    def walk(buf: bytes, want: bytes) -> bytes | None:
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            tag = buf[pos + 4 : pos + 8]
            if size < 8:
                break
            if tag == want:
                return buf[pos + 8 : pos + size]
            pos += size
        return None

    moov = walk(data, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mvhd = walk(moov, b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    version = mvhd[0]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", mvhd[20:32])
    else:
        timescale, duration = struct.unpack(">II", mvhd[12:20])
    return duration / timescale


# ------------------------------------------------------------- dimension sniff
def image_dimensions(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the header alone — PNG, GIF, BMP,
    or baseline/progressive JPEG. None if not a recognized image."""
    if data[:8] == _PNG_SIG and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:2] == b"BM":
        header_size = struct.unpack("<I", data[14:18])[0]
        if header_size >= 40:
            w, h = struct.unpack("<ii", data[18:26])
            return "bmp", w, abs(h)
    if data[:2] == b"\xff\xd8":  # JPEG: scan markers for SOF0/1/2
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return "jpeg", w, h
            pos += 2 + seg_len
    return None
