"""Pure-stdlib media codecs for the E5 multimodal path.

Real decoders for the two formats whose specs need nothing beyond the
standard library (VERDICT r4 §Next #1):

- **PNG** (`decode_png`): signature + chunk walk, IHDR parse, IDAT
  concat -> ``zlib`` inflate -> per-scanline UNFILTER (all five filter
  types: None/Sub/Up/Average/Paeth, per the PNG spec §9 'Filtering').
  8-bit greyscale / RGB / grey+alpha / RGBA (color types 0/2/4/6).
- **WAV** (`decode_wav`): RIFF chunk walk, fmt parse (PCM only),
  ``struct``-unpacked 8/16-bit samples with per-file stats.

Matching encoders (``encode_png`` / ``encode_wav``) exist so tests can
fabricate REAL media bytes deterministically — no image/audio library
needed on either side. The encoders are also the fixture generators
for the oracle-checked ``multimodal_media_decode`` query: payload
parameters are closed-form functions of ``doc_id``, so DuckDB can
predict every decoded feature without being able to inflate a PNG.

Scale note: these run inside Arrow-batched ``mapInPandas`` only —
one Python crossing per batch, payloads never shuffled post-decode.
The reference has no media path at all (this is a BASELINE.json
extension); on a cluster with PIL/ffmpeg installed the dispatcher in
``operators.multimodal`` swaps these for the library decoders without
touching the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# --------------------------------------------------------------- PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (PNG spec §9): each scanline is
    1 filter-type byte + width*bpp filtered bytes."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        if len(line) < stride:
            raise ValueError("PNG truncated inside scanline data")
        pos += stride
        base = y * stride
        prior = out[base - stride : base] if y else bytes(stride)
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                out[base + x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + (left + prior[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                upleft = prior[x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + _paeth(left, prior[x], upleft)) & 0xFF
        else:
            raise ValueError(f"PNG unknown filter type {ftype}")
    return out


def decode_png(data: bytes) -> dict:
    """PNG bytes -> dims + per-image pixel stats. Raises ValueError on
    anything that is not a well-formed 8-bit non-interlaced PNG of
    color type 0/2/4/6 — callers dispatch, they don't guess."""
    if data[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + length]
        if len(chunk) < length:
            raise ValueError("PNG truncated inside chunk")
        expect_crc = zlib.crc32(ctype + chunk) & 0xFFFFFFFF
        (got_crc,) = struct.unpack(">I", data[pos + length : pos + length + 4])
        if got_crc != expect_crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        pos += length + 4
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    n = len(pixels)
    total = sum(pixels)
    return {
        "kind": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": 8,
        "n_pixels": width * height,
        "mean_value": total / n if n else 0.0,
        "min_value": min(pixels) if n else 0,
        "max_value": max(pixels) if n else 0,
        "pixels": bytes(pixels),
    }


def _filter_line(ftype: int, line: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply filter ``ftype`` to one raw scanline (encoder side — the
    exact inverse of ``_unfilter``, so round-trip tests exercise both
    directions of every filter)."""
    stride = len(line)
    out = bytearray(stride)
    for x in range(stride):
        left = line[x - bpp] if x >= bpp else 0
        up = prior[x]
        upleft = prior[x - bpp] if x >= bpp else 0
        if ftype == 0:
            out[x] = line[x]
        elif ftype == 1:
            out[x] = (line[x] - left) & 0xFF
        elif ftype == 2:
            out[x] = (line[x] - up) & 0xFF
        elif ftype == 3:
            out[x] = (line[x] - (left + up) // 2) & 0xFF
        elif ftype == 4:
            out[x] = (line[x] - _paeth(left, up, upleft)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Raw 8-bit pixel bytes -> a complete, spec-valid PNG file.
    ``pixels`` is row-major, ``width*height*channels`` bytes.
    ``filter_type`` picks the scanline filter (0-4) so tests can force
    each unfilter branch."""
    channels = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    stride = width * channels
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += _filter_line(filter_type, line, prior, channels)
        prior = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- WAV


def decode_wav(data: bytes) -> dict:
    """RIFF/WAVE bytes -> format + sample stats. PCM (format tag 1)
    with 8- or 16-bit samples; raises ValueError otherwise."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("WAV truncated inside chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, n_channels, sample_rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
            if bits not in (8, 16):
                raise ValueError(f"unsupported WAV bit depth {bits}")
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            frames = body
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    n_channels, sample_rate, bits = fmt
    if bits == 16:
        count = len(frames) // 2
        samples = struct.unpack(f"<{count}h", frames[: count * 2])
    else:  # 8-bit WAV is unsigned, centered at 128
        samples = tuple(b - 128 for b in frames)
    n_samples = len(samples) // n_channels if n_channels else 0
    n = len(samples)
    mean = sum(samples) / n if n else 0.0
    rms = (sum(s * s for s in samples) / n) ** 0.5 if n else 0.0
    return {
        "kind": "wav",
        "channels": n_channels,
        "sample_rate": sample_rate,
        "bit_depth": bits,
        "n_samples": n_samples,
        "duration_sec": n_samples / sample_rate if sample_rate else 0.0,
        "mean_value": mean,
        "rms": rms,
        "min_value": min(samples) if n else 0,
        "max_value": max(samples) if n else 0,
    }


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1, bits: int = 16
) -> bytes:
    """Interleaved integer samples -> a complete PCM WAV file."""
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        frames = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> dict:
    """Uncompressed 24-bit BI_RGB Windows BMP -> dims + pixel stats.
    Rows are stored bottom-up with 4-byte padding; output pixel bytes
    are top-down RGB (converted from the file's BGR)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("BMP truncated before headers")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3  # 4-byte aligned
    pixels = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = data_offset + src_row * row_size
        row = data[base : base + width * 3]
        if len(row) < width * 3:
            raise ValueError("BMP truncated inside pixel data")
        for x in range(width):
            b_, g, r = row[x * 3 : x * 3 + 3]
            pixels[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b_))
    n = len(pixels)
    return {
        "kind": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "bit_depth": 8,
        "n_pixels": width * height,
        "mean_value": sum(pixels) / n if n else 0.0,
        "min_value": min(pixels) if n else 0,
        "max_value": max(pixels) if n else 0,
        "pixels": bytes(pixels),
    }


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Top-down RGB bytes -> a complete 24-bit BI_RGB BMP file
    (bottom-up rows, 4-byte padded, BGR order — the spec layout)."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} pixel bytes, got {len(pixels)}")
    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b_ = pixels[(y * width + x) * 3 : (y * width + x) * 3 + 3]
            body += bytes((b_, g, r))
        body += pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


# --------------------------------------------------------------- sniff


def sniff_mime(data: bytes | None) -> str | None:
    """Magic-byte dispatch; None for anything the codecs can't decode."""
    if not data:
        return None
    if data[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return "image/png"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if len(data) >= 54 and data[:2] == b"BM":
        return "image/bmp"
    return None
