"""Pure-stdlib media codecs for the E5 multimodal path.

Real decoders for the formats whose specs need nothing beyond the
standard library (VERDICT r4 §Next #1; GIF added r6 per r5 §Next #5):

- **PNG** (`decode_png`): signature + chunk walk, IHDR parse, IDAT
  concat -> ``zlib`` inflate -> per-scanline UNFILTER (all five filter
  types: None/Sub/Up/Average/Paeth, per the PNG spec §9 'Filtering').
  8-bit greyscale / RGB / grey+alpha / RGBA (color types 0/2/4/6).
- **WAV** (`decode_wav`): RIFF chunk walk, fmt parse (PCM only),
  ``struct``-unpacked 8/16-bit samples with per-file stats.
- **BMP** (`decode_bmp`): uncompressed 24-bit BI_RGB, bottom-up
  4-byte-padded BGR rows -> top-down RGB.
- **GIF** (`decode_gif`): GIF87a/89a block walk, hand-built LZW with
  variable code width (LSB-first packing, clear/end codes, 12-bit
  ceiling + table-full reset), global/local color table mapping to
  RGB. First frame; extensions skipped.
- **TIFF** (`decode_tiff`): baseline uncompressed, both byte orders,
  IFD walk + strip assembly, 8-bit grey/RGB.

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

# color type -> samples per pixel (8-bit depth only); type 3 is
# palette-indexed: 1 byte/pixel in the filtered stream, 3 (RGB) out
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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
    color type 0/2/3/4/6 — callers dispatch, they don't guess.
    Palette images (type 3) decode through their PLTE chunk to RGB,
    so ``pixels``/stats are always real sample values."""
    if data[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = bit_depth = color_type = None
    palette = None
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
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        n_entries = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            if idx >= n_entries:
                raise ValueError(f"PNG palette index {idx} outside PLTE")
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        pixels = rgb
        channels = 3
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
    palette: bytes | None = None,
) -> bytes:
    """Raw 8-bit pixel bytes -> a complete, spec-valid PNG file.
    ``pixels`` is row-major, ``width*height*channels`` bytes (palette
    INDICES for color type 3, which also requires ``palette`` as RGB
    triples -> a PLTE chunk). ``filter_type`` picks the scanline
    filter (0-4) so tests can force each unfilter branch."""
    channels = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    if (color_type == 3) != (palette is not None):
        raise ValueError("palette is required for (and only for) color type 3")
    if palette is not None and (len(palette) % 3 or not palette):
        raise ValueError("palette must be non-empty RGB triples")
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
    plte = chunk(b"PLTE", palette) if palette is not None else b""
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + plte
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


# --------------------------------------------------------------- GIF

_GIF_MAX_WIDTH = 12  # spec: LZW codes never exceed 12 bits


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW decode (spec appendix F): variable code width
    starting at min_code_size+1, LSB-first bit packing, clear/end
    codes, width bump when the table reaches the current code range,
    12-bit ceiling with append-freeze until the next clear."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no end code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            return out
        if prev is None:  # first code after a clear: literal only
            if code >= clear:
                raise ValueError(f"GIF LZW bad first code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _GIF_MAX_WIDTH):
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < (1 << _GIF_MAX_WIDTH):
                table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < _GIF_MAX_WIDTH:
            width += 1


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy longest-match GIF LZW encoder — exact inverse of
    ``_lzw_decode``. Code width is driven by MIRRORING the decoder's
    table-size bookkeeping (``dec_len``), not the encoder's own dict:
    the decoder appends one entry for every data code after the first
    post-clear one — including the final flush code, for which the
    encoder creates no entry of its own. Driving the bump off the
    encoder dict desynchronizes the two exactly when that flush-side
    append crosses a power of two (caught by the hypothesis round-trip
    property). Emits a clear + full reset when the table fills at
    4096, same as every spec-conforming encoder."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}
    next_code = 0
    width = min_code_size + 1
    dec_len = 0  # decoder-visible table length
    first_after_clear = True

    def reset() -> None:
        nonlocal table, next_code, width, dec_len, first_after_clear
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1
        dec_len = end + 1
        first_after_clear = True

    def emit_data(code: int) -> None:
        """Emit at the decoder's current width, then advance the
        decoder model: it appends one entry per data code after the
        first post-clear one, bumping width when its table reaches
        the width's capacity."""
        nonlocal dec_len, first_after_clear, width
        emit(code, width)
        if first_after_clear:
            first_after_clear = False
            return
        if dec_len < (1 << _GIF_MAX_WIDTH):
            dec_len += 1
            if dec_len == (1 << width) and width < _GIF_MAX_WIDTH:
                width += 1

    reset()
    emit(clear, width)
    buf = b""
    for byte in indices:
        if byte >= clear:
            raise ValueError(f"pixel index {byte} exceeds palette size {clear}")
        nb = buf + bytes([byte])
        if nb in table:
            buf = nb
            continue
        emit_data(table[buf])
        if next_code < (1 << _GIF_MAX_WIDTH):
            table[nb] = next_code
            next_code += 1
        else:  # table full: clear, reset, restart matching
            emit(clear, width)
            reset()
        buf = bytes([byte])
    if buf:
        emit_data(table[buf])
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """GIF87a/89a bytes -> dims + palette-mapped RGB pixel stats
    (first frame; pure-stdlib LZW — VERDICT r5 §Next #5). Extensions
    are skipped; interlaced images and frames without any color table
    raise ValueError — callers dispatch, they don't guess."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    _sw, _sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_table = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_table = data[pos : pos + n]
        if len(global_table) < n:
            raise ValueError("GIF truncated inside global color table")
        pos += n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
        _left, _top, width, height, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        table = global_table
        if ipacked & 0x80:  # local color table takes precedence
            n = 3 * (2 << (ipacked & 0x07))
            table = data[pos : pos + n]
            if len(table) < n:
                raise ValueError("GIF truncated inside local color table")
            pos += n
        if not table:
            raise ValueError("GIF image has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            n = data[pos]
            chunk = data[pos + 1 : pos + 1 + n]
            if len(chunk) < n:
                raise ValueError("GIF truncated inside image sub-block")
            lzw += chunk
            pos += 1 + n
        indices = _lzw_decode(bytes(lzw), min_code_size)
        if len(indices) < width * height:
            raise ValueError(
                f"GIF decoded {len(indices)} indices for {width}x{height}"
            )
        palette_size = len(table) // 3
        pixels = bytearray(width * height * 3)
        for i in range(width * height):
            idx = indices[i]
            if idx >= palette_size:
                raise ValueError(f"GIF pixel index {idx} outside palette")
            pixels[3 * i : 3 * i + 3] = table[3 * idx : 3 * idx + 3]
        n = len(pixels)
        return {
            "kind": "gif",
            "width": width,
            "height": height,
            "channels": 3,
            "bit_depth": 8,
            "palette_size": palette_size,
            "n_pixels": width * height,
            "mean_value": sum(pixels) / n if n else 0.0,
            "min_value": min(pixels) if n else 0,
            "max_value": max(pixels) if n else 0,
            "pixels": bytes(pixels),
        }
    raise ValueError("GIF truncated before image descriptor")


def encode_gif(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """Indexed pixels + RGB palette -> a complete GIF89a file (global
    color table, one non-interlaced image, real LZW). ``palette`` is
    RGB triples; its length is padded up to the next power of two of
    entries as the spec's size field requires."""
    if len(indices) != width * height:
        raise ValueError(f"expected {width * height} indices, got {len(indices)}")
    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty RGB triples")
    n_entries = len(palette) // 3
    size_field = max(1, (n_entries - 1).bit_length())  # 2^size >= entries, >=2
    table = palette + b"\x00" * (3 * ((1 << size_field) - n_entries))
    if max(indices) >= n_entries:
        raise ValueError("pixel index outside palette")
    min_code_size = max(2, size_field)
    lzw = _lzw_encode(indices, min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | ((size_field - 1) & 7), 0, 0)
        + table
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


# --------------------------------------------------------------- sniff


def sniff_mime(data: bytes | None) -> str | None:
    """Magic-byte dispatch; None for anything the codecs can't decode."""
    if not data:
        return None
    if data[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return "image/png"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if len(data) >= 13 and data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if len(data) >= 54 and data[:2] == b"BM":
        return "image/bmp"
    return None


# --------------------------------------------------------------- TIFF

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "samples",
    278: "rows_per_strip", 279: "strip_counts",
}


def decode_tiff(data: bytes) -> dict:
    """Baseline uncompressed TIFF (both byte orders): header + first
    IFD walk, strip assembly, 8-bit greyscale (1 sample) or RGB
    (3 samples). Raises ValueError on compressed/unsupported shapes —
    callers dispatch, they don't guess."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF (bad byte-order mark)")
    bo = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF truncated before IFD")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    fields: dict[str, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("TIFF truncated inside IFD")
        tag, ftype, count = struct.unpack(bo + "HHI", data[base : base + 8])
        if tag not in _TIFF_TAGS or ftype not in type_size:
            continue
        total = type_size[ftype] * count
        if total <= 4:
            raw = data[base + 8 : base + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", data[base + 8 : base + 12])
            raw = data[off : off + total]
            if len(raw) < total:
                raise ValueError("TIFF truncated inside field values")
        fields[_TIFF_TAGS[tag]] = list(
            struct.unpack(bo + type_fmt[ftype] * count, raw)
        )
    for req in ("width", "height", "strip_offsets", "strip_counts"):
        if req not in fields:
            raise ValueError(f"TIFF missing required tag {req}")
    if fields.get("compression", [1])[0] != 1:
        raise ValueError("compressed TIFF unsupported (baseline only)")
    bits = fields.get("bits", [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    channels = fields.get("samples", [len(bits)])[0]
    if channels not in (1, 3):
        raise ValueError(f"unsupported TIFF samples/pixel {channels}")
    width, height = fields["width"][0], fields["height"][0]
    pixels = bytearray()
    for off, cnt in zip(fields["strip_offsets"], fields["strip_counts"]):
        strip = data[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF truncated inside strip data")
        pixels += strip
    need = width * height * channels
    if len(pixels) < need:
        raise ValueError(f"TIFF strips hold {len(pixels)} bytes, need {need}")
    pixels = bytes(pixels[:need])
    n = len(pixels)
    return {
        "kind": "tiff",
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": 8,
        "n_pixels": width * height,
        "mean_value": sum(pixels) / n if n else 0.0,
        "min_value": min(pixels) if n else 0,
        "max_value": max(pixels) if n else 0,
        "pixels": pixels,
    }


def encode_tiff(
    width: int, height: int, pixels: bytes, channels: int = 1,
    byte_order: str = "II",
) -> bytes:
    """8-bit greyscale/RGB pixels -> a minimal single-strip baseline
    TIFF (uncompressed), little- ('II') or big-endian ('MM')."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    bo = "<" if byte_order == "II" else ">"
    entries = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (259, 3, 1, 1),                       # uncompressed
        (262, 3, 1, 1 if channels == 1 else 2),  # BlackIsZero / RGB
        (277, 3, 1, channels),
        (278, 3, 1, height),                   # one strip
        (279, 4, 1, len(pixels)),
    ]
    # BitsPerSample: 1 SHORT inline for grey; 3 SHORTs via offset for RGB
    n_entries = len(entries) + 2  # + BitsPerSample + StripOffsets
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_entries + 4
    if channels == 3:
        bits_val = after_ifd          # offset to the 3 SHORTs
        extra = struct.pack(bo + "HHH", 8, 8, 8)
    else:
        bits_val = 8
        extra = b""
    strip_off = after_ifd + len(extra)
    entries.append((258, 3, channels, bits_val))
    entries.append((273, 4, 1, strip_off))
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", n_entries)
    for tag, ftype, count, val in sorted(entries):
        out += struct.pack(bo + "HHI", tag, ftype, count)
        if ftype == 3 and count == 1:
            # a single SHORT sits left-aligned in the 4-byte value slot
            out += struct.pack(bo + "HH", val, 0)
        else:
            out += struct.pack(bo + "I", val)
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += extra
    out += pixels
    return bytes(out)
