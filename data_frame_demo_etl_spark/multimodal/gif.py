"""Real GIF89a codec — stdlib-only, completing the image codec set
(BMP, PPM, PNG incl. Adam7, baseline+progressive JPEG) with the one
classic format built on a DICTIONARY coder: variable-width LZW with
in-band code-size growth, CLEAR/EOI control codes and the KwKwK
self-referential case — a genuinely different decoder family from
the filter/DCT codecs already in the tree.

Scope (documented): 8-bit indexed images, global or local color
table, optional interlace (the 4-pass row shuffle), first image
descriptor of the stream (animation frames beyond the first are
ignored — frame iteration belongs to the VID0-style container path),
extensions skipped per spec. The ENCODER emits real compressed LZW
(dictionary up to 4096 codes with CLEAR on overflow), not the
literal-only degenerate stream — decoder and encoder round-trip each
other and any external GIF within scope.

No reference analog (/root/reference has no codecs); brief-mandated
multimodal surface (SURVEY §2.14).
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")

#: Interlace pass layout: (first row, step) per GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ───────────────────── LZW bit plumbing ─────────────────────


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR first, grows the code width at
    2^n boundaries, resets the dictionary at 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    bw.write(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        table[cand] = next_code
        next_code += 1
        # GIF width growth: the ENCODER bumps width when the next code
        # to be ASSIGNED would not fit (decoder mirrors this).
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            bw.write(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        bw.write(table[run], width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Variable-width LZW decode incl. the KwKwK case; stops after
    ``n_expected`` indices or EOI, whichever first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = br.read(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_expected])


# ───────────────────── container ─────────────────────


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes | None] = [None] * height
    i = 0
    for first, step in _INTERLACE_PASSES:
        for y in range(first, height, step):
            out[y] = rows[i]
            i += 1
    return [r for r in out if r is not None]


def _interlace(rows: list[bytes], height: int) -> list[bytes]:
    out = []
    for first, step in _INTERLACE_PASSES:
        for y in range(first, height, step):
            out.append(rows[y])
    return out


def encode_gif(
    width: int, height: int, indices: bytes, interlace: bool = False
) -> bytes:
    """8-bit indexed GIF89a with the identity GRAYSCALE global color
    table (palette[i] = (i,i,i)) — each index decodes to its own gray
    level, so pixel checksums are palette-free."""
    if len(indices) != width * height:
        raise ValueError("encode_gif: indices must be exactly w*h bytes")
    out = bytearray(b"GIF89a")
    # logical screen: w, h, GCT flag + 8-bit color resolution + size 256
    out += struct.pack("<HH", width, height)
    out += bytes([0b11110111, 0, 0])  # GCT present, 2^(7+1)=256 entries
    for i in range(256):
        out += bytes([i, i, i])
    # image descriptor
    rows = [indices[y * width : (y + 1) * width] for y in range(height)]
    if interlace:
        rows = _interlace(rows, height)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0b01000000 if interlace else 0])  # no LCT
    out += bytes([8])  # LZW min code size
    payload = lzw_compress(b"".join(rows), 8)
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(content: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, rgb_bytes) for the FIRST image of a GIF87a/
    89a stream — full LZW, interlace, local-over-global palette,
    extensions skipped."""
    if content[:6] not in GIF_SIGS:
        raise ValueError("not a GIF87a/GIF89a stream")
    try:
        return _decode_gif_body(content)
    except (struct.error, IndexError) as exc:
        # Corrupt/truncated container: surface the codec contract's
        # ValueError, not a parser internal.
        raise ValueError(f"GIF: truncated or corrupt stream ({exc})") from exc


def _decode_gif_body(content: bytes) -> tuple[int, int, int, bytes]:
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct: bytes | None = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        gct = content[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block == 0x3B:
            raise ValueError("GIF: trailer before any image descriptor")
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 ** ((iflags & 0x07) + 1)
            pal = content[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image has neither local nor global palette")
        min_code = content[pos]
        pos += 1
        payload = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            payload += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = lzw_decompress(bytes(payload), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF: pixel data short of w*h indices")
        if iflags & 0x40:
            rows = [idx[y * w : (y + 1) * w] for y in range(h)]
            idx = b"".join(_deinterlace(rows, h))
        rgb = bytearray()
        for i in idx:
            rgb += pal[3 * i : 3 * i + 3]
        return w, h, 3, bytes(rgb)
    raise ValueError("GIF: no image descriptor found")
