"""Real media header parsers — pure Python, zero codec libraries.

These de-stub the metadata half of the multimodal pipeline: container
HEADERS (dimensions, duration, codec) are plain struct parsing, so they
need no PIL/ffmpeg and run inside the Arrow batch like any other kernel.
Pixel/sample DECODE (resize, spectrograms, model features) still needs
real codec libs and remains stubbed in operators/multimodal.py.

Formats: PNG, GIF(87a/89a), JPEG (SOF scan), BMP; WAV (RIFF/fmt/data);
MP4/ISO-BMFF (mvhd duration, tkhd dimensions, stts sample count).
Unknown or truncated blobs yield None fields rather than raising — at
corpus scale a malformed blob must not kill the executor batch.
"""

from __future__ import annotations

import struct

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image(blob: bytes) -> tuple[int | None, int | None, str | None]:
    """(width, height, codec) from a PNG/GIF/JPEG/BMP header."""
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            return w, h, "png"
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", blob[6:10])
            return w, h, "gif"
        if blob[:2] == b"BM" and len(blob) >= 26:
            w, h = struct.unpack("<ii", blob[18:26])
            return w, abs(h), "bmp"
        if blob[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(blob):
                if blob[i] != 0xFF:
                    i += 1
                    continue
                marker = blob[i + 1]
                if marker in _SOF_MARKERS:
                    h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                    return w, h, "jpeg"
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2          # standalone markers, no length field
                    continue
                (seglen,) = struct.unpack(">H", blob[i + 2:i + 4])
                i += 2 + seglen
            return None, None, "jpeg"
    except (struct.error, IndexError):
        pass
    return None, None, None


def parse_wav(blob: bytes) -> tuple[float | None, int | None, int | None,
                                    str | None]:
    """(duration_s, channels, sample_rate, codec) from a RIFF/WAVE blob.

    duration = data-chunk bytes / byte_rate, the exact PCM duration.
    """
    try:
        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            return None, None, None, None
        i = 12
        channels = rate = byte_rate = None
        data_size = None
        while i + 8 <= len(blob):
            cid = blob[i:i + 4]
            (csize,) = struct.unpack("<I", blob[i + 4:i + 8])
            if cid == b"fmt ":
                channels, rate = struct.unpack("<HI", blob[i + 10:i + 16])
                (byte_rate,) = struct.unpack("<I", blob[i + 16:i + 20])
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)      # chunks are word-aligned
        if byte_rate and data_size is not None:
            return data_size / byte_rate, channels, rate, "wav/pcm"
        return None, channels, rate, "wav"
    except (struct.error, IndexError):
        return None, None, None, None


def _iter_boxes(blob: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", blob[i:i + 4])
        btype = blob[i + 4:i + 8]
        if size == 1:                         # 64-bit largesize
            (size,) = struct.unpack(">Q", blob[i + 8:i + 16])
        if size < 8 or i + size > end:
            return
        yield btype, i + 8, i + size
        i += size


def _find_box(blob: bytes, path: list[bytes], start: int, end: int):
    for btype, lo, hi in _iter_boxes(blob, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return lo, hi
            return _find_box(blob, path[1:], lo, hi)
    return None


def parse_mp4(blob: bytes) -> tuple[int | None, int | None, int | None,
                                    float | None, str | None]:
    """(width, height, n_frames, duration_s, codec) from ISO-BMFF boxes:
    mvhd → timescale+duration, tkhd → track dimensions (16.16 fixed),
    stts → total sample (frame) count."""
    try:
        if blob[4:8] != b"ftyp":
            return None, None, None, None, None
        end = len(blob)
        duration_s = width = height = n_frames = None
        mvhd = _find_box(blob, [b"moov", b"mvhd"], 0, end)
        if mvhd:
            lo, _ = mvhd
            version = blob[lo]
            if version == 1:
                (scale,) = struct.unpack(">I", blob[lo + 20:lo + 24])
                (dur,) = struct.unpack(">Q", blob[lo + 24:lo + 32])
            else:
                scale, dur = struct.unpack(">II", blob[lo + 12:lo + 20])
            if scale:
                duration_s = dur / scale
        tkhd = _find_box(blob, [b"moov", b"trak", b"tkhd"], 0, end)
        if tkhd:
            lo, hi = tkhd
            # width/height are the last two 16.16 fixed-point fields
            w1616, h1616 = struct.unpack(">II", blob[hi - 8:hi])
            width, height = w1616 >> 16, h1616 >> 16
        stts = _find_box(
            blob, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stts"],
            0, end)
        if stts:
            lo, _ = stts
            (n_entries,) = struct.unpack(">I", blob[lo + 4:lo + 8])
            n_frames = sum(
                struct.unpack(">I", blob[lo + 8 + 8 * e:lo + 12 + 8 * e])[0]
                for e in range(n_entries)
            )
        return width, height, n_frames, duration_s, "mp4"
    except (struct.error, IndexError):
        return None, None, None, None, None


# --------------------------------------------------------------------------
# Deterministic REAL-file generators (tests + the q46 oracle): each builder
# emits a structurally valid file whose metadata follows a closed-form rule
# in the media id, so an SQL oracle can state the expected parse output
# without sharing any parsing code with the engine.
# --------------------------------------------------------------------------

def make_png(width: int, height: int, fill_seed: int | None = None) -> bytes:
    """8-bit grayscale PNG, filter 0. ``fill_seed=s`` fills pixel (x, y)
    with ``(x + 2*y + s) % 251`` (top-down row order) — the closed-form
    rule the q48 oracle recomputes; None keeps the all-zero image (q46
    blobs unchanged)."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    if fill_seed is None:
        rows = (bytes(width) for _ in range(height))
    else:
        rows = (
            bytes((x + 2 * y + fill_seed) % 251 for x in range(width))
            for y in range(height)
        )
    raw = b"".join(b"\x00" + r for r in rows)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# 4-entry GIF palette: entry i, channel c → 60*i + 10*c (closed form the
# q48 oracle recomputes; all values < 256)
GIF_PALETTE = bytes(60 * i + 10 * c for i in range(4) for c in range(3))


def make_gif(width: int, height: int, fill_seed: int | None = None) -> bytes:
    """GIF89a. ``fill_seed=s`` emits a REAL LZW-coded image whose pixel
    index at (x, y) is ``(x + y + s) % 4`` over the 4-color global
    palette above; None keeps the headers-only blob (q46 unchanged)."""
    head = b"GIF89a" + struct.pack("<HH", width, height)
    if fill_seed is None:
        return head + b"\x00\x00\x00" + b"\x3b"
    from newscrawler_spark.functions.media_pixels import gif_lzw_encode

    # packed: GCT flag=1, color-res=1, sort=0, GCT size=1 (2^(1+1)=4)
    screen = bytes([0x91, 0x00, 0x00]) + GIF_PALETTE
    idx = bytes(
        (x + y + fill_seed) % 4 for y in range(height) for x in range(width)
    )
    lzw = gif_lzw_encode(idx, min_code_size=2)
    sub_blocks = b"".join(
        bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
        for i in range(0, len(lzw), 255)
    )
    img = (b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
           + b"\x02" + sub_blocks + b"\x00")
    return head + screen + img + b"\x3b"


def make_bmp(width: int, height: int, fill_seed: int | None = None) -> bytes:
    """24-bit BMP. ``fill_seed=s`` fills the pixel byte at (x, file-row
    y, channel c) with ``(3*x + c + 7*y + s) % 251`` (padding bytes stay
    zero and are excluded from stats); None keeps all-zero pixels."""
    row = (width * 3 + 3) & ~3
    size = 54 + row * height
    if fill_seed is None:
        pixels = bytes(row * height)
    else:
        pad = row - width * 3
        pixels = b"".join(
            bytes((3 * x + c + 7 * y + fill_seed) % 251
                  for x in range(width) for c in range(3)) + bytes(pad)
            for y in range(height)
        )
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          row * height, 2835, 2835, 0, 0)
            + pixels)


def make_jpeg_header(width: int, height: int) -> bytes:
    """Valid JPEG preamble through SOF0 (enough for any header scanner;
    not a decodable image — pixel data would need entropy coding)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + struct.pack(">HH", 72, 72) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(duration_s: float, rate: int = 8000, channels: int = 1,
             fill_seed: int | None = None) -> bytes:
    """16-bit PCM WAV. ``fill_seed=s`` fills sample t (int16 LE, mono
    frame order) with ``((t*(3 + s%5) + s) % 401) - 200`` — spans
    negative/zero/positive so RMS and zero-crossings are non-trivial;
    None keeps silence (q46 blobs unchanged)."""
    byte_rate = rate * channels * 2
    n = int(round(duration_s * byte_rate))
    n += n & 1
    if fill_seed is None:
        data = bytes(n)
    else:
        k = 3 + fill_seed % 5
        data = b"".join(
            struct.pack("<h", ((t * k + fill_seed) % 401) - 200)
            for t in range(n // 2)
        )
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    byte_rate, channels * 2, 16)
            + b"data" + struct.pack("<I", n) + data)


def make_mp4(width: int, height: int, n_frames: int, fps: int = 25) -> bytes:
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    scale = 1000
    # single division of exact ints: when n_frames*scale is divisible by
    # fps the IEEE result is the exact integer (oracle-reproducible)
    dur = int(round(n_frames * scale / fps))
    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", scale, dur) + bytes(80))
    tkhd = box(b"tkhd", bytes(76) + struct.pack(">II", width << 16,
                                                height << 16))
    stts = box(b"stts", bytes(4) + struct.pack(">III", 1, n_frames,
                                               scale // fps))
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def make_jpeg(width: int, height: int, fill_seed: int | None = None) -> bytes:
    """REAL baseline grayscale JPEG (decodable, not just a header): flat
    8x8 blocks, all-ones quant table, standard DC + minimal AC Huffman
    tables — integer-exact round trip with media_pixels.decode_jpeg_gray.
    Block b (row-major over the ceil(w/8) x ceil(h/8) grid) has value
    ((b*(3 + s%5) + s) % 256) for fill_seed=s, or flat 128 when None.
    Implemented next to its decoder (shared Huffman machinery)."""
    from newscrawler_spark.functions.media_pixels import make_jpeg as _mk

    return _mk(width, height, fill_seed)
