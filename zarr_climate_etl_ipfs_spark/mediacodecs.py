"""Pure-stdlib media codecs: PNG / GIF / PPM / PGM / BMP images, PCM WAV audio.

The container has no PIL/opencv/ffmpeg, but none are needed for the
lossless formats whose decoders are just byte-layout + zlib/LZW (stdlib):
these kernels turn the multimodal "decode" step from an injectable stub
into a real decoder for PNG (8-bit gray/gray+alpha/RGB/RGBA, all five
scanline filters), GIF87a/89a (LZW, global/local palettes, interlace),
baseline uncompressed TIFF (II/MM byte orders, strips), binary PPM/PGM,
uncompressed 24-bit BMP, and PCM WAV (8/16-bit). Formats that genuinely
need external codecs (JPEG, WebP, LZW/JPEG TIFF, MP3, MP4) still raise
with the dependency name — the seam `multimodal.py` documents.

Encoders for PNG/GIF/TIFF/PPM/WAV exist so tests can round-trip real
bytes without fixtures from outside the repo.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np


class MediaDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# GIF (87a/89a): palette + LZW, both pure stdlib
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, variable code width
    starting at min_code_size+1 (max 12), CLEAR resets the table."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise MediaDecodeError(f"GIF LZW: bad code {code}")
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """GIF87a/89a → (H, W, 3) uint8 RGB of the FIRST frame (training-data
    feature extraction wants one representative raster, not an animation);
    ``meta['n_frames']`` counts every image block so multi-frame inputs are
    visible to callers. Handles global/local color tables, interlacing, and
    skips extension blocks; transparency index (89a GCE) is reported in
    meta but not composited — there is no prior frame to composite over."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("not a GIF (bad signature)")
    if len(content) < 14:
        raise MediaDecodeError("GIF: truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = None
    first: np.ndarray | None = None
    n_frames = 0
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = content[pos]
            pos += 1
            sub0 = pos
            while content[pos] != 0:
                pos += content[pos] + 1
            if label == 0xF9 and first is None:  # graphic control before frame 1
                gce = content[sub0 + 1 : sub0 + 1 + content[sub0]]
                if len(gce) >= 4 and gce[0] & 0x01:
                    transparent = gce[3]
            pos += 1
            continue
        if block != 0x2C:
            raise MediaDecodeError(f"GIF: unexpected block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        min_code_size = content[pos]
        pos += 1
        chunks = []
        while content[pos] != 0:
            ln = content[pos]
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += ln + 1
        pos += 1
        n_frames += 1
        if first is not None:
            continue  # later frames: counted, not decoded
        if ct is None:
            raise MediaDecodeError("GIF: no color table for first frame")
        idx = _gif_lzw_decode(b"".join(chunks), min_code_size)
        if len(idx) < w * h:
            raise MediaDecodeError(f"GIF: short pixel data ({len(idx)} < {w * h})")
        arr = np.asarray(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty_like(arr)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for r in range(start, h, step):
                    rows[r] = arr[src]
                    src += 1
            arr = rows
        if int(arr.max(initial=0)) >= len(ct):
            raise MediaDecodeError("GIF: pixel index out of palette range")
        frame = ct[arr]  # (h, w, 3)
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        canvas[top : top + h, left : left + w] = frame
        first = canvas
    if first is None:
        raise MediaDecodeError("GIF: no image data")
    meta = {"format": "gif", "height": sh, "width": sw, "channels": 3, "n_frames": n_frames}
    if transparent is not None:
        meta["transparent_index"] = int(transparent)
    return first, meta


def _gif_lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """Real dictionary LZW (not the clear-code-spam shortcut), matching the
    decoder's width-growth rule."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    prev = b""
    for v in indices.ravel().tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → single-frame GIF89a.
    Exists (like encode_png/encode_wav) so tests round-trip real bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif wants (H, W, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} colors > 256")
    ct_bits = max(1, (len(palette) - 1).bit_length())
    ct_n = 1 << ct_bits
    ct = np.zeros((ct_n, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx = idx[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    min_code_size = max(2, ct_bits)
    out.append(min_code_size)
    payload = _gif_lzw_encode(idx, min_code_size)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed, strip-based; both byte orders)
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits_per_sample", 259: "compression",
    273: "strip_offsets", 277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_byte_counts", 284: "planar_config",
}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def decode_tiff(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """Baseline TIFF → (H, W, C) uint8: uncompressed (compression=1),
    8 bits/sample, chunky planar config, strip-based, II or MM byte order —
    the uncompressed-scan flavor scientific instruments and scanners emit.
    LZW/JPEG-compressed TIFFs raise NotImplementedError naming the codec."""
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise MediaDecodeError("not a TIFF (bad signature)")
    (ifd_off,) = struct.unpack(bo + "I", content[4:8])
    (n_entries,) = struct.unpack(bo + "H", content[ifd_off : ifd_off + 2])
    tags: dict[str, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", content[e : e + 8])
        name = _TIFF_TAGS.get(tag)
        if name is None or typ not in _TIFF_TYPE_SIZE:
            continue
        size = _TIFF_TYPE_SIZE[typ] * count
        if size <= 4:
            raw = content[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", content[e + 8 : e + 12])
            raw = content[off : off + size]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[name] = list(struct.unpack(bo + fmt * count, raw))
    try:
        w, h = tags["width"][0], tags["height"][0]
    except KeyError as e:
        raise MediaDecodeError(f"TIFF: missing required tag {e}") from None
    comp = tags.get("compression", [1])[0]
    if comp != 1:
        codec = {5: "LZW", 6: "JPEG", 7: "JPEG", 8: "Deflate", 32773: "PackBits"}.get(
            comp, f"compression={comp}"
        )
        raise NotImplementedError(f"TIFF {codec} — inject a decoder (libtiff/PIL)")
    spp = tags.get("samples_per_pixel", [1])[0]
    bps = tags.get("bits_per_sample", [8])
    if any(b != 8 for b in bps):
        raise MediaDecodeError(f"TIFF: only 8 bits/sample supported, got {bps}")
    if tags.get("planar_config", [1])[0] != 1:
        raise MediaDecodeError("TIFF: planar (non-chunky) layout unsupported")
    offsets = tags["strip_offsets"]
    counts = tags.get("strip_byte_counts", [w * h * spp])
    data = b"".join(content[o : o + c] for o, c in zip(offsets, counts))
    if len(data) < w * h * spp:
        raise MediaDecodeError(f"TIFF: short strip data ({len(data)} < {w * h * spp})")
    img = np.frombuffer(data[: w * h * spp], dtype=np.uint8).reshape(h, w, spp)
    return img, {"format": "tiff", "height": h, "width": w, "channels": spp,
                 "byte_order": "little" if bo == "<" else "big"}


def encode_tiff(img: np.ndarray, big_endian: bool = False) -> bytes:
    """(H, W) or (H, W, C) uint8 → single-strip uncompressed baseline TIFF.
    Exists so tests round-trip real bytes in both byte orders."""
    if img.dtype != np.uint8:
        raise ValueError("encode_tiff wants uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    bo = ">" if big_endian else "<"
    pixels = img.tobytes()
    header = b"MM\x00*" if big_endian else b"II*\x00"
    # layout: header(8) | pixel data | bits_per_sample array (if c>1) | IFD
    pix_off = 8
    bps_off = pix_off + len(pixels)
    ifd_off = bps_off + (2 * c if c > 1 else 0)
    entries = []

    def entry(tag: int, typ: int, count: int, value: int) -> None:
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack(bo + fmt, value)
        raw += b"\x00" * (4 - len(raw))
        entries.append(struct.pack(bo + "HHI", tag, typ, count) + raw)

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if c > 1:
        entries.append(struct.pack(bo + "HHII", 258, 3, c, bps_off))
    else:
        entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)  # uncompressed
    entry(262, 3, 1, 2 if c >= 3 else 1)  # photometric: RGB / BlackIsZero
    entry(273, 4, 1, pix_off)  # strip offset
    entry(277, 3, 1, c)
    entry(278, 4, 1, h)  # rows per strip: single strip
    entry(279, 4, 1, len(pixels))
    out = bytearray(header)
    out += struct.pack(bo + "I", ifd_off)
    out += pixels
    if c > 1:
        out += struct.pack(bo + "H" * c, *([8] * c))
    out += struct.pack(bo + "H", len(entries))
    for e in sorted(entries, key=lambda b: struct.unpack(bo + "H", b[:2])[0]):
        out += e
    out += struct.pack(bo + "I", 0)  # next-IFD terminator
    return bytes(out)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba


def decode_png(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """PNG → (H, W, C) uint8 array. Supports bit depth 8, color types
    0/2/4/6, no interlace; undoes all five scanline filters."""
    if content[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(content):
        (clen,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise MediaDecodeError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise MediaDecodeError(
            f"unsupported PNG (depth={depth}, interlace={interlace}); "
            "only 8-bit non-interlaced is implemented"
        )
    if color not in _PNG_CHANNELS:
        raise MediaDecodeError(f"unsupported PNG color type {color} (palette needs PLTE)")
    c = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: prefix sum per channel lane
            rec = line.reshape(w, c).cumsum(axis=0).reshape(stride)
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 3:  # Average — sequential in x
            rec = line.copy()
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = line[x] + ((left + prev[x]) >> 1)
                rec[x] &= 0xFF
        elif ftype == 4:  # Paeth — sequential in x
            rec = line.copy()
            for x in range(stride):
                a = rec[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = line[x] + pred
                rec[x] &= 0xFF
        else:
            raise MediaDecodeError(f"unknown PNG filter {ftype}")
        rec = rec & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    meta = {"format": "png", "width": w, "height": h, "n_channels": c}
    return out.reshape(h, w, c), meta


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 → PNG bytes (filter 0, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5)
# ---------------------------------------------------------------------------


def decode_ppm(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    magic = content[:2]
    if magic not in (b"P5", b"P6"):
        raise MediaDecodeError("not a binary PGM/PPM (P5/P6)")
    # header: magic, width, height, maxval — whitespace/comment separated
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3 and pos < len(content):
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        toks.append(content[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise MediaDecodeError("16-bit PNM not supported")
    c = 3 if magic == b"P6" else 1
    arr = np.frombuffer(content, dtype=np.uint8, count=h * w * c, offset=pos)
    fmt = "ppm" if c == 3 else "pgm"
    return arr.reshape(h, w, c).copy(), {
        "format": fmt, "width": w, "height": h, "n_channels": c
    }


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    if content[:2] != b"BM":
        raise MediaDecodeError("not a BMP")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size, w, h) = struct.unpack("<Iii", content[14:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    (compression,) = struct.unpack("<I", content[30:34])
    if bpp != 24 or compression != 0:
        raise MediaDecodeError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for y in range(h):
        off = data_off + y * row_bytes
        rows.append(np.frombuffer(content, dtype=np.uint8, count=w * 3, offset=off))
    img = np.stack(rows).reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if flip:
        img = img[::-1]
    return img.copy(), {"format": "bmp", "width": w, "height": h, "n_channels": 3}


# ---------------------------------------------------------------------------
# WAV (RIFF PCM 8/16-bit)
# ---------------------------------------------------------------------------


def decode_wav(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """WAV → (n_samples, n_channels) float32 in [-1, 1] + meta."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise MediaDecodeError(f"only PCM 8/16-bit WAV (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = samples.size // n_ch
    samples = samples[: n * n_ch].reshape(n, n_ch)
    meta = {
        "format": "wav",
        "n_channels": n_ch,
        "sample_rate": rate,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
    }
    return samples, meta


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, C) float32 in [-1, 1] → 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, c = arr.shape
    # round (not truncate) and use the decoder's /32768 scale so the
    # round-trip error is bounded by half an LSB
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, c, sample_rate, sample_rate * c * 2, c * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


# ---------------------------------------------------------------------------
# dispatch + feature kernels
# ---------------------------------------------------------------------------

_IMAGE_MAGIC = (
    (_PNG_SIG, decode_png),
    (b"GIF87a", decode_gif),
    (b"GIF89a", decode_gif),
    (b"II*\x00", decode_tiff),
    (b"MM\x00*", decode_tiff),
    (b"P5", decode_ppm),
    (b"P6", decode_ppm),
    (b"BM", decode_bmp),
)

_NEEDS_EXTERNAL = {
    b"\xff\xd8\xff": "JPEG (needs PIL/libjpeg)",
}


def decode_image(content: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """Magic-byte dispatch over the stdlib-decodable image formats."""
    for magic, dec in _IMAGE_MAGIC:
        if content[: len(magic)] == magic:
            return dec(content)
    # WebP is RIFF <4-byte size> WEBP — the format tag sits at offset 8, so a
    # plain prefix compare can't see it (and must not shadow RIFF/WAVE audio).
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        raise NotImplementedError("WebP (needs PIL/libwebp) — not in this container; inject a decoder")
    for magic, name in _NEEDS_EXTERNAL.items():
        if content[: len(magic)] == magic:
            raise NotImplementedError(f"{name} — not in this container; inject a decoder")
    raise MediaDecodeError("unrecognized image format")


def image_features(content: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Decode + fixed 12-dim feature: (h, w, c, global mean/std, 4 quadrant
    means, per-channel-0 min/max, edge-energy proxy). Deterministic, no
    external libs — the real-decode default for multimodal.extract_features."""
    img, m = decode_image(content)
    h, w, c = img.shape
    g = img.astype(np.float32)
    qh, qw = max(1, h // 2), max(1, w // 2)
    quads = [
        g[:qh, :qw].mean(), g[:qh, qw:].mean() if w > qw else 0.0,
        g[qh:, :qw].mean() if h > qh else 0.0,
        g[qh:, qw:].mean() if (h > qh and w > qw) else 0.0,
    ]
    edge = float(np.abs(np.diff(g[:, :, 0], axis=1)).mean()) if w > 1 else 0.0
    return np.array(
        [h, w, c, g.mean(), g.std(), *quads, g[:, :, 0].min(), g[:, :, 0].max(), edge],
        dtype=np.float32,
    )


def audio_features(content: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Decode WAV + fixed 8-dim feature: (n_samples, channels, sample_rate,
    duration_ms, rms, peak, zero-crossing rate, dc offset)."""
    samples, m = decode_wav(content)
    mono = samples.mean(axis=1)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if mono.size > 1 else 0.0
    return np.array(
        [
            samples.shape[0], samples.shape[1], m["sample_rate"], m["duration_ms"],
            float(np.sqrt(np.mean(mono**2))), float(np.abs(mono).max(initial=0.0)),
            zcr, float(mono.mean()),
        ],
        dtype=np.float32,
    )
