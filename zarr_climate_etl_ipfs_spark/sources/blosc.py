"""Blosc1 container + numcodecs LZ4 / Zstd codecs, no compiled wheels.

Closes the ``blosc`` / ``lz4`` / ``zstd`` compressor seams in the Zarr
layer (zarr2.py): zarr v2's historical DEFAULT compressor is
``Blosc(cname="lz4", clevel=5, shuffle=SHUFFLE)``, so reading real-world
stores requires the blosc chunk format, not just zlib/gzip. The reference
delegates this to the compiled ``blosc``/``numcodecs`` wheels
(gridded_etl_tools' zarr stack); here the CONTAINER — header, block
starts, split streams, byte/bit shuffle — is implemented from the public
c-blosc 1.x format (blosc.h/blosc.c/shuffle.c, BSD), while the inner
per-stream compression is delegated to codecs already in this
environment: pyarrow's bundled lz4 (raw block), zstd and snappy, plus
stdlib zlib. No new dependency; pyarrow is gated behind an import-try
with a named error.

Blosc1 chunk layout (c-blosc ``README_HEADER.rst`` / ``blosc.c``):

  byte  0      format version (2)
  byte  1      compressor-format version (1 for every shipped codec)
  byte  2      flags: bit0 byte-shuffle, bit1 pure-memcpy, bit2
               bit-shuffle, bit4 dont-split (c-blosc >= 1.11,
               self-describing), bits5-7 compressor format code
               (0 blosclz, 1 lz4/lz4hc, 3 snappy, 4 zlib, 5 zstd)
  byte  3      typesize
  bytes 4-15   nbytes, blocksize, cbytes (uint32 LE each)

then, unless memcpyed, ``nblocks`` uint32-LE absolute offsets
("bstarts"), then per block: ``nsplits`` streams, each a uint32-LE
compressed size followed by the stream bytes (size == uncompressed
stream size marks a stored-raw stream). Blocks whose bytes were
shuffled are shuffled PER BLOCK; split blocks (lz4/blosclz, typesize
<= 16, blocksize/typesize >= 128, never the leftover block) carry one
stream per byte lane. Bit-shuffle follows the bitshuffle library's
layout: byte-lane major, then bit plane (LSB first), elements packed
8-per-byte in element order; the trailing ``(n % 8) * typesize`` bytes
are stored verbatim, as are the ``len % typesize`` leftovers of
byte-shuffle.

``blosclz`` streams are decoded/encoded from the published token
layout (FastLZ family; see the stream description at the blosclz
section below) — TEST-GRADE interop: no c-blosc wheel exists in this
environment to cross-check, so the anchors are hand vectors derived
token-by-token from the format description plus a distance-continuity
argument (near 1..8191, far from exactly 8192) that forces the +1
conventions. blosclz is rare in practice (the reference's own default
is ``cname="lz4"``, pinned in its tests).

numcodecs wrappers (public numcodecs sources):
* ``LZ4``  — uint32-LE original-size prefix + one raw LZ4 block.
* ``Zstd`` — a bare zstd frame; the decoder recovers the content size
  from the frame header (RFC 8878 §3.1.1), which numcodecs' encoder
  always embeds.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "BloscError",
    "blosc_compress",
    "blosc_decompress",
    "blosclz_compress",
    "blosclz_decompress",
    "lz4_nc_encode",
    "lz4_nc_decode",
    "zstd_nc_encode",
    "zstd_nc_decode",
    "byteshuffle",
    "byteunshuffle",
    "bitshuffle",
    "bitunshuffle",
]


class BloscError(RuntimeError):
    """Malformed blosc/lz4/zstd data or an unavailable inner codec."""


# flags (blosc.h)
_DOSHUFFLE = 0x1
_MEMCPYED = 0x2
_DOBITSHUFFLE = 0x4
_DONT_SPLIT = 0x10

# compressor format codes (blosc.h; lz4hc shares lz4's code)
_FMT_BLOSCLZ, _FMT_LZ4, _FMT_SNAPPY, _FMT_ZLIB, _FMT_ZSTD = 0, 1, 3, 4, 5
_CNAME_TO_FMT = {
    "blosclz": _FMT_BLOSCLZ,
    "lz4": _FMT_LZ4,
    "lz4hc": _FMT_LZ4,
    "snappy": _FMT_SNAPPY,
    "zlib": _FMT_ZLIB,
    "zstd": _FMT_ZSTD,
}

# numcodecs Blosc shuffle constants
NOSHUFFLE, SHUFFLE, BITSHUFFLE, AUTOSHUFFLE = 0, 1, 2, -1

_MAX_SPLITS = 16  # c-blosc MAX_STREAMS: lanes beyond 16 bytes never split
_MIN_BUFFERSIZE = 128  # c-blosc BLOSC_MIN_BUFFERSIZE
_DEFAULT_BLOCKSIZE = 256 * 1024


def _pa_codec(name: str, level: int | None = None):
    try:
        import pyarrow as pa
    except ImportError as exc:  # pragma: no cover - pyarrow is baked in
        raise BloscError(
            f"inner codec {name!r} needs pyarrow (not installed)"
        ) from exc
    if not pa.Codec.is_available(name):  # pragma: no cover - bundled
        raise BloscError(f"pyarrow build lacks codec {name!r}")
    return pa.Codec(name) if level is None else pa.Codec(name, compression_level=level)


# ---------------------------------------------------------------------------
# Shuffle filters (shuffle.c / bitshuffle, numpy-vectorized)
# ---------------------------------------------------------------------------


def byteshuffle(buf: bytes, typesize: int) -> bytes:
    """Byte-transpose to lane-major order; ``len % typesize`` tail verbatim."""
    if typesize <= 1:
        return bytes(buf)
    cut = len(buf) // typesize * typesize
    if cut == 0:
        return bytes(buf)
    a = np.frombuffer(buf[:cut], dtype=np.uint8).reshape(-1, typesize)
    return np.ascontiguousarray(a.T).tobytes() + bytes(buf[cut:])


def byteunshuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return bytes(buf)
    cut = len(buf) // typesize * typesize
    if cut == 0:
        return bytes(buf)
    a = np.frombuffer(buf[:cut], dtype=np.uint8).reshape(typesize, -1)
    return np.ascontiguousarray(a.T).tobytes() + bytes(buf[cut:])


def bitshuffle(buf: bytes, typesize: int) -> bytes:
    """bitshuffle's ``bshuf_trans_bit_elem``: output plane ``(lane b,
    bit k)`` holds bit k (LSB=0) of byte-lane b of each element, packed
    little-endian 8 elements per byte; the trailing partial group of
    < 8 elements is stored verbatim (c-blosc shuffle.c bitshuffle())."""
    ts = max(typesize, 1)
    n8 = (len(buf) // ts) & ~7
    cut = n8 * ts
    if n8 == 0:
        return bytes(buf)
    a = np.frombuffer(buf[:cut], dtype=np.uint8).reshape(n8, ts)
    bits = np.unpackbits(a[:, :, None], axis=2, bitorder="little")  # (n8, ts, 8)
    planes = bits.transpose(1, 2, 0)  # (ts, 8, n8)
    return np.packbits(planes, axis=2, bitorder="little").tobytes() + bytes(buf[cut:])


def bitunshuffle(buf: bytes, typesize: int) -> bytes:
    ts = max(typesize, 1)
    n8 = (len(buf) // ts) & ~7
    cut = n8 * ts
    if n8 == 0:
        return bytes(buf)
    planes = np.frombuffer(buf[:cut], dtype=np.uint8).reshape(ts, 8, n8 // 8)
    bits = np.unpackbits(planes, axis=2, bitorder="little")  # (ts, 8, n8)
    a = bits.transpose(2, 0, 1)  # (n8, ts, 8)
    return np.packbits(a, axis=2, bitorder="little").tobytes() + bytes(buf[cut:])


# ---------------------------------------------------------------------------
# Inner per-stream codecs
# ---------------------------------------------------------------------------


def _stream_compress(fmt: int, data: bytes, clevel: int) -> bytes:
    if fmt == _FMT_ZLIB:
        return zlib.compress(data, min(max(clevel, 1), 9))
    if fmt == _FMT_LZ4:
        return _pa_codec("lz4_raw").compress(data).to_pybytes()
    if fmt == _FMT_ZSTD:
        # c-blosc maps clevel 1-9 onto zstd's wider range; any level is
        # format-compatible, so reuse clevel directly.
        return _pa_codec("zstd", min(max(clevel, 1), 9)).compress(data).to_pybytes()
    if fmt == _FMT_SNAPPY:
        return _pa_codec("snappy").compress(data).to_pybytes()
    if fmt == _FMT_BLOSCLZ:
        return blosclz_compress(data)  # clevel only tunes heuristics upstream
    raise BloscError(f"unknown blosc compressor format code {fmt}")


def _stream_decompress(fmt: int, data: bytes, nbytes: int) -> bytes:
    try:
        if fmt == _FMT_ZLIB:
            out = zlib.decompress(data)
        elif fmt == _FMT_LZ4:
            out = _pa_codec("lz4_raw").decompress(data, nbytes).to_pybytes()
        elif fmt == _FMT_ZSTD:
            out = _pa_codec("zstd").decompress(data, nbytes).to_pybytes()
        elif fmt == _FMT_SNAPPY:
            out = _pa_codec("snappy").decompress(data, nbytes).to_pybytes()
        elif fmt == _FMT_BLOSCLZ:
            out = blosclz_decompress(data, nbytes)
        else:
            raise BloscError(f"unknown blosc compressor format code {fmt}")
    except BloscError:
        raise
    except Exception as exc:
        # inner codecs raise their own types (zlib.error, pyarrow
        # ArrowInvalid, ...) on corrupt foreign bytes; the module contract
        # is ONE malformed-data exception type
        raise BloscError(f"blosc inner stream (fmt {fmt}) corrupt: {exc}") from exc
    if len(out) != nbytes:
        raise BloscError(f"blosc stream decoded to {len(out)} bytes, expected {nbytes}")
    return out


# ---------------------------------------------------------------------------
# BloscLZ streams (FastLZ-family; token layout from c-blosc blosclz.c)
# ---------------------------------------------------------------------------
#
# Interop grade: TEST-GRADE, format-from-description (the ccsds_aec framing).
# No c-blosc/numcodecs wheel exists in this environment to cross-check real
# frames against, so the anchor is hand vectors derived token-by-token from
# the published stream description below, plus a distance-continuity
# argument: near distances cover 1..8191 (the (31<<8, 255) combination is
# the far escape), far distances start exactly at 8192 — the +1 terms are
# forced by that continuity, not guessed.
#
# Stream = a control byte then operands; the FIRST control byte is always a
# literal-run token (the decoder masks it with 31):
#
# * ctrl < 32   — literal run of ``ctrl + 1`` bytes, copied verbatim.
# * ctrl >= 32  — match. ``ctrl >> 5`` in 1..6 encodes copy length
#   ``(ctrl >> 5) + 2`` (3..8); ``ctrl >> 5 == 7`` chains extra length
#   bytes, each adding its value, until a byte != 255 (copy length
#   ``9 + sum``; bloscLZ chains where ancestral FastLZ level 1 read one
#   byte). Distance = ``((ctrl & 31) << 8 | code) + 1`` where ``code`` is
#   the next byte — unless ``code == 255`` AND the high bits were 31, the
#   far escape: two more bytes give ``d16``, distance = ``d16 + 8192``.
#   Matches may overlap the output head (RLE).

_MAX_DISTANCE = 8191  # c-blosc MAX_DISTANCE: largest near-encoded distance
_MAX_FAR_DISTANCE = _MAX_DISTANCE + 65535 + 1


def blosclz_decompress(src: bytes, nbytes: int) -> bytes:
    """Decode one blosclz stream to exactly ``nbytes`` bytes."""
    src = bytes(src)
    n = len(src)
    if n == 0:
        if nbytes:
            raise BloscError("blosclz: empty stream for nonzero output")
        return b""
    out = bytearray()
    ctrl = src[0] & 31
    ip = 1
    while True:
        if ctrl >= 32:
            ln = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if ln == 6:  # ctrl >> 5 == 7: chained length bytes
                while True:
                    if ip >= n:
                        raise BloscError("blosclz: truncated length chain")
                    code = src[ip]
                    ip += 1
                    ln += code
                    if code != 255:
                        break
            if ip >= n:
                raise BloscError("blosclz: truncated distance byte")
            code = src[ip]
            ip += 1
            ln += 3
            if code == 255 and ofs == (31 << 8):
                if ip + 2 > n:
                    raise BloscError("blosclz: truncated far distance")
                dist = ((src[ip] << 8) | src[ip + 1]) + _MAX_DISTANCE + 1
                ip += 2
            else:
                dist = ofs + code + 1
            start = len(out) - dist
            if start < 0:
                raise BloscError("blosclz: match reaches before output start")
            if dist >= ln:
                out += out[start : start + ln]
            else:  # overlapping copy == repeat the trailing window (RLE)
                window = bytes(out[start:])
                out += (window * (-(-ln // dist)))[:ln]
        else:
            run = ctrl + 1
            if ip + run > n:
                raise BloscError("blosclz: truncated literal run")
            out += src[ip : ip + run]
            ip += run
        if ip >= n:
            break
        ctrl = src[ip]
        ip += 1
    if len(out) != nbytes:
        raise BloscError(f"blosclz decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def _blosclz_emit_match(out: bytearray, ln: int, dist: int) -> None:
    if dist <= _MAX_DISTANCE:
        hi, lo, far = (dist - 1) >> 8, (dist - 1) & 255, None
    else:
        hi, lo, far = 31, 255, dist - _MAX_DISTANCE - 1
    if ln <= 8:
        out.append(((ln - 2) << 5) | hi)
    else:
        out.append((7 << 5) | hi)
        rem = ln - 9
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)  # a non-255 byte ends the chain (0 is valid)
    out.append(lo)
    if far is not None:
        out.append(far >> 8)
        out.append(far & 255)


def blosclz_compress(data: bytes) -> bytes:
    """Greedy single-pass blosclz encoder (hash of 4-byte prefixes, longest
    extension, overlap allowed). Every emitted token follows the stream
    description above, so any c-blosc build reads it back; ratio and speed
    are test-grade, not c-blosc-grade — the container stores streams raw
    whenever this expands, and the production sink default stays lz4."""
    data = bytes(data)
    n = len(data)
    if n == 0:
        return b""
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 1  # position 0 can never match backwards; guarantees a leading literal
    table[data[0:4]] = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(j_key := key, -1)
        dist = i - j
        if j >= 0 and dist <= _MAX_FAR_DISTANCE:
            ln = 4
            while i + ln < n and data[j + ln] == data[i + ln]:
                ln += 1
            # flush pending literals, then the match
            p = lit_start
            while p < i:
                run = min(32, i - p)
                out.append(run - 1)
                out += data[p : p + run]
                p += run
            _blosclz_emit_match(out, ln, dist)
            table[j_key] = i
            end = i + ln
            step = 1 if ln <= 64 else ln // 16  # sparse-index long matches
            for k in range(i + 1, min(end, n - 3), step):
                table[data[k : k + 4]] = k
            i = end
            lit_start = end
        else:
            table[j_key] = i
            i += 1
    # trailing literals
    p = lit_start
    while p < n:
        run = min(32, n - p)
        out.append(run - 1)
        out += data[p : p + run]
        p += run
    return bytes(out)


# ---------------------------------------------------------------------------
# Blosc1 container
# ---------------------------------------------------------------------------


def _split_block(fmt: int, typesize: int, blocksize: int) -> bool:
    """c-blosc's FORWARD_COMPAT split rule (blosc.c split_block): only
    blosclz/lz4 split, one stream per byte lane."""
    return (
        fmt in (_FMT_BLOSCLZ, _FMT_LZ4)
        and 0 < typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
    )


def blosc_decompress(frame: bytes) -> bytes:
    """Decode one blosc1 chunk (any cname this module knows, any shuffle,
    split or not, memcpy fallback). Self-describing: typesize, shuffle
    and the >=1.11 dont-split flag all come from the header."""
    if len(frame) < 16:
        raise BloscError(f"blosc frame too short ({len(frame)} bytes)")
    flags, typesize = frame[2], frame[3] or 1
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if cbytes > len(frame):
        raise BloscError(f"blosc header cbytes {cbytes} > frame {len(frame)}")
    if flags & _MEMCPYED:
        if len(frame) < 16 + nbytes:
            raise BloscError("blosc memcpy frame shorter than nbytes")
        return bytes(frame[16 : 16 + nbytes])
    if nbytes == 0:
        return b""
    if blocksize == 0:
        raise BloscError("blosc frame has zero blocksize")
    fmt = flags >> 5
    nblocks = -(-nbytes // blocksize)
    if 16 + 4 * nblocks > len(frame):
        # a forged nbytes/blocksize pair would otherwise turn into a raw
        # struct.error (or a huge allocation) instead of the contract type
        raise BloscError(
            f"blosc header claims {nblocks} blocks but the frame holds "
            f"{len(frame)} bytes"
        )
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    out = bytearray()
    for j, start in enumerate(bstarts):
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize != blocksize
        split = not (flags & _DONT_SPLIT) and not leftover
        nsplits = typesize if split else 1
        if nsplits > 1 and bsize % nsplits:
            raise BloscError(
                f"blosc block {j}: size {bsize} not divisible into {nsplits} lanes"
            )
        neblock = bsize // nsplits
        pos = start
        block = bytearray()
        for _ in range(nsplits):
            if pos + 4 > len(frame):
                raise BloscError(f"blosc block {j}: stream size prefix truncated")
            (sc,) = struct.unpack_from("<I", frame, pos)
            pos += 4
            raw = frame[pos : pos + sc]
            if len(raw) != sc:
                raise BloscError(f"blosc block {j}: truncated stream")
            pos += sc
            block += raw if sc == neblock else _stream_decompress(fmt, raw, neblock)
        buf = bytes(block)
        if flags & _DOSHUFFLE:
            buf = byteunshuffle(buf, typesize)
        elif flags & _DOBITSHUFFLE:
            buf = bitunshuffle(buf, typesize)
        out += buf
    if len(out) != nbytes:
        raise BloscError(f"blosc decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def blosc_compress(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    clevel: int = 5,
    shuffle: int = SHUFFLE,
    blocksize: int = 0,
) -> bytes:
    """Encode one blosc1 chunk. Mirrors numcodecs.Blosc's parameters
    (blocksize 0 = automatic; AUTOSHUFFLE follows numcodecs: bit-shuffle
    for 1-byte items, byte-shuffle otherwise). Split decisions follow
    the c-blosc FORWARD_COMPAT rule and are recorded in the header's
    dont-split flag, so c-blosc >= 1.11 reads these frames back.
    Incompressible data falls back to the pure-memcpy frame, as
    blosc_compress does when cbytes would reach nbytes."""
    if cname not in _CNAME_TO_FMT:
        raise BloscError(f"unknown blosc cname {cname!r}")
    fmt = _CNAME_TO_FMT[cname]
    data = bytes(data)
    nbytes = len(data)
    typesize = typesize if 0 < typesize <= 255 else 1
    if shuffle == AUTOSHUFFLE:
        shuffle = BITSHUFFLE if typesize == 1 else SHUFFLE
    if clevel == 0 or nbytes == 0:
        return _memcpy_frame(data, typesize, fmt)
    if blocksize <= 0:
        blocksize = _DEFAULT_BLOCKSIZE
    blocksize = min(blocksize, nbytes)
    if typesize > 1 and blocksize % typesize:
        # keep full blocks lane-divisible; the remainder becomes an
        # unsplit leftover block, exactly as c-blosc lays it out
        blocksize = max(blocksize - blocksize % typesize, typesize)
    flags = fmt << 5
    if shuffle == SHUFFLE and typesize > 1:
        flags |= _DOSHUFFLE
    elif shuffle == BITSHUFFLE:
        flags |= _DOBITSHUFFLE
    split = _split_block(fmt, typesize, blocksize)
    if not split:
        flags |= _DONT_SPLIT
    nblocks = -(-nbytes // blocksize)
    body = bytearray()
    bstarts: list[int] = []
    base = 16 + 4 * nblocks
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        buf = data[j * blocksize : j * blocksize + bsize]
        if flags & _DOSHUFFLE:
            buf = byteshuffle(buf, typesize)
        elif flags & _DOBITSHUFFLE:
            buf = bitshuffle(buf, typesize)
        nsplits = typesize if (split and bsize == blocksize) else 1
        neblock = bsize // nsplits
        bstarts.append(base + len(body))
        for s in range(nsplits):
            stream = buf[s * neblock : (s + 1) * neblock]
            comp = _stream_compress(fmt, stream, clevel)
            if len(comp) >= neblock:
                comp = stream  # stored raw; size == neblock marks it
            body += struct.pack("<I", len(comp)) + comp
    cbytes = base + len(body)
    if cbytes >= nbytes + 16:
        return _memcpy_frame(data, typesize, fmt)
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + struct.pack(f"<{nblocks}I", *bstarts) + bytes(body)


def _memcpy_frame(data: bytes, typesize: int, fmt: int) -> bytes:
    header = struct.pack(
        "<BBBBIII",
        2,
        1,
        _MEMCPYED | (fmt << 5),
        typesize,
        len(data),
        len(data),
        16 + len(data),
    )
    return header + data


# ---------------------------------------------------------------------------
# numcodecs LZ4 (size-prefixed raw block) and Zstd (bare frame)
# ---------------------------------------------------------------------------


def lz4_nc_encode(data: bytes, acceleration: int = 1) -> bytes:
    """numcodecs.LZ4: uint32-LE original size + one LZ4 raw block.
    ``acceleration`` trades ratio for speed in the reference encoder;
    any setting yields the same self-contained block format."""
    del acceleration  # format-compatible regardless
    data = bytes(data)
    return struct.pack("<I", len(data)) + _pa_codec("lz4_raw").compress(data).to_pybytes()


def lz4_nc_decode(buf: bytes) -> bytes:
    if len(buf) < 4:
        raise BloscError("lz4 buffer shorter than its size prefix")
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return b""
    return _pa_codec("lz4_raw").decompress(bytes(buf[4:]), n).to_pybytes()


def zstd_nc_encode(data: bytes, level: int = 1) -> bytes:
    """numcodecs.Zstd: a bare zstd frame with embedded content size."""
    return _pa_codec("zstd", level).compress(bytes(data)).to_pybytes()


def zstd_nc_decode(buf: bytes) -> bytes:
    n = zstd_frame_content_size(buf)
    if n is None:
        raise BloscError(
            "zstd frame lacks an embedded content size; a streaming "
            "decoder (zstandard / numcodecs) is needed for such frames"
        )
    if n == 0:
        return b""
    return _pa_codec("zstd").decompress(bytes(buf), n).to_pybytes()


def zstd_frame_content_size(buf: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1);
    None when the optional field is absent."""
    if len(buf) < 5 or struct.unpack_from("<I", buf, 0)[0] != 0xFD2FB528:
        raise BloscError("not a zstd frame (bad magic)")
    fhd = buf[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_flag = fhd & 3
    pos = 5 + (0 if single_segment else 1)  # window descriptor
    pos += (0, 1, 2, 4)[did_flag]
    if fcs_flag == 0:
        if not single_segment:
            return None
        return buf[pos]
    if fcs_flag == 1:
        return struct.unpack_from("<H", buf, pos)[0] + 256
    if fcs_flag == 2:
        return struct.unpack_from("<I", buf, pos)[0]
    return struct.unpack_from("<Q", buf, pos)[0]
