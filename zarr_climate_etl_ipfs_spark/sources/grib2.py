"""Pure-numpy GRIB edition 2 reader/writer (S8).

The reference's GRIB path is ``kerchunk.grib2.scan_grib``
(utils/transform.py:19, 211-253); this module decodes the same products
without kerchunk/cfgrib, implementing the published WMO GRIB2 format
(FM 92-XIV) subset that regular lat/lon products use:

  - Section 0 indicator ("GRIB", edition 2, 8-byte total length);
  - Section 1 identification (reference time);
  - Section 3 grid definition, template 3.0 (regular lat/lon in
    microdegrees, scanning mode 0);
  - Section 4 product definition, template 4.0 (parameter
    category/number, level);
  - Section 5 data representation, template 5.0 (simple packing:
    IEEE-754 reference value R, binary scale E, decimal scale D,
    B-bit integers; value = (R + X·2^E) / 10^D);
  - Section 6 bitmap (indicator 0 = present, 255 = none);
  - Section 7 data (big-endian bitstream, vectorized unpack);
  - Section 8 "7777"; multi-message concatenation.

Out of scope (clear errors): complex/JPEG2000/PNG packing (templates
5.2+), non-lat/lon grids, GRIB1 (see sources/grib1.py).
"""

from __future__ import annotations

import datetime as dt
import struct
from dataclasses import dataclass, field

import numpy as np

from zarr_climate_etl_ipfs_spark.sources.grib1 import (
    GRIB1Error,
    _pack_bits,
    _unpack_bits,
)


class GRIB2Error(GRIB1Error):
    """Malformed or out-of-subset GRIB2 bytes."""


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off : off + n], "big")


def _s32(b: bytes, off: int) -> int:
    """GRIB2 signed 32-bit: sign-magnitude (high bit = sign)."""
    raw = _u(b, off, 4)
    return -(raw & 0x7FFFFFFF) if raw & 0x80000000 else raw


def _s32_bytes(v: int) -> bytes:
    raw = (abs(v) | 0x80000000) if v < 0 else v
    return raw.to_bytes(4, "big")


@dataclass
class GRIB2Message:
    """One decoded slab: (Nj × Ni) grid, one reference time, one product."""

    discipline: int
    parameter_category: int
    parameter_number: int
    level_type: int
    level: int
    ref_time: dt.datetime
    lats: np.ndarray
    lons: np.ndarray
    values: np.ndarray  # (Nj, Ni) float64, NaN where bitmap masks
    attrs: dict = field(default_factory=dict)


def parse_grib2(content: bytes) -> list[GRIB2Message]:
    msgs: list[GRIB2Message] = []
    pos = 0
    while True:
        pos = content.find(b"GRIB", pos)
        if pos < 0:
            break
        edition = content[pos + 7]
        if edition != 2:
            raise GRIB2Error(f"GRIB edition {edition} (use sources/grib1 for ed.1)")
        total_len = _u(content, pos + 8, 8)
        msgs.append(_parse_message(content[pos : pos + total_len]))
        pos += total_len
    if not msgs:
        raise GRIB2Error("not a GRIB2 file (no GRIB indicator found)")
    return msgs


def _parse_message(m: bytes) -> GRIB2Message:
    if m[-4:] != b"7777":
        raise GRIB2Error("message missing 7777 end section")
    discipline = m[6]
    p = 16
    ref_time = None
    grid = None
    product = None
    packing = None
    bitmap: np.ndarray | None = None
    values: np.ndarray | None = None

    while p < len(m) - 4:
        sec_len = _u(m, p, 4)
        sec_num = m[p + 4]
        s = m[p : p + sec_len]
        if sec_num == 1:
            year = _u(s, 12, 2)
            ref_time = dt.datetime(year, s[14], s[15], s[16], s[17], s[18])
        elif sec_num == 3:
            grid = _parse_grid(s)
        elif sec_num == 4:
            tmpl = _u(s, 7, 2)
            if tmpl != 0:
                raise GRIB2Error(f"product definition template 4.{tmpl} not supported")
            product = {
                "category": s[9],
                "number": s[10],
                "level_type": s[22],
                "level_scale": s[23],
                "level_value": _u(s, 24, 4),
            }
        elif sec_num == 5:
            tmpl = _u(s, 9, 2)
            if tmpl != 0:
                raise GRIB2Error(f"data representation template 5.{tmpl} not supported")
            packing = {
                "n_points": _u(s, 5, 4),
                "ref": struct.unpack(">f", s[11:15])[0],
                "binary_scale": _s16(s, 15),
                "decimal_scale": _s16(s, 17),
                "bits": s[19],
            }
        elif sec_num == 6:
            indicator = s[5]
            if indicator == 0:
                nbits = (sec_len - 6) * 8
                bitmap = np.unpackbits(np.frombuffer(s[6:], dtype=np.uint8))[:nbits].astype(bool)
            elif indicator != 255:
                raise GRIB2Error(f"predefined bitmap {indicator} not supported")
        elif sec_num == 7:
            if packing is None:
                raise GRIB2Error("data section before data representation section")
            n = packing["n_points"]
            if packing["bits"] == 0:
                present = np.full(n, packing["ref"] / 10.0 ** packing["decimal_scale"])
            else:
                x = _unpack_bits(s[5:], n, packing["bits"])
                present = (packing["ref"] + x * 2.0 ** packing["binary_scale"]) / (
                    10.0 ** packing["decimal_scale"]
                )
            values = present
        p += sec_len

    if not all((ref_time, grid, product, packing)) or values is None:
        raise GRIB2Error("incomplete GRIB2 message (missing required section)")
    ni, nj = grid["ni"], grid["nj"]
    if bitmap is not None:
        full = np.full(ni * nj, np.nan)
        full[bitmap[: ni * nj]] = values  # trim packbits byte padding
        values = full
    return GRIB2Message(
        discipline=discipline,
        parameter_category=product["category"],
        parameter_number=product["number"],
        level_type=product["level_type"],
        level=product["level_value"] // 10 ** product["level_scale"]
        if product["level_scale"] < 100
        else product["level_value"],
        ref_time=ref_time,
        lats=grid["lats"],
        lons=grid["lons"],
        values=values.reshape(nj, ni),
        attrs={k: packing[k] for k in ("binary_scale", "decimal_scale", "bits")},
    )


def _s16(b: bytes, off: int) -> int:
    raw = _u(b, off, 2)
    return -(raw & 0x7FFF) if raw & 0x8000 else raw


def _s16_bytes(v: int) -> bytes:
    raw = (abs(v) | 0x8000) if v < 0 else v
    return raw.to_bytes(2, "big")


def _parse_grid(s: bytes) -> dict:
    tmpl = _u(s, 12, 2)
    if tmpl != 0:
        raise GRIB2Error(f"grid definition template 3.{tmpl} not supported (lat/lon only)")
    ni, nj = _u(s, 30, 4), _u(s, 34, 4)
    la1, lo1 = _s32(s, 46), _s32(s, 50)
    la2, lo2 = _s32(s, 55), _s32(s, 59)
    scan = s[71]
    if scan != 0:
        raise GRIB2Error(f"scanning mode {scan:#x} not supported (W→E, N→S only)")
    return {
        "ni": ni,
        "nj": nj,
        "lats": np.linspace(la1 / 1e6, la2 / 1e6, nj),
        "lons": np.linspace(lo1 / 1e6, lo2 / 1e6, ni),
    }


# ---------------------------------------------------------------------------
# writer (test fixture generation)
# ---------------------------------------------------------------------------


def write_grib2(
    messages: list[GRIB2Message],
    bits_per_value: int = 16,
    decimal_scale: int = 2,
) -> bytes:
    """Concatenated GRIB2 messages with template 5.0 simple packing; NaNs
    become a section-6 bitmap. Same lossy-at-precision contract as any real
    GRIB product."""
    return b"".join(_write_message(m, bits_per_value, decimal_scale) for m in messages)


def _write_message(msg: GRIB2Message, bits_per_value: int, decimal_scale: int) -> bytes:
    nj, ni = msg.values.shape
    flat = msg.values.reshape(-1)
    mask = ~np.isnan(flat)
    has_bms = bool((~mask).any())
    present = flat[mask]
    if present.size == 0:
        raise GRIB2Error("cannot encode an all-missing slab")
    scaled = present * 10.0**decimal_scale
    rmin = float(np.float32(scaled.min()))
    e = 0
    while (scaled.max() - rmin) / 2.0**e > (1 << bits_per_value) - 1:
        e += 1
    x = np.clip(
        np.rint((scaled - rmin) / 2.0**e), 0, (1 << bits_per_value) - 1
    ).astype("int64")

    t = msg.ref_time
    sec1 = (
        (21).to_bytes(4, "big") + bytes([1]) + (0).to_bytes(2, "big")
        + (0).to_bytes(2, "big") + bytes([2, 1, 1])
        + t.year.to_bytes(2, "big")
        + bytes([t.month, t.day, t.hour, t.minute, t.second, 0, 1])
    )

    sec3 = bytearray(72)
    sec3[0:4] = (72).to_bytes(4, "big")
    sec3[4] = 3
    sec3[5] = 0  # grid source
    sec3[6:10] = (ni * nj).to_bytes(4, "big")
    sec3[10] = 0  # no optional list
    sec3[11] = 0
    sec3[12:14] = (0).to_bytes(2, "big")  # template 3.0
    sec3[14] = 6  # earth shape
    # scale factors/values for radii left zero (15..29)
    sec3[30:34] = ni.to_bytes(4, "big")
    sec3[34:38] = nj.to_bytes(4, "big")
    # basic angle (38..45) zero
    sec3[46:50] = _s32_bytes(int(round(msg.lats[0] * 1e6)))
    sec3[50:54] = _s32_bytes(int(round(msg.lons[0] * 1e6)))
    sec3[54] = 0x30  # resolution/component flags: di/dj given
    sec3[55:59] = _s32_bytes(int(round(msg.lats[-1] * 1e6)))
    sec3[59:63] = _s32_bytes(int(round(msg.lons[-1] * 1e6)))
    di = abs(msg.lons[1] - msg.lons[0]) if ni > 1 else 0.0
    dj = abs(msg.lats[1] - msg.lats[0]) if nj > 1 else 0.0
    sec3[63:67] = int(round(di * 1e6)).to_bytes(4, "big")
    sec3[67:71] = int(round(dj * 1e6)).to_bytes(4, "big")
    sec3[71] = 0  # scanning mode

    sec4 = bytearray(34)
    sec4[0:4] = (34).to_bytes(4, "big")
    sec4[4] = 4
    sec4[5:7] = (0).to_bytes(2, "big")  # no coord values
    sec4[7:9] = (0).to_bytes(2, "big")  # template 4.0
    sec4[9] = msg.parameter_category
    sec4[10] = msg.parameter_number
    sec4[11] = 0  # generating process: analysis
    sec4[17] = 1  # time unit: hour
    sec4[18:22] = (0).to_bytes(4, "big")  # forecast time 0
    sec4[22] = msg.level_type
    sec4[23] = 0  # level scale factor
    sec4[24:28] = int(msg.level).to_bytes(4, "big")
    sec4[28] = 255  # second surface: missing
    sec4[29] = 0xFF
    sec4[30:34] = (0xFFFFFFFF).to_bytes(4, "big")

    sec5 = (
        (21).to_bytes(4, "big") + bytes([5])
        + present.size.to_bytes(4, "big")
        + (0).to_bytes(2, "big")  # template 5.0
        + struct.pack(">f", rmin)
        + _s16_bytes(e)
        + _s16_bytes(decimal_scale)
        + bytes([bits_per_value, 0])  # original field type: float
    )

    if has_bms:
        packed_map = np.packbits(mask.astype(np.uint8)).tobytes()
        sec6 = (6 + len(packed_map)).to_bytes(4, "big") + bytes([6, 0]) + packed_map
    else:
        sec6 = (6).to_bytes(4, "big") + bytes([6, 255])

    packed = _pack_bits(x, bits_per_value)
    sec7 = (5 + len(packed)).to_bytes(4, "big") + bytes([7]) + packed

    body = sec1 + bytes(sec3) + bytes(sec4) + sec5 + sec6 + sec7 + b"7777"
    total = 16 + len(body)
    head = b"GRIB" + b"\x00\x00" + bytes([msg.discipline, 2]) + total.to_bytes(8, "big")
    return head + body


# ---------------------------------------------------------------------------
# decoder adapter (S8 for ingest)
# ---------------------------------------------------------------------------


def grib2_decoder(desc, parameter: tuple[int, int] | None = None):
    """Decoder for ``read_binary_gridded`` over GRIB2 bytes — same tall-row
    contract as the other decoders; ``parameter`` filters by
    (category, number)."""
    import pandas as pd

    def decode(path: str, content: bytes) -> pd.DataFrame:
        frames = []
        for msg in parse_grib2(content):
            if parameter is not None and (
                (msg.parameter_category, msg.parameter_number) != tuple(parameter)
            ):
                continue
            nj, ni = msg.values.shape
            frames.append(
                pd.DataFrame(
                    {
                        desc.time_dim: np.repeat(
                            np.datetime64(msg.ref_time, "us"), nj * ni
                        ),
                        "latitude": np.repeat(msg.lats, ni),
                        "longitude": np.tile(msg.lons, nj),
                        desc.data_var: msg.values.reshape(-1),
                    }
                )
            )
        if not frames:
            raise GRIB2Error(f"{path}: no matching GRIB2 messages")
        return pd.concat(frames, ignore_index=True)

    return decode
