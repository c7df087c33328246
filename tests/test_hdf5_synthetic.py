"""Hand-built HDF5 fixtures for the structures the reference's h5py path
reads but the real netCDF4-classic fixtures never exercise: dense link
storage (link-info message -> fractal heap + link-name v2 B-tree, the layout
newer h5py emits) and variable-length string data/attributes resolved
through the global heap (spec III.E/III.G/IV.A.2 — bytes written directly
from the HDF5 File Format Specification, no h5py involved)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from zarr_climate_etl_ipfs_spark.sources.hdf5 import HDF5Error, parse_hdf5

UNDEF = 0xFFFFFFFFFFFFFFFF


def _v1_header(messages: list[tuple[int, bytes]]) -> bytes:
    """Object header v1: version, #messages, ref count, header size, then
    8-byte message headers (type, size, flags, reserved)."""
    body = b"".join(
        struct.pack("<HHB3x", mtype, len(m), 0) + m for mtype, m in messages
    )
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def _dataspace(dims: tuple[int, ...]) -> bytes:
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims
    )


def _dt_f64() -> bytes:
    return struct.pack("<BB2xI", 0x11, 0, 8)  # ver1 class1 float, LE, 8 bytes


def _dt_vlen_str() -> bytes:
    return struct.pack("<BB2xI", 0x19, 0x01, 16)  # ver1 class9, type=string


def _layout_contiguous(addr: int, size: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, size) + b"\x00" * 6  # pad to 24


def _link_msg(name: str, oh_addr: int) -> bytes:
    nb = name.encode()
    return struct.pack("<BBB", 1, 0, len(nb)) + nb + struct.pack("<Q", oh_addr)


def _vlen_descriptor(length: int, gcol: int, idx: int) -> bytes:
    return struct.pack("<IQI", length, gcol, idx)


@pytest.fixture(scope="module")
def dense_vlen_bytes() -> bytes:
    buf = bytearray(16384)
    ROOT_OH, TEMP_OH, LAB_OH = 48, 256, 768
    FRHP_A, FHDB_A, BTHD_A, BTLF_A = 1280, 1536, 2048, 2304
    TEMP_DATA, LAB_DESC, GCOL_A = 4096, 4352, 4608

    # superblock v2
    buf[0:8] = b"\x89HDF\r\n\x1a\n"
    buf[8:12] = bytes([2, 8, 8, 0])
    struct.pack_into("<QQQQ", buf, 12, 0, UNDEF, len(buf), ROOT_OH)

    # root object header v2 with ONLY a link-info message (dense links)
    link_info = struct.pack("<BBQQ", 0, 0, FRHP_A, BTHD_A)
    msg = struct.pack("<BHB", 2, len(link_info), 0) + link_info
    buf[ROOT_OH : ROOT_OH + 4] = b"OHDR"
    buf[ROOT_OH + 4 : ROOT_OH + 6] = bytes([2, 0])  # version, flags (1-byte size)
    buf[ROOT_OH + 6] = len(msg)
    buf[ROOT_OH + 7 : ROOT_OH + 7 + len(msg)] = msg

    # datasets: 'temp' float64 2x3 contiguous; 'labels' vlen-string 1-D n=3
    # with a vlen-string attribute
    temp = _v1_header(
        [
            (1, _dataspace((2, 3))),
            (3, _dt_f64()),
            (8, _layout_contiguous(TEMP_DATA, 48)),
        ]
    )
    buf[TEMP_OH : TEMP_OH + len(temp)] = temp

    attr_name = b"note\x00\x00\x00\x00"  # "note" padded to 8
    attr = (
        struct.pack("<BxHHH", 1, 5, 8, 8)
        + attr_name
        + _dt_vlen_str()
        + _dataspace(())
        + _vlen_descriptor(16, GCOL_A, 4)
    )
    labels = _v1_header(
        [
            (1, _dataspace((3,))),
            (3, _dt_vlen_str()),
            (8, _layout_contiguous(LAB_DESC, 48)),
            (12, attr),
        ]
    )
    buf[LAB_OH : LAB_OH + len(labels)] = labels

    # fractal heap: header + one root direct block holding the link messages
    buf[FRHP_A : FRHP_A + 4] = b"FRHP"
    struct.pack_into("<BHH", buf, FRHP_A + 4, 0, 7, 0)  # ver, id len, no filters
    struct.pack_into(
        "<HQQHHQH", buf, FRHP_A + 110, 4, 512, 4096, 32, 1, FHDB_A, 0
    )  # width, start, max direct, max heap bits (off_size=4), snr, root, rows=0
    buf[FHDB_A : FHDB_A + 4] = b"FHDB"
    buf[FHDB_A + 4] = 0
    struct.pack_into("<Q", buf, FHDB_A + 5, FRHP_A)
    struct.pack_into("<I", buf, FHDB_A + 13, 0)  # block offset (4 bytes)
    l_temp, l_lab = _link_msg("temp", TEMP_OH), _link_msg("labels", LAB_OH)
    off_temp, off_lab = 17, 17 + len(l_temp)
    buf[FHDB_A + off_temp : FHDB_A + off_temp + len(l_temp)] = l_temp
    buf[FHDB_A + off_lab : FHDB_A + off_lab + len(l_lab)] = l_lab

    # link-name v2 B-tree: header + leaf with type-5 records
    buf[BTHD_A : BTHD_A + 4] = b"BTHD"
    struct.pack_into("<BBIHHBBQH", buf, BTHD_A + 4, 0, 5, 512, 11, 0, 100, 40, BTLF_A, 2)
    buf[BTLF_A : BTLF_A + 4] = b"BTLF"
    buf[BTLF_A + 4 : BTLF_A + 6] = bytes([0, 5])
    recs = b""
    for heap_off, heap_len in ((off_temp, len(l_temp)), (off_lab, len(l_lab))):
        recs += struct.pack("<IBIH", 0xABCD, 0, heap_off, heap_len)
    buf[BTLF_A + 6 : BTLF_A + 6 + len(recs)] = recs

    # data regions
    vals = np.arange(6, dtype="<f8") * 1.5
    buf[TEMP_DATA : TEMP_DATA + 48] = vals.tobytes()
    strings = [b"alpha", b"bee", b"gamma", b"vlen attr value!"]
    descs = b"".join(
        _vlen_descriptor(len(s), GCOL_A, i + 1) for i, s in enumerate(strings[:3])
    )
    buf[LAB_DESC : LAB_DESC + len(descs)] = descs
    buf[GCOL_A : GCOL_A + 4] = b"GCOL"
    buf[GCOL_A + 4] = 1
    struct.pack_into("<Q", buf, GCOL_A + 8, 512)
    p = GCOL_A + 16
    for i, s in enumerate(strings):
        struct.pack_into("<HH4xQ", buf, p, i + 1, 1, len(s))
        buf[p + 16 : p + 16 + len(s)] = s
        p += 16 + ((len(s) + 7) & ~7)
    return bytes(buf)


def test_dense_links_discovered(dense_vlen_bytes):
    h5 = parse_hdf5(dense_vlen_bytes)
    assert set(h5.variables) == {"temp", "labels"}


def test_contiguous_data_behind_dense_links(dense_vlen_bytes):
    h5 = parse_hdf5(dense_vlen_bytes)
    np.testing.assert_array_equal(
        h5.read("temp"), (np.arange(6, dtype="<f8") * 1.5).reshape(2, 3)
    )


def test_vlen_string_data_read(dense_vlen_bytes):
    h5 = parse_hdf5(dense_vlen_bytes)
    v = h5.variables["labels"]
    assert v.dtype.is_vlen_string
    assert list(h5.read("labels")) == ["alpha", "bee", "gamma"]


def test_vlen_string_attribute_decoded(dense_vlen_bytes):
    h5 = parse_hdf5(dense_vlen_bytes)
    assert h5.variables["labels"].attrs["note"] == "vlen attr value!"


def test_chunked_vlen_still_clear_error(dense_vlen_bytes):
    """Chunked VLEN stays out of scope with a clear error, not garbage."""
    h5 = parse_hdf5(dense_vlen_bytes)
    h5.variables["labels"].layout_class = 2
    with pytest.raises(HDF5Error, match="chunked VLEN"):
        h5.read("labels")


def test_malformed_foreign_bytes_single_exception_contract():
    """Mutation fuzz (the grib2/blosc hardening bar): forged addresses,
    sizes, filter pipelines and dataspaces must raise HDF5Error — never a
    raw struct/numpy/zlib error or an implausible allocation (element
    count capped at 2^28 BEFORE buffer/decompress work, since chunked
    deflate data can legally exceed the file size). An 8000-trial sweep
    ran clean when this landed; 1500 trials stay as the regression net."""
    import random as _random
    import warnings as _warnings

    from zarr_climate_etl_ipfs_spark.sources.hdf5write import write_hdf5

    raw = write_hdf5(
        {
            "time": (("time",), np.arange(5, dtype=np.int32),
                     {"units": "days since 2021-01-01"}),
            "latitude": (("latitude",), np.array([10.0, 20.0], np.float32), {}),
            "data": (("time", "latitude"),
                     np.arange(10, dtype=np.float32).reshape(5, 2), {}),
        },
        chunks={"data": (2, 2)},
        compress=2,
    )
    rng = _random.Random(7)
    # mutated scale/heap octets legally produce inf/0-division values
    # and tolerated-attr skips - the contract under test is exceptions
    _warnings.simplefilter('ignore')
    for trial in range(1500):
        mut = bytearray(raw)
        for _ in range(rng.randint(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        if trial % 5 == 0:
            mut = mut[: rng.randrange(9, len(mut))]
        try:
            f = parse_hdf5(bytes(mut))
            for nm in f.variables:
                f.read(nm)
        except HDF5Error:
            pass
