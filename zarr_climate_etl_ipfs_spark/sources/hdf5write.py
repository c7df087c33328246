"""Pure-numpy HDF5 (NetCDF4-style) WRITER — the read path's missing half.

The reference's ecosystem consumes NetCDF4/HDF5 everywhere (xarray's
default engine; the reference's own system fixtures are NetCDF4), and
this repo already READS the format from the published spec
(:mod:`.hdf5`, golden-validated against the reference's h5py-written
fixtures). This module completes the matrix: serialize gridded arrays
to HDF5 bytes targeting the same on-disk layout h5py/netCDF4 write.
Mirrors :func:`zarr_climate_etl_ipfs_spark.sources.netcdf3.
write_netcdf3`'s shape: ``variables`` maps name → (dims, array, attrs).

Interop grade: TEST-GRADE, self-validated (same framing as
:mod:`.ccsds_aec`). No h5py/netCDF4 wheel exists in this environment,
so validation is (a) round-trip through the in-repo reader and (b) that
reader's independent golden fixtures written BY h5py — which anchors
the reader, not this writer: a writer bug in a structure the fixtures
don't exercise could pass self-validation while foreign readers reject
the file. Before trusting these bytes with a foreign consumer, run an
h5py/netCDF4 cross-check where those wheels exist.

Layout written (all from the public HDF5 File Format Specification):

* superblock v1 (offsets/lengths 8, group leaf/internal K sized to the
  file so every group structure is a single node, indexed-storage K
  sized to the largest chunk grid so each chunk B-tree is one leaf);
* OLD-STYLE root group — symbol-table message → v1 group B-tree +
  local heap + SNOD — the most universally readable group flavor;
* v1 object headers per dataset: dataspace v1, datatype v1 (fixed /
  IEEE float / fixed string classes), data layout v3 (contiguous, or
  chunked with a v1 raw-data B-tree), filter pipeline v1
  (shuffle + deflate), attribute messages v1;
* netCDF4 conventions: 1-D coordinate variables carry
  ``CLASS="DIMENSION_SCALE"`` / ``NAME``, data variables carry a real
  ``DIMENSION_LIST`` attribute — a vlen-sequence-of-object-reference
  array pointing at the scales through a global heap collection
  (GCOL), the exact wiring h5py/netCDF4 write — plus a
  ``_NCProperties`` root attribute.

Scale note: one file is assembled in memory by one task — the format
is inherently single-writer (central superblock/B-trees). The 100 TB
path shards the dataset across many files (one per time bucket /
partition, the same sharding the ingest side's ``binaryFile`` reader
assumes) and writes each file independently inside a task; this module
is the per-file kernel, not the distribution strategy.

Validation: round-trips through :func:`..hdf5.parse_hdf5` — the reader
that decodes the reference's own h5py fixtures bit-exactly — including
chunk B-tree walks, shuffle+deflate filters, attribute decode, and the
GCOL object layout (read back via the reader's fixture-validated
``_gcol_object``).
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

from zarr_climate_etl_ipfs_spark.sources.hdf5 import MAGIC, UNDEF, HDF5Error

__all__ = ["write_hdf5"]


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# ---------------------------------------------------------------------------
# datatype / dataspace / message builders (spec IV.A.2)
# ---------------------------------------------------------------------------


def _dt_fixed(size: int, signed: bool, big: bool = False) -> bytes:
    bits0 = (0x01 if big else 0) | (0x08 if signed else 0)
    return struct.pack("<BBBBIHH", 0x10, bits0, 0, 0, size, 0, 8 * size)


_FLOAT_PROPS = {  # size -> (sign_loc, exp_loc, exp_size, mant_size, bias)
    4: (31, 23, 8, 23, 127),
    8: (63, 52, 11, 52, 1023),
}


def _dt_float(size: int) -> bytes:
    sign, exp_loc, exp_sz, mant_sz, bias = _FLOAT_PROPS[size]
    return struct.pack(
        "<BBBBIHHBBBBI",
        0x11, 0x20, sign, 0, size, 0, 8 * size,
        exp_loc, exp_sz, 0, mant_sz, bias,
    )


def _dt_string(size: int) -> bytes:
    # null-terminated ASCII fixed string
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)


def _dt_reference() -> bytes:
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)  # object reference


def _dt_vlen_of(base: bytes) -> bytes:
    # vlen class 9, type 0 = sequence; element = 16-byte heap descriptor
    return struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + base


def _dt_for(dtype: np.dtype) -> bytes:
    big = dtype.byteorder == ">"
    if dtype.kind == "f":
        if dtype.itemsize not in _FLOAT_PROPS or big:
            raise HDF5Error(f"no HDF5 writer mapping for dtype {dtype}")
        return _dt_float(dtype.itemsize)
    if dtype.kind in ("i", "u"):
        return _dt_fixed(dtype.itemsize, dtype.kind == "i", big)
    raise HDF5Error(f"no HDF5 writer mapping for dtype {dtype} (numeric only)")


def _ds_simple(shape: tuple[int, ...]) -> bytes:
    if not shape:
        return struct.pack("<BBBB4x", 1, 0, 0, 0)
    dims = b"".join(struct.pack("<Q", s) for s in shape)
    return struct.pack("<BBBB4x", 1, len(shape), 1, 0) + dims + dims  # max = cur


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body


def _object_header(msgs: list[bytes]) -> bytes:
    body = b"".join(msgs)
    return struct.pack("<BBHIII", 1, 0, len(msgs), 1, len(body), 0) + body


def _attr_body(name: str, dt: bytes, ds: bytes, value: bytes) -> bytes:
    nb = name.encode() + b"\x00"
    return (
        struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
        + _pad8(nb) + _pad8(dt) + _pad8(ds) + value
    )


def _attr_msg(name: str, value: Any) -> bytes:
    """One v1 attribute message from a python/numpy value (strings as
    fixed null-terminated ASCII, numbers as i8/f8 scalars, numeric
    sequences as 1-D arrays — the classes the reader decodes)."""
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        return _msg(0x000C, _attr_body(name, _dt_string(len(raw)), _ds_simple(()), raw))
    if isinstance(value, (bool, int, np.integer)):
        return _msg(
            0x000C,
            _attr_body(
                name, _dt_fixed(8, True), _ds_simple(()),
                struct.pack("<q", int(value)),
            ),
        )
    if isinstance(value, (float, np.floating)):
        return _msg(
            0x000C,
            _attr_body(name, _dt_float(8), _ds_simple(()), struct.pack("<d", float(value))),
        )
    arr = np.asarray(value)
    if arr.dtype.kind not in ("i", "u", "f"):
        raise HDF5Error(f"attribute {name!r}: unsupported value type {type(value)}")
    arr = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
    return _msg(
        0x000C,
        _attr_body(name, _dt_for(arr.dtype), _ds_simple(arr.shape), arr.tobytes()),
    )


# ---------------------------------------------------------------------------
# the writer
# ---------------------------------------------------------------------------


class _Out:
    def __init__(self) -> None:
        self.buf = bytearray()

    def tell(self) -> int:
        return len(self.buf)

    def write(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def patch_u64(self, pos: int, value: int) -> None:
        struct.pack_into("<Q", self.buf, pos, value)


def write_hdf5(
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict[str, Any]]],
    global_attrs: dict[str, Any] | None = None,
    chunks: dict[str, tuple[int, ...]] | None = None,
    compress: int | None = None,
    dimension_scales: bool = True,
) -> bytes:
    """Serialize arrays to HDF5 bytes (netCDF4-flavored).

    ``variables`` maps name → (dims, array, attrs), like
    :func:`..netcdf3.write_netcdf3`. ``chunks`` switches a variable to
    chunked layout; ``compress`` (a deflate level) applies
    shuffle+deflate to every CHUNKED variable. With
    ``dimension_scales``, 1-D variables named after a dimension become
    netCDF4 dimension scales and multi-dim variables get a real
    ``DIMENSION_LIST`` (vlen object references via a global heap).
    """
    chunks = dict(chunks or {})
    names = sorted(variables)  # symbol tables store links name-sorted
    dim_sizes: dict[str, int] = {}
    arrays: dict[str, np.ndarray] = {}
    for nm in names:
        vdims, arr, _attrs = variables[nm]
        arr = np.asarray(arr)
        if len(vdims) != arr.ndim:
            raise HDF5Error(f"{nm}: {len(vdims)} dims for a {arr.ndim}-d array")
        for d, s in zip(vdims, arr.shape):
            if dim_sizes.setdefault(d, s) != s:
                raise HDF5Error(f"dim {d!r}: conflicting sizes {dim_sizes[d]} != {s}")
        arrays[nm] = arr.astype(arr.dtype.newbyteorder("<"), copy=False)

    is_scale = {
        nm: dimension_scales
        and len(variables[nm][0]) == 1
        and variables[nm][0][0] == nm
        for nm in names
    }

    # K parameters sized so every structure is a single node
    leaf_k = max(4, len(names))
    internal_k = 16
    max_chunks = 1
    for nm in names:
        if nm in chunks:
            grid = [
                -(-s // c) for s, c in zip(arrays[nm].shape, chunks[nm])
            ]
            max_chunks = max(max_chunks, int(np.prod(grid)))
    indexed_k = max(16, -(-max_chunks // 2))

    out = _Out()

    # -- superblock v1 ------------------------------------------------------
    out.write(MAGIC)
    out.write(struct.pack("<BBBBBBBB", 1, 0, 0, 0, 0, 8, 8, 0))
    out.write(struct.pack("<HHI", leaf_k, internal_k, 0))
    out.write(struct.pack("<HH", indexed_k, 0))
    out.write(struct.pack("<QQ", 0, UNDEF))  # base, free-space
    eof_pos = out.write(struct.pack("<Q", 0))  # end-of-file: patched last
    out.write(struct.pack("<Q", UNDEF))  # driver info
    # root symbol-table entry: name offset 0, header address (patched),
    # cache type 0
    root_oh_pos = out.write(struct.pack("<QQII16x", 0, 0, 0, 0)) + 8

    # -- root group object header ------------------------------------------
    root_msgs = [_msg(0x0011, struct.pack("<QQ", 0, 0))]  # btree+heap patched
    if dimension_scales:
        root_msgs.append(
            _attr_msg("_NCProperties", "version=2,pyspark_gridded_engine=1")
        )
    for k, v in (global_attrs or {}).items():
        root_msgs.append(_attr_msg(k, v))
    root_oh_addr = out.write(_object_header(root_msgs))
    out.patch_u64(root_oh_pos, root_oh_addr)
    stab_body = root_oh_addr + 16 + 8  # first message body (btree, heap addrs)

    # -- local heap with the link names ------------------------------------
    heap_data = bytearray(b"\x00" * 8)  # offset 0 decodes as ""
    name_off: dict[str, int] = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += _pad8(nm.encode() + b"\x00")
    heap_addr = out.write(
        b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, 0)
    )
    heap_data_addr = out.write(bytes(heap_data))
    out.patch_u64(heap_addr + 24, heap_data_addr)

    # -- group B-tree (one leaf) + SNOD -------------------------------------
    bt_cap = 24 + (2 * internal_k + 1) * 8 + 2 * internal_k * 8
    bt = bytearray(bt_cap)
    bt[0:4] = b"TREE"
    bt[4], bt[5] = 0, 0  # node type group, leaf level
    struct.pack_into("<H", bt, 6, 1)
    struct.pack_into("<QQ", bt, 8, UNDEF, UNDEF)
    struct.pack_into("<Q", bt, 24, 0)  # key0: "" (heap offset 0)
    snod_pos_in_bt = 32
    struct.pack_into("<Q", bt, 40, name_off[names[-1]] if names else 0)  # key1
    btree_addr = out.write(bytes(bt))
    out.patch_u64(stab_body, btree_addr)
    out.patch_u64(stab_body + 8, heap_addr)

    snod = bytearray(8 + 2 * leaf_k * 40)
    snod[0:4] = b"SNOD"
    snod[4] = 1
    struct.pack_into("<H", snod, 6, len(names))
    snod_addr = out.write(bytes(snod))
    out.patch_u64(btree_addr + snod_pos_in_bt, snod_addr)

    # -- per-variable object headers ----------------------------------------
    oh_addr: dict[str, int] = {}
    layout_fix: dict[str, int] = {}  # name -> file pos of the layout address
    dimlist_fix: dict[str, int] = {}  # name -> file pos of the attr value
    for i, nm in enumerate(names):
        vdims, _arr, vattrs = variables[nm]
        arr = arrays[nm]
        msgs = [
            _msg(0x0001, _ds_simple(arr.shape)),
            _msg(0x0003, _dt_for(arr.dtype)),
        ]
        chunked = nm in chunks
        filters: list[tuple[int, tuple[int, ...]]] = []
        if chunked and compress is not None:
            filters = [(2, (arr.dtype.itemsize,)), (1, (int(compress),))]
            fb = struct.pack("<BB6x", 1, len(filters))
            for fid, vals in filters:
                fb += struct.pack("<HHHH", fid, 0, 0, len(vals))
                fb += b"".join(struct.pack("<I", v) for v in vals)
                if len(vals) % 2:
                    fb += b"\x00" * 4
            msgs.append(_msg(0x000B, fb))
        if chunked:
            cs = chunks[nm]
            if len(cs) != arr.ndim:
                raise HDF5Error(f"{nm}: chunk rank {len(cs)} != array rank {arr.ndim}")
            lb = struct.pack("<BBB", 3, 2, arr.ndim + 1) + struct.pack("<Q", 0)
            lb += b"".join(struct.pack("<I", c) for c in cs)
            lb += struct.pack("<I", arr.dtype.itemsize)
            layout_off_in_body = 3
        else:
            lb = struct.pack("<BBQQ", 3, 1, 0, arr.size * arr.dtype.itemsize)
            layout_off_in_body = 2
        layout_msg_index = len(msgs)
        msgs.append(_msg(0x0008, lb))
        if is_scale[nm]:
            msgs.append(_attr_msg("CLASS", "DIMENSION_SCALE"))
            msgs.append(_attr_msg("NAME", nm))
        dimlist_msg_index = -1
        if dimension_scales and not is_scale[nm] and any(
            d in names and is_scale.get(d) for d in vdims
        ):
            # DIMENSION_LIST: rank-1 array of vlen sequences of object
            # references; each element's 16-byte descriptor (count, GCOL
            # address, object index) is patched once the heap is written
            value = b"\x00" * (16 * len(vdims))
            dimlist_msg_index = len(msgs)
            msgs.append(
                _msg(
                    0x000C,
                    _attr_body(
                        "DIMENSION_LIST",
                        _dt_vlen_of(_dt_reference()),
                        _ds_simple((len(vdims),)),
                        value,
                    ),
                )
            )
        for k, v in vattrs.items():
            msgs.append(_attr_msg(k, v))

        addr = out.write(_object_header(msgs))
        oh_addr[nm] = addr
        # locate the layout message body within the file to patch its address
        pos = addr + 16
        for j, m in enumerate(msgs):
            if j == layout_msg_index:
                layout_fix[nm] = pos + 8 + layout_off_in_body
            if j == dimlist_msg_index:
                # attr body: 8 header + padded name/dt/ds then value
                nb = len("DIMENSION_LIST") + 1
                dtb = len(_dt_vlen_of(_dt_reference()))
                dsb = len(_ds_simple((len(vdims),)))
                dimlist_fix[nm] = (
                    pos + 8 + 8
                    + ((nb + 7) & ~7) + ((dtb + 7) & ~7) + ((dsb + 7) & ~7)
                )
            pos += len(m)
        struct.pack_into(
            "<QQI", out.buf, snod_addr + 8 + 40 * i, name_off[nm], addr, 0
        )

    # -- data ---------------------------------------------------------------
    for nm in names:
        arr = arrays[nm]
        if nm not in chunks:
            daddr = out.write(arr.tobytes())
            out.patch_u64(layout_fix[nm], daddr)
            continue
        cs = chunks[nm]
        entries = []  # (offsets, nbytes, addr)
        grid = [range(0, s, c) for s, c in zip(arr.shape, cs)]
        idx = [[]]
        for r in grid:
            idx = [g + [o] for g in idx for o in r]
        for offsets in idx:
            sel = tuple(
                slice(o, min(o + c, s)) for o, c, s in zip(offsets, cs, arr.shape)
            )
            block = np.zeros(cs, dtype=arr.dtype)
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
            raw = block.tobytes()
            if compress is not None:
                esize = arr.dtype.itemsize
                a = np.frombuffer(raw, dtype="u1")
                n = len(a) // esize
                raw = (
                    a[: n * esize].reshape(n, esize).T.tobytes()
                    + a[n * esize :].tobytes()
                )
                raw = zlib.compress(raw, int(compress))
            entries.append((offsets, len(raw), out.write(raw)))
        rank = arr.ndim
        key_size = 8 + 8 * (rank + 1)
        cap = 24 + (2 * indexed_k + 1) * key_size + 2 * indexed_k * 8
        node = bytearray(cap)
        node[0:4] = b"TREE"
        node[4], node[5] = 1, 0
        struct.pack_into("<H", node, 6, len(entries))
        struct.pack_into("<QQ", node, 8, UNDEF, UNDEF)
        p = 24
        for offsets, nb, addr in entries:
            struct.pack_into("<II", node, p, nb, 0)
            for j, o in enumerate(offsets):
                struct.pack_into("<Q", node, p + 8 + 8 * j, o)
            struct.pack_into("<Q", node, p + 8 + 8 * rank, 0)
            struct.pack_into("<Q", node, p + key_size, addr)
            p += key_size + 8
        # final key: one past the last chunk in every dimension
        struct.pack_into("<II", node, p, 0, 0)
        for j, s in enumerate(arr.shape):
            struct.pack_into("<Q", node, p + 8 + 8 * j, -(-s // cs[j]) * cs[j])
        bt_addr = out.write(bytes(node))
        out.patch_u64(layout_fix[nm], bt_addr)

    # -- global heap for DIMENSION_LIST references --------------------------
    if dimlist_fix:
        objs: list[bytes] = []
        patches: list[tuple[int, int]] = []  # (descriptor file pos, obj index)
        for nm, vpos in dimlist_fix.items():
            for j, d in enumerate(variables[nm][0]):
                ref = struct.pack("<Q", oh_addr[d]) if d in oh_addr else b"\x00" * 8
                objs.append(ref)
                patches.append((vpos + 16 * j, len(objs)))
        body = bytearray()
        for i, data in enumerate(objs, start=1):
            body += struct.pack("<HH4xQ", i, 1, len(data)) + _pad8(data)
        body += struct.pack("<HH4xQ", 0, 0, 0)  # free-space terminator
        total = 16 + len(body)
        gaddr = out.write(b"GCOL" + struct.pack("<B3xQ", 1, total) + bytes(body))
        for vpos, idx1 in patches:
            struct.pack_into("<IQI", out.buf, vpos, 1, gaddr, idx1)

    out.patch_u64(eof_pos, out.tell())
    return bytes(out.buf)
