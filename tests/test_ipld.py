"""IPFS/IPLD read-only import path (S23/S24 literal — r14 verdict ask #5).

Validates ``sources/ipld.py`` against a LOCAL fake HTTP gateway (stdlib
http.server) speaking the public path-gateway interface, serving the
reference's own CHIRPS kerchunk fixture re-published as a Zarr-on-IPLD DAG:
metadata docs inline in a DAG-CBOR root, chunk data as raw-block links —
both the plain-map and the IPLD-HashMap(HAMT) layouts. The DAG-CBOR blocks
are built by a test-side *encoder*, so the engine's from-scratch decoder is
checked against independently produced bytes (same oracle pattern as the
media codecs).
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from zarr_climate_etl_ipfs_spark.sources import ipld
from zarr_climate_etl_ipfs_spark.sources import zarr2 as z

_CHIRPS_REFS = "/root/reference/tests/unit/inputs/chirps_example_zarr.json"


# ---------------------------------------------------------------------------
# test-side DAG-CBOR encoder (independent of the module's decoder)
# ---------------------------------------------------------------------------


def _enc_head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 256:
        return bytes([(major << 5) | 24, n])
    if n < 65536:
        return bytes([(major << 5) | 25]) + n.to_bytes(2, "big")
    if n < 1 << 32:
        return bytes([(major << 5) | 26]) + n.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + n.to_bytes(8, "big")


def enc_cbor(v) -> bytes:
    if isinstance(v, ipld.CID):
        return _enc_head(6, 42) + enc_cbor(b"\x00" + v.bytes)
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if v is None:
        return b"\xf6"
    if isinstance(v, int):
        return _enc_head(0, v) if v >= 0 else _enc_head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _enc_head(2, len(v)) + v
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _enc_head(3, len(b)) + b
    if isinstance(v, list):
        return _enc_head(4, len(v)) + b"".join(enc_cbor(x) for x in v)
    if isinstance(v, dict):
        out = _enc_head(5, len(v))
        for k, val in v.items():
            out += enc_cbor(str(k)) + enc_cbor(val)
        return out
    raise TypeError(type(v))


# ---------------------------------------------------------------------------
# fake gateway
# ---------------------------------------------------------------------------


class _Gateway:
    """Minimal path gateway: /ipfs/<cid> serves stored blocks with their
    content type; /ipns/<name> 302-redirects to /ipfs/<root>."""

    def __init__(self):
        self.blocks: dict[str, tuple[bytes, str]] = {}
        self.names: dict[str, str] = {}
        self.hits: list[str] = []

        gw = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102
                pass

            def _serve(self, send_body: bool):
                gw.hits.append(self.path)
                if self.path.startswith("/ipns/"):
                    name = self.path[len("/ipns/"):]
                    cid = gw.names.get(name)
                    if cid is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(302)
                    self.send_header("Location", f"/ipfs/{cid}/")
                    self.send_header("X-Ipfs-Roots", cid)
                    self.end_headers()
                    return
                cid = self.path[len("/ipfs/"):].split("?")[0].rstrip("/")
                hit = gw.blocks.get(cid)
                if hit is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                body, ctype = hit
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if send_body:
                    self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                self._serve(True)

            def do_HEAD(self):  # noqa: N802
                self._serve(False)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"

    def put_raw(self, data: bytes) -> ipld.CID:
        cid = ipld.make_cidv1(0x55, hashlib.sha256(data).digest())
        self.blocks[str(cid)] = (data, "application/vnd.ipld.raw")
        return cid

    def put_dag(self, obj) -> ipld.CID:
        data = enc_cbor(obj)
        cid = ipld.make_cidv1(0x71, hashlib.sha256(data).digest())
        self.blocks[str(cid)] = (data, "application/vnd.ipld.dag-cbor")
        return cid

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def _chirps_key_bytes() -> dict[str, bytes]:
    refs = json.load(open(_CHIRPS_REFS))["refs"]
    out = {}
    for k, v in refs.items():
        if v.startswith("base64:"):
            out[k] = base64.b64decode(v[len("base64:"):])
        else:
            out[k] = v.encode("latin-1")
    return out


def _publish_plain(gw: _Gateway, keys: dict[str, bytes]) -> ipld.CID:
    """Nested-map layout: metadata inline (bytes), chunk data as raw links."""
    tree: dict = {}
    for key, data in keys.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if key.endswith((".zarray", ".zattrs", ".zgroup", ".zmetadata")):
            node[leaf] = data  # inline metadata
        else:
            node[leaf] = gw.put_raw(data)  # chunk → raw block link
    return gw.put_dag(tree)


def _publish_hamt(gw: _Gateway, keys: dict[str, bytes]) -> ipld.CID:
    """IPLD-HashMap layout: keys sharded over two child HAMT nodes, root
    carries the spec envelope (hashAlg/bucketSize)."""
    items = sorted(keys.items())
    half = len(items) // 2

    def bucket_node(chunk):
        data = []
        for k, v in chunk:
            val = v if k.endswith((".zarray", ".zattrs", ".zgroup")) else gw.put_raw(v)
            data.append([[k.encode("utf-8"), val]])
        return {"map": b"\xff", "data": data}

    child_a = gw.put_dag(bucket_node(items[:half]))
    child_b = gw.put_dag(bucket_node(items[half:]))
    root = {
        "hashAlg": 0x12,
        "bucketSize": 3,
        "map": b"\xff",
        "data": [child_a, child_b],
    }
    return gw.put_dag(root)


@pytest.fixture(scope="module")
def gw():
    g = _Gateway()
    yield g
    g.close()


# ---------------------------------------------------------------------------
# decoder / CID units
# ---------------------------------------------------------------------------


def test_dag_cbor_roundtrip_values():
    cid = ipld.make_cidv1(0x55, hashlib.sha256(b"x").digest())
    doc = {
        "int": 42,
        "neg": -7,
        "big": 1 << 40,
        "text": "héllo",
        "bytes": b"\x00\x01\xff",
        "arr": [1, "two", None, True, False],
        "f": 2.5,
        "link": cid,
        "nested": {"a": {"b": b"leaf"}},
    }
    got = ipld.decode_dag_cbor(enc_cbor(doc))
    assert got["int"] == 42 and got["neg"] == -7 and got["big"] == 1 << 40
    assert got["text"] == "héllo" and got["bytes"] == b"\x00\x01\xff"
    assert got["arr"] == [1, "two", None, True, False]
    assert got["f"] == 2.5
    assert isinstance(got["link"], ipld.CID) and str(got["link"]) == str(cid)
    assert got["nested"]["a"]["b"] == b"leaf"


def test_dag_cbor_rejects_malformed():
    with pytest.raises(ipld.IpldError, match="truncated"):
        ipld.decode_dag_cbor(b"\x62a")  # text len 2, 1 byte present
    with pytest.raises(ipld.IpldError, match="indefinite"):
        ipld.decode_dag_cbor(b"\x5f")  # indefinite bytes — not DAG-CBOR
    with pytest.raises(ipld.IpldError, match="tag 41"):
        ipld.decode_dag_cbor(bytes([0xD8, 41, 0x41, 0x00]))
    with pytest.raises(ipld.IpldError, match="trailing"):
        ipld.decode_dag_cbor(b"\x01\x02")
    with pytest.raises(ipld.IpldError, match="identity-prefixed"):
        # tag 42 with a text payload instead of identity-prefixed bytes
        ipld.decode_dag_cbor(bytes([0xD8, 42]) + enc_cbor("bafy"))


def test_cid_string_forms():
    digest = hashlib.sha256(b"block").digest()
    v1 = ipld.make_cidv1(0x55, digest)
    s = str(v1)
    assert s.startswith("b") and s == s.lower() and "=" not in s
    # CIDv0: bare sha2-256 multihash renders base58btc (starts Qm)
    v0 = ipld.cid_to_string(b"\x12\x20" + digest)
    assert v0.startswith("Qm")
    with pytest.raises(ipld.IpldError):
        ipld.cid_to_string(b"\x99\x01abc")


# ---------------------------------------------------------------------------
# gateway ops
# ---------------------------------------------------------------------------


def test_named_error_without_gateway(tmp_path):
    with pytest.raises(ipld.IpldError, match="no IPFS gateway"):
        ipld.ingest_ipld("bafyfake", str(tmp_path / "s"))
    with pytest.raises(ipld.IpldError, match="no IPFS gateway"):
        ipld.resolve_ipns("some-name", None)
    with pytest.raises(ipld.IpldError, match="no IPFS gateway"):
        ipld.block_get("bafyfake", None)


def test_resolve_ipns_via_redirect(gw):
    gw.names["chirps-final-p05"] = "bafyROOT123"
    assert ipld.resolve_ipns("chirps-final-p05", gw.url) == "bafyROOT123"
    with pytest.raises(ipld.IpldError, match="HTTP 404"):
        ipld.resolve_ipns("missing-name", gw.url)


def test_dag_get_dag_json_body(gw):
    """A gateway answering dag-json instead of raw CBOR still decodes:
    links normalize to CIDs, inline bytes decode."""
    inner = gw.put_raw(b"chunkbytes")
    body = json.dumps(
        {"k": {"/": str(inner)}, "m": {"/": {"bytes": base64.b64encode(b"md").decode()}}}
    ).encode()
    cid = "bafyJSONROOT"
    gw.blocks[cid] = (body, "application/vnd.ipld.dag-json")
    got = ipld.dag_get(cid, gw.url)
    assert isinstance(got["k"], ipld.CID) and str(got["k"]) == str(inner)
    assert got["m"] == b"md"


# ---------------------------------------------------------------------------
# end-to-end: CHIRPS fixture through the gateway, both layouts
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not __import__("os").path.exists(_CHIRPS_REFS), reason="reference fixture absent"
)
@pytest.mark.parametrize("layout", ["plain", "hamt"])
def test_ingest_ipld_chirps(gw, tmp_path, layout):
    keys = _chirps_key_bytes()
    root = (_publish_plain if layout == "plain" else _publish_hamt)(gw, keys)
    dest = str(tmp_path / f"chirps_{layout}")
    store = ipld.ingest_ipld(str(root), dest, gateway=gw.url)

    metas = z.open_group(store)
    assert set(metas) == {"latitude", "longitude", "precip", "time"}
    assert metas["precip"].fill_value == -9999.0
    lat = z.read_zarr_array_local(store, "latitude")
    assert lat.tolist() == [
        14.125, 14.375, 14.625, 14.875, 15.125, 15.375, 15.625, 15.875,
    ]
    pr = z.read_zarr_array_local(store, "precip")
    want = np.frombuffer(keys["precip/0.0.0"], "<f4").reshape(1, 8, 8)
    assert np.array_equal(pr, want)


@pytest.mark.skipif(
    not __import__("os").path.exists(_CHIRPS_REFS), reason="reference fixture absent"
)
def test_ingest_ipld_via_ipns_and_tall_read(gw, tmp_path, spark):
    """The FULL migration path: ipns://name → resolve → walk → materialize →
    read_zarr_tall, matching the direct kerchunk materialization row-for-row."""
    keys = _chirps_key_bytes()
    root = _publish_plain(gw, keys)
    gw.names["chirps-demo"] = str(root)
    store = ipld.ingest_ipld(
        "ipns://chirps-demo", str(tmp_path / "via_ipns"), gateway=gw.url
    )
    df = z.read_zarr_tall(spark, store, var="precip")
    ref_store = z.materialize_kerchunk_refs(_CHIRPS_REFS, str(tmp_path / "direct"))
    ref_df = z.read_zarr_tall(spark, ref_store, var="precip")
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, ref_df.collect()))
    assert got == want and len(got) == 64


def test_ingest_ipld_rejects_non_zarr_dag(gw, tmp_path):
    cid = gw.put_dag({"readme": b"not a zarr store"})
    with pytest.raises(ipld.IpldError, match="not a published Zarr store"):
        ipld.ingest_ipld(str(cid), str(tmp_path / "x"), gateway=gw.url)


def test_ingest_ipld_bomb_cap(gw, tmp_path):
    keys = {
        ".zgroup": b'{"zarr_format":2}',
        "v/.zarray": b'{"chunks":[4],"compressor":null,"dtype":"<f4","fill_value":null,'
        b'"filters":null,"order":"C","shape":[4],"zarr_format":2}',
        "v/0": b"\x00" * 1024,
    }
    root = _publish_plain(gw, keys)
    with pytest.raises(ipld.IpldError, match="max_bytes"):
        ipld.ingest_ipld(str(root), str(tmp_path / "bomb"), gateway=gw.url, max_bytes=100)


def test_walk_depth_guard():
    """A self-linking DAG must hit the depth guard, not recurse forever."""
    loop: dict = {}
    loop["next"] = loop  # direct python cycle stands in for a CID cycle
    with pytest.raises((ipld.IpldError, RecursionError)):
        ipld.walk_ipld_map({"a": loop}, lambda c: {})
