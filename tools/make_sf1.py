"""Build a 10x-replicated "sf1" corpus from /root/testdata/sf0.1 (round-14
verdict ask #7: one measured sf1 point for the headline family — the 2x gate
runs at sf0.1; this either proves the aggregate advantage widens with data or
finds the next riser before the driver does).

Replication is KEY-OFFSET + STRUCTURE-PRESERVING, not verbatim copy: a
verbatim 10x of `documents` would put every original doc in a 10-member
near-dup clique, scaling LSH pair output ~45x (quadratic in replicas) — a
workload shape organic 10x data does NOT have. Instead:

  - TPC-H family: keys offset by replica*10^7 (FK consistency preserved:
    orders.custkey, lineitem.{orderkey,partkey,suppkey} shift together);
    dates/values verbatim so every filter literal keeps proportional
    selectivity. region/nation stay dimensions (copied once).
  - events: event_id/user_id offset, ts/value/props verbatim (10x users,
    same per-user session shape).
  - documents: doc_id offset; replica 0 verbatim, replicas k>0 get a
    per-doc seeded WORD SHUFFLE — unigram statistics (token counts,
    language id, tf-idf, quality scores) are preserved exactly while
    order-sensitive shingles diverge, so near-dup structure scales
    linearly like real growth. n_chars recomputed.
  - embeddings: vec_id offset; replicas k>0 perturbed with seeded Gaussian
    noise at 0.35 relative sigma — cosine to the original drops to ~0.8,
    below the neardup thresholds, so embedding pair output also scales
    linearly.

Deterministic (seed 42 + replica + row key). Writes /tmp/sf1_replica/ by
default. Usage: python tools/make_sf1.py [dest] [n_replicas]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OFF = 10_000_000


def _repl_simple(name: str, key_cols: list[str], dest: Path, n: int) -> None:
    t = pq.read_table(SRC / f"{name}.parquet")
    parts = []
    for k in range(n):
        cols = {}
        for col in t.column_names:
            arr = t.column(col)
            if col in key_cols and k > 0:
                arr = pa.chunked_array(
                    [pa.compute.add(c, k * OFF) for c in arr.chunks]
                )
            cols[col] = arr
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), dest / f"{name}.parquet")


def _repl_documents(dest: Path, n: int) -> None:
    t = pq.read_table(SRC / "documents.parquet").to_pydict()
    doc_id, text, lang, source = t["doc_id"], t["text"], t["lang"], t["source"]
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(n):
        for i in range(len(doc_id)):
            if k == 0:
                new_text = text[i]
            else:
                words = text[i].split()
                rng = np.random.RandomState((42 + k * 1_000_003 + doc_id[i]) % (2**31))
                rng.shuffle(words)
                new_text = " ".join(words)
            out["doc_id"].append(doc_id[i] + k * OFF)
            out["text"].append(new_text)
            out["lang"].append(lang[i])
            out["source"].append(source[i])
            out["n_chars"].append(len(new_text))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(out, schema=schema), dest / "documents.parquet")


def _repl_embeddings(dest: Path, n: int) -> None:
    t = pq.read_table(SRC / "embeddings.parquet").to_pydict()
    vec_id, emb, label = t["vec_id"], t["embedding"], t["label"]
    out = {"vec_id": [], "embedding": [], "label": []}
    for k in range(n):
        for i in range(len(vec_id)):
            v = np.asarray(emb[i], dtype=np.float32)
            if k > 0:
                rng = np.random.RandomState((42 + k * 999_983 + vec_id[i]) % (2**31))
                scale = float(np.std(v)) or 1.0
                v = (v + rng.normal(0.0, 0.35 * scale, v.shape)).astype(np.float32)
            out["vec_id"].append(vec_id[i] + k * OFF)
            out["embedding"].append(v.tolist())
            out["label"].append(label[i])
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(pa.table(out, schema=schema), dest / "embeddings.parquet")


def main() -> None:
    dest = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dest.mkdir(parents=True, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(SRC / f"{name}.parquet"), dest / f"{name}.parquet")
    _repl_simple("customer", ["c_custkey"], dest, n)
    _repl_simple("supplier", ["s_suppkey"], dest, n)
    _repl_simple("part", ["p_partkey"], dest, n)
    _repl_simple("orders", ["o_orderkey", "o_custkey"], dest, n)
    _repl_simple(
        "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], dest, n
    )
    _repl_simple("events", ["event_id", "user_id"], dest, n)
    _repl_documents(dest, n)
    _repl_embeddings(dest, n)
    for p in sorted(dest.glob("*.parquet")):
        print(p.name, pq.read_metadata(p).num_rows)


if __name__ == "__main__":
    main()
