"""Adversarial-corpus oracle gate: the latent-divergence class the round-7/8
advisor kept finding one instance at a time (empty/whitespace docs hashing
differently through DuckDB's REGEXP_SPLIT_TO_ARRAY — which yields [''] on
'' — vs Spark's words() — which yields []), closed wholesale.

Builds a corpus directory whose documents/embeddings tables are packed with
the edge cases the sf corpora never contain — empty text, whitespace-only
(spaces/tabs/newlines), single word, repeated word, leading/trailing
whitespace, punctuation-only, digits, unicode (accents/CJK/emoji), a
zero-norm embedding, duplicate embeddings, an all-equal-component vector —
then runs EVERY catalog query whose oracle touches those tables on both
engines and compares rows + columns + repr-exact values, same comparator as
tools/check.py. A query family that implicitly assumes "no empty docs"
fails here even though every sf attestation stays green.

Usage: python tools/adversarial_check.py [query ...]
Exit 0 only if every checked query matches.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check import TABLES, canon_rows  # noqa: E402

BASE_SF = Path("/root/testdata/sf0.001")
WORK = Path("/tmp/adversarial_corpus")

#: the edge documents; doc_ids continue past the 20 retained base docs.
#: lang/source stay in-domain so groupings keep plausible cardinality.
EDGE_DOCS = [
    (1000, "", "en", "src0"),
    (1001, "   ", "en", "src1"),
    (1002, "\t\n  \t", "de", "src2"),
    (1003, "word", "en", "src0"),
    (1004, "a a a a a a a a", "en", "src1"),
    (1005, "  leading and trailing  ", "fr", "src2"),
    (1006, "!!! ... ??? ;;;", "en", "src0"),
    (1007, "12345 67890 12345", "de", "src1"),
    (1008, "café naïve résumé über señor", "fr", "src2"),
    (1009, "数据 处理 引擎 数据", "ja", "src0"),
    (1010, "emoji 🙂 mixed 🚀 tokens 🙂", "en", "src1"),
    (1011, "UPPER lower MiXeD UPPER", "en", "src2"),
    (1012, "one\ntwo\nthree", "de", "src0"),
    (1013, "tab\tseparated\ttokens", "en", "src1"),
    (1014, "repeat repeat repeat repeat repeat", "fr", "src2"),
    (1015, None, "en", "src0"),  # NULL text — words() must treat like ''
]


#: edge events appended to 200 base rows. NULL ts is deliberately absent:
#: the ingest contract (canonicalize) drops records without a time key, so
#: a NULL time never reaches the query layer. Everything else is in-domain
#: hostile: ordering ties, bucket boundaries, IEEE specials, NULL/malformed
#: payloads, duplicate ids, epoch extremes.
def _edge_events(base: pd.DataFrame) -> pd.DataFrame:
    import datetime as dt

    t0 = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        # identical ts for one user — ordering/window/as-of tie
        (10000, t0.replace(hour=3, minute=7), 901, "click", 1.5, '{"k": 1}'),
        (10001, t0.replace(hour=3, minute=7), 901, "click", 2.5, '{"k": 2}'),
        # exact hour/day bucket boundaries
        (10002, t0, 902, "purchase", 10.0, '{"k": 3}'),
        (10003, t0.replace(hour=1), 902, "purchase", 20.0, '{"k": 4}'),
        # IEEE specials + NULL in the value column
        (10004, t0.replace(hour=5), 903, "error", float("nan"), '{"k": 5}'),
        (10005, t0.replace(hour=6), 903, "error", float("inf"), '{"k": 6}'),
        (10006, t0.replace(hour=7), 903, "error", float("-inf"), '{"k": 7}'),
        (10007, t0.replace(hour=8), 903, "error", None, '{"k": 8}'),
        # NULL / malformed / empty JSON props, NULL event_type
        (10008, t0.replace(hour=9), 904, "signup", 1.0, None),
        (10009, t0.replace(hour=10), 904, "signup", 2.0, "{not json"),
        (10010, t0.replace(hour=11), 904, "signup", 3.0, ""),
        (10011, t0.replace(hour=12), 904, None, 4.0, '{"k": 9}'),
        # duplicate event_id under a different ts
        (10000, t0.replace(hour=13), 905, "click", 5.0, '{"k": 10}'),
        # full-key (event_id, ts) duplicate with identical payload — the
        # re-delivery contract: streams AND batch oracles must count 1
        (10015, t0.replace(hour=15), 905, "click", 9.0, '{"k": 14}'),
        (10015, t0.replace(hour=15), 905, "click", 9.0, '{"k": 14}'),
        # valid JSON, non-integer k — try_cast contract: NULL, not a crash
        (10016, t0.replace(hour=16), 906, "signup", 1.0, '{"k": "x"}'),
        # single-event user; epoch extremes
        (10012, t0.replace(hour=14), 906, "view", 6.0, '{"k": 11}'),
        (10013, dt.datetime(1970, 1, 1, 0, 0, 1), 907, "view", 7.0, '{"k": 12}'),
        (10014, dt.datetime(2030, 12, 31, 23, 59, 59), 907, "view", 8.0, '{"k": 13}'),
    ]
    edge = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return pd.concat([base, edge], ignore_index=True)


def build_corpus() -> Path:
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    for t in TABLES:
        src = BASE_SF / f"{t}.parquet"
        if t not in ("documents", "embeddings", "events") and src.exists():
            shutil.copy(src, WORK / f"{t}.parquet")

    base_events = pd.read_parquet(BASE_SF / "events.parquet").head(200)
    ev = _edge_events(base_events)
    # match the base table's physical layout exactly: INT64 Timestamp(us,
    # isAdjustedToUTC=false) — a pandas default ns write makes the
    # streaming queries' explicit timestamp_ntz schemas fail the scan
    import pyarrow as pa
    import pyarrow.parquet as papq

    tbl = pa.Table.from_pandas(ev, preserve_index=False)
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        i, pa.field("ts", pa.timestamp("us")), tbl.column("ts").cast(pa.timestamp("us"))
    )
    papq.write_table(tbl, WORK / "events.parquet")

    base_docs = pd.read_parquet(BASE_SF / "documents.parquet").head(20)
    edge = pd.DataFrame(EDGE_DOCS, columns=["doc_id", "text", "lang", "source"])
    edge["n_chars"] = edge["text"].str.len().fillna(0).astype("int64")
    docs = pd.concat([base_docs, edge], ignore_index=True)
    docs.to_parquet(WORK / "documents.parquet", index=False)

    base_emb = pd.read_parquet(BASE_SF / "embeddings.parquet").head(20)
    rng = np.random.RandomState(99)
    extra_rows = []
    # zero-norm vector: cosine denominators hit 0 on both engines
    extra_rows.append((2000, np.zeros(64, dtype=np.float32), 1))
    # exact duplicate of a base vector under a new id (same label block)
    extra_rows.append(
        (2001, np.asarray(base_emb["embedding"].iloc[0], dtype=np.float32),
         int(base_emb["label"].iloc[0]))
    )
    # all-equal components (degenerate but unit-normalizable)
    extra_rows.append((2002, np.full(64, 0.125, dtype=np.float32), 2))
    # near-duplicate pair planted inside one label block
    v = rng.standard_normal(64).astype(np.float32)
    extra_rows.append((2003, v, 3))
    extra_rows.append((2004, (v + rng.standard_normal(64).astype(np.float32) * 1e-3), 3))
    extra = pd.DataFrame(
        [(i, list(map(float, vec)), lb) for i, vec, lb in extra_rows],
        columns=["vec_id", "embedding", "label"],
    )
    extra["label"] = extra["label"].astype("int32")
    emb = pd.concat([base_emb, extra], ignore_index=True)
    emb.to_parquet(WORK / "embeddings.parquet", index=False)
    return WORK


def affected_queries(registry, oracles) -> list[str]:
    out = []
    for name, qd in registry.items():
        o = oracles.get(name)
        if o and ("documents" in o or "embeddings" in o or "events" in o):
            out.append(name)
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    only = set(argv)
    corpus = build_corpus()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("adversarial_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = corpus / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    names = affected_queries(REGISTRY, oracles)
    missing_filter = []
    if only:
        missing_filter = sorted(only - set(names))
        names = [n for n in names if n in only]
        for m in missing_filter:
            print(f"WARNING: requested query {m!r} is not an adversarial-gate query "
                  "(unknown name, or its oracle touches none of documents/embeddings/events)")
    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, str(corpus))
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc = canon_rows(scols, [[row[c] for c in scols] for row in srows])
            oc = canon_rows(ocols, orows)
            if sc != oc:
                n_diff = sum(a != b for a, b in zip(sc, oc))
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:2]
                problems.append(f"values differ ({n_diff} rows); first: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok    {name} ({len(srows)} rows)")
    print(f"\n{len(names) - len(failures)}/{len(names)} matched on the adversarial corpus")
    if failures:
        print("failing:", failures)
    if missing_filter:
        print("missing from gate (treated as failure):", missing_filter)
    if only and not names:
        print("ERROR: the filter matched zero gate queries — nothing was checked")
    if json_out:
        import json as _json

        payload = {
            "corpus": "sf0.001 base + edge documents (empty/whitespace/unicode/"
            "punctuation/digits) + edge embeddings (zero-norm/duplicate/"
            "constant/planted near-dup)",
            "n_queries": len(names),
            "n_ok": len(names) - len(failures),
            "n_fail": len(failures),
            "failing": failures,
            "comparator": "rows + column-set + repr-exact values vs DuckDB oracle",
            "queries": sorted(names),
        }
        Path(json_out).write_text(_json.dumps(payload, indent=1) + "\n")
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures or missing_filter or (only and not names) else 0


if __name__ == "__main__":
    raise SystemExit(main())
