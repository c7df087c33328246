"""Smoke-pin for tools/adversarial_check.py — the edge-case oracle gate.

The full 100-query sweep is a tool run (several minutes); this test keeps
the gate itself from bit-rotting: the corpus must build with every edge
family present, and a representative subset spanning the fixed divergence
classes (word-split semantics, zero-norm cosine, non-finite event values,
TPC-H filter-boundary/tie/extreme rows) must stay engine-identical on it.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tools.adversarial_check import TABLES, build_corpus
from tools.check import canon_rows

SUBSET = [
    "token_stats",            # words() empty/NULL semantics
    "embedding_neardup_pairs",  # zero-norm cosine contract
    "value_percentiles",      # NULL rank placement contract
    "incremental_rollup_merge",  # finite-only exact-cents gate
    "pricing_summary",        # shipdate boundary + unseen returnflag group
    "extreme_bounds",         # quantity/price exactly at the QC bounds
    "json_props",             # non-numeric $.k must try_cast to NULL
]


@pytest.fixture(scope="module")
def corpus():
    root = build_corpus()
    docs = pd.read_parquet(root / "documents.parquet")
    emb = pd.read_parquet(root / "embeddings.parquet")
    ev = pd.read_parquet(root / "events.parquet")
    # the edge families the gate exists for must actually be present
    assert (docs["text"].fillna("").str.strip() == "").sum() >= 3  # empty-ish
    assert docs["text"].isna().any()
    assert any(sum(abs(x) for x in v) == 0 for v in emb["embedding"])  # zero-norm
    assert ev["value"].isna().any()
    assert (~ev["value"].apply(lambda v: pd.isna(v) or abs(v) != float("inf"))).any()
    assert ev["event_id"].duplicated().any()
    li = pd.read_parquet(root / "lineitem.parquet")
    od = pd.read_parquet(root / "orders.parquet")
    assert (li["l_shipdate"] == pd.Timestamp("1998-09-02")).any()  # filter edge
    assert (li["l_quantity"] <= 0).any() and (li["l_discount"] >= 1.0).any()
    assert li.duplicated(["l_orderkey", "l_linenumber"]).any()
    assert od.duplicated(["o_totalprice", "o_orderdate"]).any()  # sort-key tie
    return root


@pytest.mark.parametrize("name", SUBSET)
def test_adversarial_subset_matches_oracle(spark, corpus, name):
    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        p = corpus / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qd = REGISTRY[name]
    sdf = qd.fn(spark, str(corpus))
    srows = sdf.collect()
    res = con.execute(qd.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(ocols), name
    assert len(srows) == len(orows), name
    sc = canon_rows(sdf.columns, [[r[c] for c in sdf.columns] for r in srows])
    assert sc == canon_rows(ocols, orows), name


@pytest.mark.parametrize("n_rows", [0, 1])
def test_degenerate_corpus_subset_matches_oracle(spark, n_rows):
    """The minimal/empty corpus modes (every table truncated to one/zero
    rows) must keep a representative subset engine-identical — pins the
    empty-grouping-set, empty-funnel, and empty-index contracts fixed in
    round 9."""
    from tools.adversarial_check import build_minimal_corpus
    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    root = build_minimal_corpus(n_rows)
    con = duckdb.connect()
    for t in TABLES:
        p = root / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in ("cube_revenue", "funnel_conversion", "next_date", "ivf_knn"):
        qd = REGISTRY[name]
        sdf = qd.fn(spark, str(root))
        srows = sdf.collect()
        res = con.execute(qd.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        assert sorted(sdf.columns) == sorted(ocols), name
        assert len(srows) == len(orows), (name, len(srows), len(orows))
        sc = canon_rows(sdf.columns, [[r[c] for c in sdf.columns] for r in srows])
        assert sc == canon_rows(ocols, orows), name
    con.close()
