"""Physical-plan regression guards: the catalog's scale claims, asserted.

Each query docstring in plans/queries.py states the intended plan shape
(pushed-down scans, broadcast dims, semi/anti joins, banded pair joins).
These tests pin the load-bearing properties so a refactor that silently
degrades the plan — a lost pushdown, a cartesian product, a broadcast that
became a shuffle — fails CI rather than a 100 TB run.
"""

from __future__ import annotations

import pytest

from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 5 referenced columns — no full-width scan
    assert "l_comment" not in plan and "l_partkey" not in plan


def test_dim_join_broadcasts_small_side(spark):
    plan = _plan(spark, "dim_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semi_and_anti_joins_planned_as_such(spark):
    assert "LeftSemi" in _plan(spark, "order_priority_count")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_range_band_join_is_broadcast_nested_loop(spark):
    plan = _plan(spark, "range_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_products_anywhere(spark):
    """The whole catalog, one sweep, two hygiene invariants per plan:
    (a) no CartesianProduct — an unintended cross join is always a bug (the
    one legitimate non-equi join broadcasts its tiny side instead); and
    (b) no expensive expression (tokenize/hash/regex) inside a FileScan's
    DataFilters — Catalyst pushes filters inferred from join/aggregate
    keys (isnotnull of a derived column, size>0 from a bare explode)
    through repartitions into the scan, where the expression runs at
    file-count parallelism AND is evaluated a second time by the
    downstream projection (round-9: dedup_exact's semi-join key planted
    isnotnull(md5(regexp_replace(text))) in the scan; the only hit in a
    full-catalog executed-plan audit — this pins the class)."""
    EXPENSIVE = ("split(", "md5(", "sha1(", "sha2(", "xxhash", "transform(",
                 "aggregate(", "regexp")
    # The md5-mod SAMPLING predicates are the query semantics: a
    # row-discarding sample over a cheap key column belongs at the scan
    # (drop 90-95% before anything materializes). Tolerate exactly that
    # token for exactly those queries — the invariant targets expressions
    # that are join/aggregate INPUTS, which the scan evaluates once for
    # the filter and downstream again.
    EXEMPT = {"hash_sample": {"md5("}, "decontamination": {"md5("}}
    for name in REGISTRY:
        if name == "streaming_hourly_stats":
            continue  # streaming plans materialize on start(), not here
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        for line in plan.splitlines():
            if "FileScan" not in line or "DataFilters: []" in line:
                continue
            hit = [p for p in EXPENSIVE if p in line.split("PushedFilters")[0]]
            hit = [p for p in hit if p not in EXEMPT.get(name, set())]
            assert not hit, f"{name}: expensive scan-stage filter {hit}: {line[:160]}"


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "returned_items")
    assert "TakeOrderedAndProject" in plan


def test_minhash_plan_hashes_once(spark):
    """The CSE guard the docstrings promise: one md5 per shingle, not one
    per shingle×hash — CollapseProject must not inline the bases column
    into the four minhash lambdas."""
    df = REGISTRY["minhash_signatures"].fn(spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") == 1
    assert optimized.count("array_min") == 4


def test_embedding_neardup_partitions_by_join_key(spark):
    """The r2 regression guard, updated for the r15 gram-kernel plan: the
    pair work must be clustered BY LABEL into the kernel (one BLAS gram
    per label group — gram_bucket_pairs), never a round-robin shuffle of
    the vectors below it. The only round-robin allowed is the trailing
    pair-row repartition that pins a shuffle for orderBy's sampling pass
    (pairs are 24-byte rows there, not vectors)."""
    plan = _plan(spark, "embedding_neardup_pairs")
    assert "hashpartitioning(label" in plan
    assert "FlatMapGroupsInPandas" in plan
    # vectors must not be round-robined below the kernel: any RoundRobin
    # exchange in this plan may only carry the kernel's (id_a, id_b,
    # cosine) output, never the embedding column
    for seg in plan.split("RoundRobinPartitioning")[1:]:
        first_line = seg.splitlines()[0]
        assert "embedding" not in first_line


@pytest.mark.parametrize("name", ["update_key_split", "asof_join"])
def test_key_routing_stays_join_based(spark, name):
    """No isin() literal lists: key routing must be join-based so the plan
    size stays O(1) in key count (10k-key regression in test_store)."""
    plan = _plan(spark, name)
    assert " IN (" not in plan


def test_no_expensive_scan_stage_filters_in_hot_family(spark):
    """Round-5 regression guard: a deterministic filter on an expensive
    derived column (or the filter InferFiltersFromGenerate infers from a
    bare explode) gets pushed below the t_wide repartition with the whole
    tokenize/shingle subtree inlined, and then evaluates inside the scan
    stage — whose parallelism is the FILE count, not the cluster width
    (measured: 3.6 s single-task at sf0.1). The shuffle-bearing dedup/
    similarity queries must keep their optimized plans free of such
    filters; pure-scan queries (pii_scrub, repetition_ratio) are exempt
    here because filter-at-scan parallelizes by file count — but the
    catalog-wide executed-plan sweep (test_no_cartesian_products_anywhere)
    still bounds what may reach a FileScan's DataFilters."""
    EXPENSIVE = ("split(", "md5(", "transform(", "aggregate(", "regexp")
    GUARDED = [
        "minhash_signatures",
        "minhash_lsh_neardups",
        "ngram_jaccard_pairs",
        "simhash_neardups",
        "embedding_lsh_neardups",
        "curation_pipeline",
        "decontamination",
        "sequence_packing",
    ]
    for name in GUARDED:
        plan = REGISTRY[name].fn(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if not line.strip().lstrip("+-: ").startswith("Filter"):
                continue
            below = lines[i + 1].strip().lstrip("+-: ") if i + 1 < len(lines) else ""
            n_exp = sum(line.count(p) for p in EXPENSIVE)
            assert not (below.startswith("Relation") and n_exp >= 2), (
                f"{name}: optimized plan has an expensive filter (score {n_exp}) "
                f"directly above the scan — the subtree will evaluate at file "
                f"parallelism, not cluster width:\n{line[:300]}"
            )


def test_no_broadcast_hints_on_sf_scaled_base_tables(spark):
    """Round-7/8 rule, catalog-wide: only the fixed-cardinality dims
    (nation: 25 rows, region: 5 at EVERY scale factor) may carry a forced
    broadcast hint over their base scan. customer/supplier/orders/
    lineitem/part/documents/embeddings/events all scale with SF — a
    forced broadcast of any of them OOMs the driver at the 100 TB design
    point, so those joins must stay hint-free (AQE broadcasts them at
    test SFs, shuffles at scale). Hints over DERIVED subtrees (bounded
    aggregates, hash samples, key frames) are legitimate and exempt: the
    walk only descends through pass-through Project/Filter/SubqueryAlias
    nodes, so any aggregation/sample between hint and scan clears it."""
    SCALED_MARKERS = [
        "o_orderkey", "l_orderkey", "c_custkey", "s_suppkey", "p_partkey",
        "doc_id", "vec_id", "event_type",
    ]

    offenders = {}
    for name in REGISTRY:
        if name == "streaming_hourly_stats":
            continue  # streaming plans materialize on start(), not here
        plan = (
            REGISTRY[name].fn(spark, SF)._jdf.queryExecution().analyzed().toString()
        )
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line or "broadcast" not in line:
                continue
            j = i + 1
            while j < len(lines):
                node = lines[j].strip().lstrip(":+- ")
                if node.startswith(("Project", "Filter", "SubqueryAlias")):
                    j += 1
                    continue
                if node.startswith("Relation"):
                    hit = [m for m in SCALED_MARKERS if m + "#" in node]
                    if hit:
                        offenders.setdefault(name, []).extend(hit)
                break
    assert not offenders, (
        f"broadcast hints over SF-scaled base tables: {offenders} — drop the "
        "hint and let AQE decide (dims broadcast, facts shuffle)"
    )


def test_plan_fingerprint_stable_and_normalized(spark):
    """bench.plan_fingerprint (round-13 verdict #3): two fresh builds of
    the same query hash identically — exprIds, HOF lambda counters, AQE
    plan ids, and paths are normalized away — and different queries hash
    differently (the fingerprint actually carries plan shape)."""
    import bench

    def fp(name):
        df = REGISTRY[name].fn(spark, SF)
        df.collect()
        return bench.plan_fingerprint(df)

    a1, a2 = fp("pricing_summary"), fp("pricing_summary")
    assert a1 == a2, "same query, same session: fingerprint must be stable"
    # lambda-counter normalization: HOF-heavy query stable across rebuilds
    b1, b2 = fp("minhash_lsh_neardups"), fp("minhash_lsh_neardups")
    assert b1 == b2
    assert a1 != b1, "different plans must not collide"


def test_table_handle_cache_identity_and_mtime_invalidation(spark, tmp_path):
    """r15 t() memo: repeated reads of an unchanged table return the SAME
    lazy handle (the ~0.1 s spark.read round trips are paid once per
    session), while rewriting the file in place — the adversarial
    harness's corpus-swap pattern — invalidates the entry and the fresh
    handle sees the new data."""
    import os
    import time as _time

    import pandas as pd

    from zarr_climate_etl_ipfs_spark.plans.queries import _T_CACHE, t

    p = tmp_path / "documents.parquet"
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}).to_parquet(p)
    d1 = t(spark, str(tmp_path), "documents")
    d2 = t(spark, str(tmp_path), "documents")
    assert d1 is d2, "unchanged table must hit the session memo"
    assert d1.count() == 2

    _time.sleep(0.01)
    pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}).to_parquet(p)
    os.utime(p)  # belt-and-braces: some filesystems coarsen mtime
    d3 = t(spark, str(tmp_path), "documents")
    assert d3 is not d1, "rewritten file must miss the memo"
    assert d3.count() == 3
    assert any(k[2].endswith("documents.parquet") for k in _T_CACHE)
