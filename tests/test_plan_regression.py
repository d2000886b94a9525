"""Golden plan-shape regression over the whole driver contract.

Every `queries()` entry gets a physical-plan SIGNATURE — counts of the
scale-relevant operator kinds (scans, shuffle/broadcast exchanges, join
strategies, Python eval nodes, ...). The signatures are pinned in
``golden_plans.json``: a code change that silently turns a broadcast
join into a sort-merge join, adds a shuffle, or drops work into Python
fails THIS test even while results stay correct — plan shape IS the
100 TB contract.

Regenerate intentionally with:
    SPARK_GRAFT_REGEN_GOLDEN=1 python -m pytest tests/test_plan_regression.py
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import pytest

from stac_fastapi_duckdb_spark.plans.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"
GOLDEN = Path(__file__).parent / "golden_plans.json"

# executing these runs a full streaming query / mutates session state in
# ways that make the captured plan a LocalTableScan — not plan-checkable
SKIP = {
    "streaming_hourly_rollup",
    "stateful_sessions",
    "stream_stream_join",
    "stream_enrich",
    "streaming_dedup",
    "streaming_topk",
    "streaming_hll",
    "streaming_cms",
}

_MARKERS = {
    "scans": r"FileScan parquet",
    "shuffles": r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "broadcasts": r"BroadcastExchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "nlj": r"BroadcastNestedLoopJoin|CartesianProduct",
    "python": r"BatchEvalPython|ArrowEvalPython",
    "pandas_map": r"MapInPandas|FlatMapGroupsInPandas|FlatMapGroupsWithStateInPandas",
    "expand": r"\bExpand\b",
    "window": r"\bWindow\b|WindowGroupLimit",
    "topk": r"TakeOrderedAndProject",
    "generate": r"\bGenerate\b",
}


def _strip_cached(plan: str) -> str:
    """Drop cached-build subtrees: everything beneath an
    InMemoryTableScan is the artifact's BUILD lineage (the
    InMemoryRelation and its child plan — sometimes inlined without
    the relation line), which runs once per session (artifact
    amortization), not per query — the golden signature pins the work
    each query actually executes. The scan line itself is kept. Tree
    depth = length of the drawing prefix (spaces, ':', '+', '-'); a
    subtree ends when depth returns to <= the scan's own depth."""
    out = []
    skip_depth = None
    section_floor = None
    prev_skipped = False
    for line in plan.splitlines():
        rest = line.lstrip(" :+-")
        depth = len(line) - len(rest)
        # literal newlines inside expressions (e.g. split(text, "\n"))
        # produce continuation lines that are NOT tree nodes — they
        # follow the fate of the node they belong to
        is_node = bool(rest) and (rest[0].isalnum() or rest[0] in "*=(")
        if not is_node:
            if not prev_skipped:
                out.append(line)
            continue
        is_section = rest.startswith("== ")
        if skip_depth is not None:
            # a cached AdaptiveSparkPlan prints its == Final/Initial
            # Plan == sections DEDENTED below the scan node, and the
            # section CONTENT starts at the header's own depth — a
            # header opens a separate >=-floor instead of ending the
            # skip
            if is_section:
                section_floor = (
                    depth
                    if section_floor is None
                    else min(section_floor, depth)
                )
                prev_skipped = True
                continue
            if depth > skip_depth or (
                section_floor is not None and depth >= section_floor
            ):
                prev_skipped = True
                continue
            skip_depth = None
            section_floor = None
        prev_skipped = False
        if "InMemoryTableScan" in line:
            skip_depth = depth
            out.append(line)  # the scan itself IS per-query work
            continue
        out.append(line)
    return "\n".join(out)


def _signature(plan: str) -> dict[str, int]:
    sig = {}
    for name, pat in _MARKERS.items():
        n = len(re.findall(pat, plan))
        if n:
            sig[name] = n
    return sig


def _capture(spark, strip_cached: bool = False) -> dict[str, dict[str, int]]:
    out = {}
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if strip_cached:
            plan = _strip_cached(plan)
        out[name] = _signature(plan)
    return out


def test_plan_signatures_match_golden(spark):
    # goldens pin the PER-QUERY executed shape: cached-artifact build
    # lineage (amortized once per session) is excluded; the full-plan
    # invariant tests below still see it
    got = _capture(spark, strip_cached=True)
    if os.environ.get("SPARK_GRAFT_REGEN_GOLDEN") == "1" or not GOLDEN.exists():
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
        pytest.skip("golden plan signatures (re)generated")
    want = json.loads(GOLDEN.read_text())
    assert set(got) == set(want), (
        f"query set drifted: +{set(got) - set(want)} -{set(want) - set(got)}"
        " — regenerate goldens after adding/removing queries"
    )
    diffs = {
        name: (want[name], got[name])
        for name in want
        if want[name] != got[name]
    }
    assert not diffs, f"plan shape changed for: {json.dumps(diffs, indent=1)}"


def test_no_accidental_python_or_nested_loops(spark):
    # global invariants, independent of goldens: Python eval nodes and
    # nested-loop joins only where the operator is declared Python/
    # pairwise by design
    python_ok = {
        "multimodal_features",
        "audio_frame_features",
        "spatial_envelope",  # exact shapely refine after envelope prefilter
        # vector math / sketch bit-votes via Arrow-batched pandas UDFs
        # (declared Python per design; still no row-at-a-time UDFs)
        "ann_srp_topk",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        # the pandas_udf here is the OFFLINE index build (cell
        # assignment) inside the persisted InMemoryRelation's
        # description — the serving plan itself is an in-memory scan +
        # LUT fold + TakeOrdered; the signature counts the cached
        # lineage text
        "ann_pq_topk",
        "embedding_near_dup",
        "simhash_pairs",
        # broadcast nearest-centroid assignment (vectorized pandas UDF)
        "kmeans_round",
        # JL fold as a batched numpy kernel (round 11): the Column HOF
        # form is interpreted per row; the kernel replays the identical
        # sequential fold per batch (test_similarity pins both equal)
        "jl_projection",
        # per-cluster GEMM kernel (applyInPandas) — the paper's own
        # compute shape; A/B'd 14× faster than the Column-fold join
        "semdedup",
        # per-shard linear greedy fold (applyInPandas) — the bin
        # recurrence is nonlinear (no window/scan) and the JVM
        # array-append fold is O(shard²)
        "pack_greedy",
    }
    # single-row broadcast side crossed against every embedding (brute
    # force ANN baseline / probe-vector rerank) — a
    # BroadcastNestedLoopJoin over ONE row, not a data×data cartesian
    # lm_perplexity: its 4 NLJs are 1-row broadcast aggregates (corpus
    # total, kept-vocab size, OOV logprob) crossed in as scalars — the
    # same shape, never data×data
    # dsir_select: 8 NLJs of the same kind — two LMs × (total, kept,
    # OOV) 1-row aggregates crossed in as scalars
    nlj_ok = {
        "embedding_topk",
        "hashed_text_topk",  # 1-row hashed probe vector broadcast
        "hybrid_search",
        "lm_perplexity",
        "quality_tiers",
        "dsir_select",
        # theta-sketch combine: ONE 64-hash sketch row per side — a
        # 1-row × 1-row cross, never data×data
        "kmv_overlap",
    }
    got = _capture(spark)
    for name, sig in got.items():
        if name not in python_ok:
            assert "python" not in sig and "pandas_map" not in sig, (
                f"{name} dropped into Python: {sig}"
            )
        if name not in nlj_ok:
            assert "nlj" not in sig, f"{name} plans a nested-loop join: {sig}"


def test_no_registered_plan_contains_cartesian_product(spark):
    # global invariant: the brute-force all-pairs branches (crossJoin
    # verification oracles) must never be REGISTERED as contract plans —
    # a CartesianProduct in the registry is the one shape guaranteed to
    # die at 100× scale
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (
            f"{name} plans a CartesianProduct"
        )
