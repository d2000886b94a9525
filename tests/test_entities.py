"""Entity resolution (pipeline/entities.py): blocking semantics, the
block-size skew cap, verify threshold, and cluster closure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.entities import (
    blocked_match_pairs,
    resolve_entities,
)


@pytest.fixture()
def records(spark):
    rows = [
        # block A: three near-identical names (chain: anna/anne/annie?)
        (1, "anna smith", "A"),
        (2, "anne smith", "A"),  # dist(anna, anne) = 1
        (3, "aNNa smith", "A"),  # case differs → dist 2 from anna
        # block B: identical names → dist 0
        (10, "bob jones", "B"),
        (11, "bob jones", "B"),
        # block C: singleton — can never pair
        (20, "carol king", "C"),
        # block D: same names as block B but a different block — must
        # NOT pair across blocks
        (30, "bob jones", "D"),
    ]
    return spark.createDataFrame(rows, ["rid", "name", "blk"])


def test_pairs_blocked_and_ordered(records):
    pairs = blocked_match_pairs(records, "rid", "name", ["blk"], max_dist=1)
    got = {(r.id_a, r.id_b, r.dist) for r in pairs.collect()}
    assert got == {(1, 2, 1), (10, 11, 0)}
    # id_a < id_b everywhere, and no cross-block (10/11 vs 30) pair
    assert all(a < b for a, b, _ in got)


def test_max_dist_widens_matches(records):
    pairs = blocked_match_pairs(records, "rid", "name", ["blk"], max_dist=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # case-variant joins at dist 2 (two case substitutions); anne↔aNNa
    # stays out at dist 3
    assert (1, 3) in got and (2, 3) not in got


def test_block_cap_drops_degenerate_block(records):
    # cap below block A's size (3) → block A contributes nothing;
    # block B (size 2) still pairs. The cap gates BEFORE pair expansion.
    pairs = blocked_match_pairs(
        records, "rid", "name", ["blk"], max_dist=1, max_block_size=2
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(10, 11)}


def test_resolve_entities_closure_and_singletons(records):
    ents = resolve_entities(records, "rid", "name", ["blk"], max_dist=2)
    m = {r.rid: r.entity_id for r in ents.collect()}
    # every record present, singletons map to themselves
    assert set(m) == {1, 2, 3, 10, 11, 20, 30}
    assert m[20] == 20 and m[30] == 30
    # block A chains to one entity labeled by the min id
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10


def test_plan_is_single_shuffle_pair_expansion(records):
    pairs = blocked_match_pairs(records, "rid", "name", ["blk"], max_dist=1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # one exchange (the blocking-key shuffle), no join operator at all
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_star_mode_pairs_only_with_block_canonical(records):
    # all-pairs at dist 2 includes (2, 3); star keeps only pairs whose
    # left side is the block's minimum id
    allp = {
        (r.id_a, r.id_b)
        for r in blocked_match_pairs(
            records, "rid", "name", ["blk"], max_dist=2
        ).collect()
    }
    star = {
        (r.id_a, r.id_b)
        for r in blocked_match_pairs(
            records, "rid", "name", ["blk"], max_dist=2, pair_mode="star"
        ).collect()
    }
    assert star <= allp
    assert star == {(1, 2), (1, 3), (10, 11)}  # (2, 3) dropped: star
    # star output is linear: <= m-1 pairs per block
    assert all(a in (1, 10) for a, _ in star)


def test_star_mode_distances_match_all_pairs(records):
    allp = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_match_pairs(
            records, "rid", "name", ["blk"], max_dist=2
        ).collect()
    }
    star = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_match_pairs(
            records, "rid", "name", ["blk"], max_dist=2, pair_mode="star"
        ).collect()
    }
    for k, d in star.items():
        assert allp[k] == d
