"""Entity resolution over structured records: blocking → pairwise
verify → transitive entity clusters.

The reference engine has no record-linkage operator; this belongs to
the beyond-reference training-data surface (resolving author/user
identities before dedup and attribution — the tabular sibling of the
document near-dup stack).

Scale shape (the part that must survive 100 TB):

- Candidate generation is BLOCKED (Fellegi–Sunter / Papadakis
  blocking): records can only meet inside a blocking key, so the
  candidate step is ONE shuffle of (block, id, name) rows — never an
  all-pairs join. The pair blow-up happens in-array after a
  ``max_block_size`` cap, the same skew contract as the LSH dedup
  buckets (a single degenerate block is exactly the quadratic failure
  mode this bounds).
- Verification is exact character Levenshtein via the JVM built-in
  (codegen, no Python), applied only to in-block pairs.
- Clusters reuse the iterative min-label connected-components
  operator (pipeline/dedup.py) — per-round shuffles keyed on the
  record id, lineage cut by localCheckpoint, early fixpoint stop.

Oracle story: every step is deterministic Column algebra, so DuckDB
replays it exactly — blocked self-join + ``levenshtein()`` + the
unrolled min-label propagation CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.dedup import connected_components


def blocked_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 1,
    max_block_size: int = 10_000,
    pair_mode: str = "all",
    expansion: str | None = None,
) -> DataFrame:
    """Candidate+verified match pairs (id_a < id_b, dist ≤ max_dist).

    One shuffle on the blocking key. ``pair_mode="all"`` emits every
    C(m, 2) in-block pair — output quadratic in duplicate-cluster size
    (an m-record boilerplate entity emits m(m-1)/2 rows); required when
    the pairs feed a transitive-closure pass (``resolve_entities``).
    ``pair_mode="star"`` pairs each record only with its block's
    CANONICAL (minimum-id) record — m-1 pairs, linear output at any
    cluster shape, and the surviving rows ARE the member→canonical
    merge map.

    ``expansion`` (round 12) picks how the in-block pair stream is
    generated; ``None`` → "join" for all-pairs, "array" for star:

    - ``"join"`` — explicit repartition on the blocking key + hinted
      SHUFFLE_HASH self-join consuming that ONE exchange on both sides
      (the phash/simhash single-exchange shape). Entity blocks are
      DENSE (hundreds of members per (nation, segment) block), so the
      codegen'd join beats the interpreted higher-order-function
      expansion ~5× at sf0.1 — the same dense-bucket trade
      ``phash_near_dup_pairs`` documents. The blocking key travels as
      ONE struct column so null block values group/join exactly like
      groupBy treats them (struct equality is null-safe field-wise).
      The in-join verify is a free length-difference prune plus the
      thresholded Levenshtein itself (tests/test_entities.py pins both
      expansions equal, including under random single edits).
    - ``"array"`` — the groupBy + sorted collect_list(struct(id,
      name)) + in-array expansion reference: carrying the name inside
      the struct needs no join-back, and for the LINEAR star output it
      stays the cheaper plan (no second pass over the exchange).
    """
    if expansion is None:
        expansion = "star-array" if pair_mode == "star" else "join"
    if expansion == "join" and pair_mode == "all":
        return _blocked_match_pairs_join(
            df, id_col, name_col, block_cols, max_dist, max_block_size
        )
    items = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(name_col).alias("s")))
    )
    grouped = (
        df.groupBy(*[F.col(c) for c in block_cols])
        .agg(items.alias("_items"))
        .filter((F.size("_items") >= 2) & (F.size("_items") <= max_block_size))
    )
    if pair_mode == "star":
        canon = F.element_at("_items", 1)
        pairs = F.transform(
            F.slice("_items", 2, F.size("_items") - 1),
            lambda b: F.struct(
                canon["i"].alias("id_a"),
                b["i"].alias("id_b"),
                canon["s"].alias("name_a"),
                b["s"].alias("name_b"),
            ),
        )
    else:
        pairs = F.flatten(
            F.transform(
                "_items",
                lambda a, i: F.transform(
                    F.slice("_items", i + 2, F.size("_items")),
                    lambda b: F.struct(
                        a["i"].alias("id_a"),
                        b["i"].alias("id_b"),
                        a["s"].alias("name_a"),
                        b["s"].alias("name_b"),
                    ),
                ),
            )
        )
    exploded = grouped.select(F.explode(pairs).alias("p")).select("p.*")
    # thresholded Levenshtein: banded DP early-exits above max_dist
    # (-1), exact distance for every kept pair — same values, O(len·d)
    return (
        exploded.withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist).cast("long")
        )
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def _blocked_match_pairs_join(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int,
    max_block_size: int,
) -> DataFrame:
    """All-pairs expansion as a single-exchange hinted self-join; see
    ``blocked_match_pairs`` (expansion="join") for the contract."""
    from pyspark.sql.window import Window

    from stac_fastapi_duckdb_spark.pipeline.dedup import shj_hint

    base = df.select(
        F.struct(*[F.col(c) for c in block_cols]).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_nm"),
    ).repartition("_bk")
    sized = (
        base.withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("_bk"))
        )
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_block_size))
        .drop("_n")
    )
    a = shj_hint(
        sized.select("_bk", F.col("_id").alias("id_a"), F.col("_nm").alias("name_a"))
    )
    b = shj_hint(
        sized.select("_bk", F.col("_id").alias("id_b"), F.col("_nm").alias("name_b"))
    )
    pairs = a.join(b, "_bk").filter(F.col("id_a") < F.col("id_b"))
    la, lb = F.length("name_a"), F.length("name_b")
    # |len diff| > d already implies lev > d — free prune on any d.
    # A stronger pigeonhole pre-filter (first-or-last-half equality)
    # was A/B'd and REJECTED: its 6 substr allocations per candidate
    # cost 2× the thresholded Levenshtein they were guarding (3.5 s vs
    # 1.7 s at sf0.1) — the banded O(len·d) DP is already the cheap op.
    pairs = pairs.filter(
        F.abs(la - lb) <= F.lit(max_dist)
    )
    return (
        pairs.withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist).cast("long")
        )
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 1,
    max_block_size: int = 10_000,
) -> DataFrame:
    """(id, entity_id): transitive closure of verified match pairs;
    entity_id = min record id in the cluster. Singletons map to
    themselves (all_ids seeds every record)."""
    pairs = blocked_match_pairs(
        df, id_col, name_col, block_cols, max_dist, max_block_size
    )
    comp = connected_components(
        pairs.select("id_a", "id_b"), all_ids=df.select(F.col(id_col)), id_col=id_col
    )
    return comp.select(
        F.col(id_col), F.col("component").alias("entity_id")
    )
