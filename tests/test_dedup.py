"""Dedup operator tests: exact, MinHash-LSH, n-gram Jaccard, SimHash."""

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    )
    near = base.replace("lazy", "sleepy")  # one-token change → high jaccard
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, near),  # near-duplicate of 1
        (4, "completely different text about spark dataframes and shuffles here"),
        (5, "another unrelated document mentioning catalyst optimizer and codegen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).collect()
    kept = {r.keep_id: r.dups for r in out}
    assert kept[1] == 2  # docs 1+2 collapse
    assert kept[3] == 1 and kept[4] == 1 and kept[5] == 1
    assert 2 not in kept


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(dedup.shingles_col("text", 3).alias("sh")).collect()[0]
    assert sorted(row.sh) == ["a b c", "b c d"]
    # short doc → single whole-text shingle
    df2 = spark.createDataFrame([("a b",)], "text string")
    row2 = df2.select(dedup.shingles_col("text", 3).alias("sh")).collect()[0]
    assert row2.sh == ["a b"]


def test_minhash_lsh_finds_near_dups(docs):
    cand = dedup.minhash_lsh_candidates(docs, num_hashes=64, bands=16)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup should bucket together
    # unrelated docs should not appear
    assert (4, 5) not in pairs


def test_ngram_jaccard_pairs(docs):
    cand = dedup.minhash_lsh_candidates(docs, num_hashes=64, bands=16)
    verified = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert rows[(1, 2)] == 1.0
    assert any(p in rows for p in [(1, 3), (2, 3)])
    for (a, b), j in rows.items():
        assert 0.5 <= j <= 1.0


def test_ngram_jaccard_bruteforce(docs):
    out = dedup.ngram_jaccard_pairs(docs, None, threshold=0.9)
    rows = {(r.id_a, r.id_b) for r in out.collect()}
    assert rows == {(1, 2)}


def test_minhash_dedup_mapping(docs):
    mapping = {r.doc_id: r.canonical_id for r in dedup.minhash_dedup(docs, threshold=0.5).collect()}
    assert mapping[1] == 1
    assert mapping[2] == 1
    assert mapping[3] == 1  # near-dup folds into 1
    assert mapping[4] == 4 and mapping[5] == 5


def test_simhash_stable_and_near(docs, spark):
    sh = dedup.with_simhash(docs).select("doc_id", "simhash").collect()
    by_id = {r.doc_id: r.simhash for r in sh}
    assert by_id[1] == by_id[2]  # identical text → identical signature
    # near-dup differs in few bits
    ham = bin(by_id[1] ^ by_id[3]).count("1")
    assert ham <= 12
    # unrelated docs differ in many bits
    assert bin(by_id[1] ^ by_id[4]).count("1") > 12


def test_simhash_near_dup_pairs(docs):
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=12)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (4, 5) not in got


def test_connected_components_transitive_chain(spark):
    from stac_fastapi_duckdb_spark.pipeline.dedup import connected_components

    # chain 1-2-3-4 plus isolated 9: transitivity must fold the whole
    # chain to component 1 even though (1,4) is never a direct edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 8, 9)], "doc_id long")
    got = {
        r.doc_id: r.component
        for r in connected_components(edges, all_ids=ids).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 9}


def test_minhash_dedup_transitive_planted_chain(spark):
    # planted 3-chain: adjacent docs share >=0.8 shingle jaccard, the
    # endpoints only ~0.73 — so no direct (a,c) pair is ever verified.
    # The transitive default must still map c to a (one-hop maps c->b).
    words = [f"w{i:02d}" for i in range(50)]
    rows = [
        (1, " ".join(words[0:40])),
        (2, " ".join(words[3:43])),
        (3, " ".join(words[6:46])),
        (4, "totally unrelated content about something else entirely okay"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, None, threshold=0.8).collect()
    }
    assert pairs == {(1, 2), (2, 3)}  # the chain premise must hold

    mapping = {
        r.doc_id: r.canonical_id
        for r in dedup.minhash_dedup(docs, threshold=0.8).collect()
    }
    assert mapping == {1: 1, 2: 1, 3: 1, 4: 4}

    one_hop = {
        r.doc_id: r.canonical_id
        for r in dedup.minhash_dedup(docs, threshold=0.8, transitive=False).collect()
    }
    assert one_hop[3] == 2  # documents the non-transitive trade-off
