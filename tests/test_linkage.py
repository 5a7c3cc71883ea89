"""Entity-resolution invariants: deletion-neighborhood completeness for
edit distance <= 1, verification exactness, hot-block guard behavior,
rare-token blocking + trigram scoring, and deterministic best-match
resolution (operators/linkage.py docstring)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import linkage


def _df(spark, rows, schema="id bigint, name string"):
    return spark.createDataFrame(rows, schema)


def test_deletion_variants_shape(spark):
    out = (
        spark.createDataFrame([("abc",)], "s string")
        .select(linkage.deletion_variants("s").alias("v"))
        .collect()[0].v
    )
    # identity + one per deleted position (all distinct here)
    assert sorted(out) == sorted(["abc", "bc", "ac", "ab"])


def test_edit1_finds_sub_ins_del_and_exact(spark):
    left = _df(spark, [
        (1, "kitten"),    # exact dup of right 10
        (2, "kitzen"),    # substitution
        (3, "kiten"),     # deletion
        (4, "kittten"),   # insertion
        (5, "sitting"),   # distance 3 — must NOT match
    ])
    right = _df(spark, [(10, "kitten")], "rid bigint, rname string")
    pairs = linkage.edit1_candidate_pairs(
        left, right, "id", "rid", "name", "rname")
    got = {(r.id, r.rid, r.lev) for r in pairs.collect()}
    assert got == {(1, 10, 0), (2, 10, 1), (3, 10, 1), (4, 10, 1)}


def test_edit1_no_false_candidates_survive_verify(spark):
    # same deletion variant ("ab") arises from "aab" and "abb" — they are
    # lev 1 from each other, but "axb" vs "ayb" share "ab" too and are
    # ALSO lev 1; a genuinely distant collision must be filtered
    left = _df(spark, [(1, "abcd")])
    right = _df(spark, [(2, "dcba")], "rid bigint, rname string")
    pairs = linkage.edit1_candidate_pairs(
        left, right, "id", "rid", "name", "rname")
    assert pairs.count() == 0


def test_edit1_hot_block_guard_cuts_mass_duplicates(spark):
    # 50 identical right-side names: the identity variant's block is 50
    # deep; with max_block_size=10 the guard cuts it and reports the cut
    left = _df(spark, [(1, "dup")])
    right = _df(spark, [(i, "dup") for i in range(50)],
                "rid bigint, rname string")
    stats: dict = {}
    pairs = linkage.edit1_candidate_pairs(
        left, right, "id", "rid", "name", "rname",
        max_block_size=10, stats=stats)
    assert pairs.count() == 0
    assert stats["hot_keys"] > 0


def test_edit1_partition_layout_invariant(spark):
    left = _df(spark, [(i, f"name{i:04d}") for i in range(40)])
    right = _df(spark, [(i + 100, f"name{i:04d}") for i in range(40)],
                "rid bigint, rname string")
    a = {(r.id, r.rid) for r in linkage.edit1_candidate_pairs(
        left, right, "id", "rid", "name", "rname").collect()}
    b = {(r.id, r.rid) for r in linkage.edit1_candidate_pairs(
        left.repartition(7), right.repartition(3),
        "id", "rid", "name", "rname").collect()}
    assert a == b and len(a) >= 40


def test_char_ngrams_and_jaccard(spark):
    row = (
        spark.createDataFrame([("abab", "abab"), ("abcd", "wxyz")],
                              "a string, b string")
        .select(linkage.jaccard_micro(
            linkage.char_ngrams("a"), linkage.char_ngrams("b")).alias("j"))
        .collect()
    )
    assert row[0].j == 1_000_000  # identical trigram sets
    assert row[1].j == 0          # disjoint


def test_rare_token_block_key_prefers_low_df(spark):
    df = _df(spark, [
        (1, "common zebra"),
        (2, "common yak"),
        (3, "common zebra"),
    ])
    out = {r.id: r.block_key
           for r in linkage.rare_token_block_key(df, "id", "name").collect()}
    # "yak" df=1 beats "common" df=3; zebra df=2 beats common
    assert out == {1: "zebra", 2: "yak", 3: "zebra"}


def test_token_block_pairs_scores_and_guards(spark):
    left = _df(spark, [(1, "golden retriever"), (2, "blue whale")])
    right = _df(spark, [(11, "golden retriver"), (12, "red panda")],
                "rid bigint, rname string")
    pairs = linkage.token_block_pairs(
        left, right, "id", "rid", "name", "rname")
    got = {(r.id, r.rid): r.jaccard_micro for r in pairs.collect()}
    # "golden" blocks 1<->11; score is high but below exact
    assert (1, 11) in got and 500_000 < got[(1, 11)] < 1_000_000
    assert all(k == (1, 11) for k in got)


def test_best_match_deterministic_tie_break(spark):
    pairs = spark.createDataFrame(
        [(1, 30, 1), (1, 20, 1), (1, 10, 2), (2, 5, 0)],
        "lid bigint, rid bigint, lev int")
    out = {r.lid: (r.rid, r.lev)
           for r in linkage.best_match(pairs, "lid", "rid", "lev").collect()}
    # lid 1: min lev=1 held by rids {20,30} -> smallest rid wins
    assert out == {1: (20, 1), 2: (5, 0)}


def test_best_match_descending_score(spark):
    pairs = spark.createDataFrame(
        [(1, 7, 900_000), (1, 3, 900_000), (1, 9, 100_000)],
        "lid bigint, rid bigint, jaccard_micro bigint")
    out = linkage.best_match(
        pairs, "lid", "rid", "jaccard_micro", ascending=False).collect()
    assert (out[0].rid, out[0].jaccard_micro) == (3, 900_000)
