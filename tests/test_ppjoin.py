"""Prefix-filtered set-similarity join (operators/ppjoin): planted
pairs, completeness vs brute force, threshold arithmetic.  The
cross-engine completeness hash is pinned by test_oracle
(dedup_pair_families 'ppjoin_tokens' vs a brute-force oracle)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import tokens
from mongo2mysql_spark.operators.ppjoin import ppjoin_pairs, token_key_sets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_neardup_found_exact_score(spark):
    df = _docs(spark, [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # J = 4/6 with doc 1
        (3, "one two three four five"),           # unrelated
    ])
    got = ppjoin_pairs(df, "doc_id", tokens(F.col("text")), 3, 5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_1, r.id_2, r.inter, r.n_1, r.n_2) == (1, 2, 4, 5, 5)
    assert r.score == round(4 / 6, 6)


def test_complete_vs_bruteforce_random(spark):
    # 40 docs over a 12-word vocab -> dense overlap structure; the
    # filtered join must return EXACTLY the brute-force >= 0.5 pairs
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(vocab[j] for j in range(12) if (i >> (j % 6)) & 1 or j % (i % 5 + 2) == 0))
        for i in range(1, 41)
    ]
    df = _docs(spark, rows)
    got = {
        (r.id_1, r.id_2)
        for r in ppjoin_pairs(df, "doc_id", tokens(F.col("text")), 1, 2).collect()
    }
    toksets = {i: set(t.split(" ")) for i, t in rows}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(toksets), 2)
        if 2 * len(toksets[a] & toksets[b]) >= len(toksets[a] | toksets[b])
    }
    assert got == want and want  # non-trivial: at least one true pair


def test_length_filter_cannot_drop_true_pairs(spark):
    # sizes 4 vs 10 at t=0.5: 2*4 < 10 -> even full containment cannot
    # reach 0.5; the pair must be absent, and a 5-vs-9 containment pair
    # (J = 5/9 >= 0.5) must be present
    df = _docs(spark, [
        (1, "a b c d"),
        (2, "a b c d e f g h i j"),
        (3, "a b c d e"),
        (4, "a b c d e f g h i"),
    ])
    got = {(r.id_1, r.id_2) for r in
           ppjoin_pairs(df, "doc_id", tokens(F.col("text")), 1, 2).collect()}
    assert (1, 2) not in got
    assert (3, 4) in got


def test_rarest_first_prefix_order(spark):
    # 'rare' appears once, 'common' in every doc: rare must sort FIRST
    # in the key array (df-ascending global order)
    df = _docs(spark, [(1, "common rare"), (2, "common x"), (3, "common y")])
    keys = (
        token_key_sets(df, "doc_id", tokens(F.col("text")))
        .filter(F.col("id") == 1)
        .collect()[0]
        .keys
    )
    assert keys[0].endswith("|rare") and keys[1].endswith("|common")


def test_rejects_bad_threshold(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        ppjoin_pairs(df, "doc_id", tokens(F.col("text")), 7, 5)
