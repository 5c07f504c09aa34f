"""Domain discovery (operators/domains): permille feature semantics,
planted-cluster recovery, partition invariance.  The cross-engine hash
is pinned by test_oracle (text_term_frequency 'domains' branches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.domains import (
    assign_domains,
    discover_domains,
    doc_permille_vectors,
    domain_sizes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_permille_vectors_length_normalized(spark):
    # the same term mix at 10x and 20x length lands on (nearly) the
    # same point: the unigram/bigram mass ratio converges as n/(n-1),
    # so two long docs differ only by boundary bigrams + permille floor
    base = "alpha beta alpha gamma"
    df = _docs(
        spark,
        [(1, " ".join([base] * 10)), (2, " ".join([base] * 20))],
    )
    vecs = {r.id: list(r.v) for r in
            doc_permille_vectors(df, "doc_id", "text", n_buckets=8)
            .select("id", F.col("vec").alias("v")).collect()}
    l1 = sum(abs(a - b) for a, b in zip(vecs[1], vecs[2]))
    assert l1 <= 40, vecs
    assert sum(vecs[1]) <= 1000  # permille floor division
    assert all(float(x).is_integer() for x in vecs[1])


def test_gramless_doc_dropped(spark):
    df = _docs(spark, [(1, "hello world"), (2, None)])
    got = doc_permille_vectors(df, "doc_id", "text", n_buckets=8).collect()
    assert [r.id for r in got] == [1]


def test_planted_vocabulary_clusters_recovered(spark):
    # two disjoint vocabularies; seeds (ids 0 and 5, stride 5) land one
    # in each -> every doc must join its vocabulary's seed
    vocab_a = "stock market bond yield equity trade"
    vocab_b = "neuron synapse cortex axon dendrite glia"
    rows = [(i, vocab_a if i < 5 else vocab_b) for i in range(10)]
    assign = discover_domains(
        _docs(spark, rows), "doc_id", "text",
        n_buckets=16, k=2, stride=5, iters=1,
    )
    got = {r.id: r.domain for r in assign.collect()}
    assert all(got[i] == got[0] for i in range(5))
    assert all(got[i] == got[5] for i in range(5, 10))
    assert got[0] != got[5]
    sizes = {r.domain: r.n_docs for r in domain_sizes(assign).collect()}
    assert sorted(sizes.values()) == [5, 5]


def test_seed_underflow_raises(spark):
    """Fewer than k docs with id % stride == 0 must raise, not silently
    cluster into fewer domains (the oracle mirrors the seed rule, so a
    silent underflow would be invisible to the hash gate)."""
    import pytest

    rows = [(i, "some text here") for i in range(1, 8)]  # ids 1..7
    with pytest.raises(ValueError, match="seed docs"):
        discover_domains(
            _docs(spark, rows), "doc_id", "text",
            n_buckets=8, k=3, stride=5, iters=1,  # only id 5 qualifies
        )


def test_assignment_partition_invariant(spark):
    rows = [
        (i, f"term{i % 3} filler common word term{i % 3} extra{i % 7}")
        for i in range(60)
    ]
    df = _docs(spark, rows)
    a1 = {
        (r.id, r.domain, r.d2)
        for r in discover_domains(
            df, "doc_id", "text", n_buckets=16, k=3, stride=20, iters=1
        ).collect()
    }
    a2 = {
        (r.id, r.domain, r.d2)
        for r in discover_domains(
            df.repartition(7), "doc_id", "text",
            n_buckets=16, k=3, stride=20, iters=1,
        ).collect()
    }
    assert a1 == a2  # integer sums + fixed-order folds: order-free


def test_tie_resolves_to_min_label(spark):
    # a doc equidistant from two identical seeds must take the smaller
    # seed label on every engine
    vecs = spark.createDataFrame(
        [(7, [1.0, 0.0])], "id bigint, vec array<double>"
    )
    cents = spark.createDataFrame(
        [(5, [0.0, 0.0]), (3, [2.0, 0.0])], "cid bigint, cvec array<double>"
    )
    got = assign_domains(vecs, cents).collect()[0]
    assert got.domain == 3 and got.d2 == 1.0
