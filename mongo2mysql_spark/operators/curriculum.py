"""Curriculum ordering with domain interleaving (extension layer).

Curriculum training (Bengio et al., ICML 2009) feeds examples in a
deliberate order — here highest-quality first, the warm-up-on-clean-
data recipe — while large-scale pretraining simultaneously wants every
batch to MIX domains rather than stream one source at a time.  The
composition of the two is a deterministic total order: within each
domain rank documents by the curriculum score, then round-robin the
domains so position ``r·D + d`` takes the rank-``r`` document of
domain ``d``.

Spark shape (the 100 TB point): a naive "global ORDER BY
(score, ...)" is a single-reducer sort of the corpus — banned plan
shape.  Here the ordering work is ONE window partitioned by domain
(each domain sorts in parallel; the heaviest domain bounds the task,
same skew budget as every per-key window in this engine) and the
domain index is a BOUNDED literal (|domains| values, collected once —
domains are a catalog, never corpus-sized).  The interleave position
is pure integer arithmetic, bit-exact cross-engine.  Positions are
unique (a total order) but intentionally not dense when domain sizes
differ — consumers order by position, they don't index by it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def curriculum_interleave(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    score: Column,
) -> DataFrame:
    """(id, domain, domain_ix, intra_rank, interleave_pos): the
    deterministic domain-interleaved curriculum order.

    ``score`` is the curriculum key (higher = earlier; ties break on
    ascending id).  ``domain_ix`` is the domain's index in the sorted
    domain list; ``interleave_pos = intra_rank · D + domain_ix``."""
    # NULL domains sort first (Python sorted() would raise comparing
    # None with str); an empty input yields zero domains and must not
    # reach the no-arg F.coalesce below
    raw = [r[0] for r in df.select(domain_col).distinct().collect()]
    domains = ([None] if any(v is None for v in raw) else []) + sorted(
        v for v in raw if v is not None
    )
    n_dom = len(domains)
    if n_dom == 0:
        return df.sparkSession.createDataFrame(
            [],
            df.select(
                id_col,
                domain_col,
                F.lit(0).cast("int").alias("domain_ix"),
                F.lit(0).cast("long").alias("intra_rank"),
                F.lit(0).cast("long").alias("interleave_pos"),
            ).schema,
        )
    ix = F.coalesce(
        *[
            F.when(
                F.col(domain_col).isNull()
                if v is None
                else F.col(domain_col) == v,
                F.lit(i),
            )
            for i, v in enumerate(domains)
        ]
    ).cast("int")
    w = Window.partitionBy(domain_col).orderBy(
        score.desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col),
        F.col(domain_col),
        (F.row_number().over(w) - 1).cast("long").alias("intra_rank"),
    )
    return ranked.select(
        id_col,
        domain_col,
        ix.alias("domain_ix"),
        "intra_rank",
        (F.col("intra_rank") * n_dom + ix).cast("long").alias(
            "interleave_pos"
        ),
    )
