"""Model-based document quality classification (extension layer): the
fasttext-shaped linear classifier over hashed n-gram features that
GPT-3/LLaMA-class pipelines use as a corpus quality gate (Brown et al.
2020, Appendix A; Touvron et al. 2023 §2): train on "high-quality
reference vs raw web" labels, score every document, keep by score.
Complements the rule-based heuristics (functions/text.quality_score)
and the generative LM gate (operators/lm.py) with the discriminative
member of the family.

Rebuilt relationally — no MLlib dependency, no Python UDF anywhere:

- featurize: ``operators/dsir.hashed_grams`` (unigram+bigram md5
  buckets) compacted to (id, bucket, cnt) and L1-normalized per
  document (cnt / total grams) so scores stay bounded regardless of
  document length — the same feature table DSIR uses, computed once;
- model: binary logistic regression by full-batch gradient descent.
  One iteration is exactly two shuffles over the persisted compacted
  table: scores = broadcast-join against the (bucket, w) weight table
  + groupBy(id); per-bucket gradient = join the per-doc error back and
  groupBy(bucket).  The gradient is bucket-sized (m entries,
  thousands) — it collects to the driver, the weights update there,
  and the new weight table broadcasts into the next iteration.  The
  corpus itself is never collected;
- serve: one broadcast-join + groupBy pass → (id, score, keep) —
  identical plan shape to DSIR scoring.

Scale: train on a labeled SAMPLE (gradients only need sample
statistics — the sample is a parameter, not baked in), serve the
broadcast model over the full corpus.  At any scale an iteration's
cost is two partial-aggregating shuffles of the compacted count table.

Determinism note: weight values inherit float-sum ordering noise
(~ulps) and libm's sigmoid, so they are NOT hash-contract material;
the KEEP decision is the sign of a linear score with O(1) margins on
anything the gate should act on, which is why the driver row verifies
integer confusion counts and verdicts, never the float weights
(the repo-wide rule: no transcendental-derived hashed values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_features(counts: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, bucket, x) with x = 100 · cnt / doc total — the per-doc
    percent frequency of each hashed n-gram bucket, sparse row form.
    ``counts`` is an ``operators/dsir.bucket_counts`` table.  The
    length normalization makes scores document-length-invariant; the
    ×100 puts individual features at O(1) so unit learning rates move
    the informative coordinates in a handful of iterations."""
    totals = counts.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    return counts.join(totals, id_col).select(
        id_col,
        "bucket",
        (F.lit(100.0) * F.col("cnt").cast("double") / F.col("__tot").cast("double")).alias("x"),
    )


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "y",
    n_iters: int = 12,
    lr: float = 1.0,
    l2: float = 1e-6,
) -> tuple[DataFrame, float, list[float]]:
    """Fit the logistic model; returns (weights (bucket, w), bias,
    per-iteration log-loss trace).

    ``features`` is :func:`normalized_features` output; ``labels`` is
    (id, y) with y in {0, 1}.  Docs without features (empty text)
    train on the bias alone.  The loss trace lets callers assert the
    descent actually descended (the driver row's loss_decreased
    verdict).

    Updates are Adagrad (per-coordinate step ``lr·g/√(Σg²)``): L1-
    normalized n-gram frequencies span orders of magnitude per bucket,
    so a single global step size either crawls on the rare informative
    buckets or destabilizes the bias — per-coordinate scaling makes a
    dozen full-batch iterations enough on anything a gate should act
    on.  The accumulator state is bucket-sized, driver-held.
    """
    spark = features.sparkSession
    data = (
        features.join(labels.select(id_col, label_col), id_col)
        .select(id_col, "bucket", "x", F.col(label_col).alias("__y"))
        .persist()
    )
    doc_labels = labels.select(id_col, F.col(label_col).alias("__y")).persist()
    n = doc_labels.count()
    weights: dict[int, float] = {}
    g2: dict[int, float] = {}  # Adagrad per-coordinate accumulators
    bias, bias_g2 = 0.0, 0.0
    losses: list[float] = []
    for _ in range(n_iters):
        if weights:
            wdf = spark.createDataFrame(
                list(weights.items()), "bucket long, w double"
            )
            scores = (
                data.join(F.broadcast(wdf), "bucket", "left")
                .groupBy(id_col)
                .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0.0))).alias("__s"))
            )
        else:  # first pass: all-zero weights, skip the join
            scores = data.groupBy(id_col).agg(F.lit(0.0).alias("__s"))
        # docs with no grams score bias-only via the left join
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce("__s", F.lit(0.0)) + bias)))
        err = (
            doc_labels.join(scores, id_col, "left")
            .select(
                id_col,
                "__y",
                p.alias("__p"),
                (p - F.col("__y")).alias("__e"),
            )
            .persist()
        )
        stats = err.agg(
            F.sum("__e").alias("be"),
            F.sum(
                -F.col("__y") * F.log(F.greatest(F.col("__p"), F.lit(1e-12)))
                - (1 - F.col("__y"))
                * F.log(F.greatest(1 - F.col("__p"), F.lit(1e-12)))
            ).alias("loss"),
        ).first()
        losses.append(float(stats["loss"]) / n)
        grad_rows = (
            data.join(err.select(id_col, "__e"), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("__e")).alias("g"))
            .collect()
        )
        err.unpersist()
        for r in grad_rows:
            b = r["bucket"]
            g = r["g"] / n + l2 * weights.get(b, 0.0)
            g2[b] = g2.get(b, 0.0) + g * g
            weights[b] = weights.get(b, 0.0) - lr * g / (g2[b] ** 0.5 + 1e-10)
        bg = float(stats["be"]) / n
        bias_g2 += bg * bg
        bias -= lr * bg / (bias_g2**0.5 + 1e-10)
    data.unpersist()
    doc_labels.unpersist()
    wdf = spark.createDataFrame(
        list(weights.items()) or [(-1, 0.0)], "bucket long, w double"
    )
    return wdf, bias, losses


def score_documents(
    features: DataFrame,
    weights: DataFrame,
    bias: float,
    id_col: str = "id",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, score, keep) — serve the broadcast model over any corpus.

    ``keep`` compares the LINEAR score against ``threshold`` (default
    0 ≡ probability 0.5): pure IEEE arithmetic, no transcendental in
    the decision path."""
    scored = (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (F.sum(F.col("x") * F.coalesce("w", F.lit(0.0))) + bias).alias("score")
        )
    )
    return scored.select(
        id_col, "score", (F.col("score") > threshold).alias("keep")
    )


def holdout_confusion(
    scored: DataFrame, labels: DataFrame, id_col: str = "id", label_col: str = "y"
) -> dict[str, int]:
    """{tp, tn, fp, fn} of ``score_documents`` output against labels —
    the integer form the hash gate wants."""
    j = scored.join(labels.select(id_col, label_col), id_col)
    row = j.agg(
        F.sum(((F.col(label_col) == 1) & F.col("keep")).cast("long")).alias("tp"),
        F.sum(((F.col(label_col) == 0) & ~F.col("keep")).cast("long")).alias("tn"),
        F.sum(((F.col(label_col) == 0) & F.col("keep")).cast("long")).alias("fp"),
        F.sum(((F.col(label_col) == 1) & ~F.col("keep")).cast("long")).alias("fn"),
    ).first()
    return {k: int(row[k] or 0) for k in ("tp", "tn", "fp", "fn")}


def loss_decreased(losses: list[float], factor: float = 2.0) -> bool:
    """Did training actually optimize?  Final log-loss must undercut
    the first iteration's (chance-level ln 2) by ``factor``."""
    return bool(losses) and losses[-1] * factor <= losses[0] + 1e-12


__all__ = [
    "normalized_features",
    "train_quality_classifier",
    "score_documents",
    "holdout_confusion",
    "loss_decreased",
]
