"""Diversity-aware selection over embedding columns (extension layer —
training-data curation; the reference's 556-LoC ETL core has no vector
surface, see SURVEY.md §2 Part B).

Two greedy selectors that complement the pure-similarity ANN ladder
(operators/similarity.py, operators/pq.py):

- **MMR** (Maximal Marginal Relevance — Carbonell & Goldstein, SIGIR
  1998): re-rank a retrieved candidate set so each pick balances query
  relevance against redundancy with what was already picked:
  ``argmax  λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)``.  This is
  the standard diversification pass of retrieval-augmented pipelines
  and of "select informative examples" data-curation loops — without
  it, the top-k of any dense retriever is k near-copies of the same
  passage.
- **k-center / farthest-first traversal** (Gonzalez, TCS 1985; the
  coreset selector of Sener & Savarese, ICLR 2018): greedily pick the
  point farthest from everything picked so far.  The selected set is a
  2-approximation of the optimal k-center cover — the classic "small
  representative subset" primitive for embedding-space data pruning
  and diversity sampling.

Both algorithms are greedy-SEQUENTIAL by definition (pick t depends on
picks 1..t−1), so the distributed shape matters more than usual:

- MMR never touches the corpus after the candidate prune: candidates
  per query are bounded at ``k·overfetch`` (the prune rides
  ``salted_topk_per_group`` — no per-query reducer funnel), the
  pairwise-sim frame is Q·C² rows built ONCE, and each greedy step is
  an aggregate + broadcast-sized join over those bounded frames.  At
  100 TB the only corpus-sized work is the retrieval itself, which is
  whatever ANN funnel feeds this (brute force here; IVF/PQ/BQ in a
  deployment — MMR only needs (id, rel) + vectors of the C finalists).
- k-center keeps ONE corpus-sized frame: (id, vec, dmin), where dmin
  is the running distance-to-selected-set.  Each of the k steps is one
  argmax over dmin (map-side ``max``, then a min-id tie resolve) plus
  one map-only ``least(dmin, d²(vec, new_center))`` update against the
  1-row broadcast new center — O(k·N) distance evaluations total, the
  textbook distributed farthest-first.  The frame is lineage-truncated
  per step (``localCheckpoint``) so step t does not recompute steps
  1..t−1; at cluster scale the same role is played by persisting the
  (id, dmin) pair and re-reading vectors from the (columnar) source.

Determinism contract (both engines, bit-exact): relevance and pairwise
similarity are the ROUND(·, 6) sequential-fold cosine of
functions/vector.py; squared L2 is the same fixed-order fold over
(x−y)²; every argmax resolves as max(score) FIRST, then min(id) among
exact-equals — no ``max_by`` tie ambiguity in either engine; the MMR
combine ``(λ·rel) − ((1−λ)·maxsim)`` is two products and one subtract
on identical doubles with literal λ.  The DuckDB oracle unrolls the
same k steps as chained CTEs (no recursive-CTE semantics in the hash
contract), see queries/diversify.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.vector import dot_seq, norm_seq
from mongo2mysql_spark.operators.skew import salted_topk_per_group


def l2sq_seq(a: Column, b: Column) -> Column:
    """Squared euclidean distance as a fixed-order double fold:
    ``((0+(x₁−y₁)²)+(x₂−y₂)²)+…`` — same IEEE sequence in the DuckDB
    mirror (:func:`sql_l2sq`), so distances hash bit-identically."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def sql_l2sq(a: str, b: str) -> str:
    """DuckDB mirror of :func:`l2sq_seq` (same fold order, same seed)."""
    term = "(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"z -> {term} * {term})), (acc, v) -> acc + v)"
    )


def _cosine(a: Column, b: Column) -> Column:
    return F.round(dot_seq(a, b) / (norm_seq(a) * norm_seq(b)), 6)


def _argmax_min_id(
    df: DataFrame, group_cols: list[str], score_col: str, id_col: str
) -> DataFrame:
    """Tie-safe argmax: max(score) per group, then min(id) among rows
    equal to it.  Float equality is sound here because both operands
    come from the SAME evaluation of the same expression set.  Output:
    group_cols + (sid, score)."""
    best = df.groupBy(*group_cols).agg(F.max(score_col).alias("score"))
    joined = (
        df.join(best, group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(best))
    )
    at_best = joined.filter(F.col(score_col) == F.col("score"))
    return at_best.groupBy(*group_cols, "score").agg(F.min(id_col).alias("sid"))


def mmr_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_cand: int,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Stage 1 of MMR: per-query candidate prune + pairwise sims.

    Returns ``(cand, sims)``: ``cand`` = (query_id, neighbor_id, rel),
    the salted top-``n_cand`` by (rel DESC, id) — bounded per query by
    construction; ``sims`` = (query_id, a_id, b_id, sim) over ordered
    candidate pairs of the same query (Q·C·(C−1) rows).  Both are
    lineage-truncated (``checkpoint=False`` skips that — plan tests
    inspect the raw frames): the greedy steps reference them k times
    each.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm_seq(F.col(vec_col)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm_seq(F.col(vec_col)).alias("__cnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_seq(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                6,
            ).alias("rel"),
        )
    )
    cand = salted_topk_per_group(
        scored,
        ["query_id"],
        [F.col("rel").desc(), F.col("neighbor_id").asc()],
        n_cand,
    ).drop("rank")
    # candidate vectors: broadcast the bounded candidate list INTO the
    # corpus scan (never shuffle the corpus on id)
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    ).join(F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
    a = cv.select(
        "query_id",
        F.col("neighbor_id").alias("a_id"),
        F.col("__v").alias("__va"),
    )
    b = cv.select(
        "query_id",
        F.col("neighbor_id").alias("b_id"),
        F.col("__v").alias("__vb"),
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id",
            "a_id",
            "b_id",
            _cosine(F.col("__va"), F.col("__vb")).alias("sim"),
        )
    )
    if not checkpoint:
        return cand, sims
    # EAGER: the greedy steps reference these k times each, and a lazy
    # checkpoint keeps the deep logical tree alive — every later step
    # then re-ANALYZES the whole tree (measured ~6s of driver-side
    # analyzer wall on a 5-step unroll); eager materialization makes
    # every later plan start from a flat LogicalRDD
    return cand.localCheckpoint(), sims.localCheckpoint()


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    overfetch: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """MMR-diversified top-k per query (Carbonell & Goldstein 1998).

    Pick 1 is the plain relevance argmax; pick t maximizes
    ``λ·rel − (1−λ)·max_sim_to_selected`` over the remaining
    candidates.  ``λ=1`` degenerates to the relevance top-k exactly
    (tested); smaller λ trades relevance for spread.

    Output: (query_id, neighbor_id, rank, relevance, score) — ``score``
    is the criterion value at pick time (rank 1: the relevance itself).
    The greedy loop is unrolled k times over the BOUNDED candidate
    frames of :func:`mmr_candidates`; each pick is localCheckpoint-ed
    (≤ Q rows) so step t's anti-join and max-sim join reference flat
    lineage, not a 2^t expression tree (checkpoints are EAGER — see
    mmr_candidates — so each step's analysis starts flat).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cand, sims = mmr_candidates(corpus, queries, id_col, vec_col, k * overfetch)
    lam_c = F.lit(lam)
    one_minus = F.lit(1.0 - lam)

    picks: list[DataFrame] = []
    # step 1: argmax relevance
    p1 = _argmax_min_id(cand, ["query_id"], "rel", "neighbor_id")
    picks.append(p1.select("query_id", "sid", "score").localCheckpoint())
    sel = picks[0].select("query_id", "sid")
    for _ in range(1, k):
        rem = cand.join(
            sel.withColumnRenamed("sid", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        maxsim = (
            sims.join(sel.withColumnRenamed("sid", "b_id"), ["query_id", "b_id"])
            .groupBy("query_id", "a_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        scored = rem.join(
            maxsim.withColumnRenamed("a_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        ).withColumn(
            "mmr", (lam_c * F.col("rel")) - (one_minus * F.col("maxsim"))
        )
        p = _argmax_min_id(scored, ["query_id"], "mmr", "neighbor_id")
        picks.append(
            p.select("query_id", "sid", "score").localCheckpoint()
        )
        sel = sel.unionByName(picks[-1].select("query_id", "sid"))

    out = None
    for rank, p in enumerate(picks, start=1):
        step = p.withColumn("rank", F.lit(rank))
        out = step if out is None else out.unionByName(step)
    # attach the plain relevance of each picked candidate
    return (
        out.join(
            cand.withColumnRenamed("neighbor_id", "sid"), ["query_id", "sid"]
        )
        .select(
            "query_id",
            F.col("sid").alias("neighbor_id"),
            "rank",
            F.col("rel").alias("relevance"),
            "score",
        )
    )


def kcenter_select(
    df: DataFrame, id_col: str, vec_col: str, k: int = 6
) -> DataFrame:
    """Greedy k-center (farthest-first traversal, Gonzalez 1985): seed
    with the min-id point (deterministic, seed-free), then k−1 times
    pick the point with the largest squared distance to its nearest
    already-selected center.

    Output: (center_id, rank, radius) — ``radius`` is the squared
    distance that made the pick (the current cover radius; NULL for the
    seed).  Radii are non-increasing (tested) — reading the radius
    curve IS the "how many clusters does my corpus have" diagnostic.

    Scale: one (id, vec, dmin) frame updated by a map-only
    ``least(dmin, d²(vec, center))`` against a 1-row broadcast center —
    k passes, O(k·N) distance folds, no shuffle of the corpus at any
    step (argmax is a map-side max + one tiny equality resolve).
    """
    base = df.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("__v"))
    seed = base.groupBy().agg(F.min("pid").alias("sid")).localCheckpoint()
    seed_vec = base.join(
        F.broadcast(seed.withColumnRenamed("sid", "pid")), "pid"
    ).select(F.col("__v").alias("__cv"))
    cur = base.crossJoin(F.broadcast(seed_vec)).select(
        "pid", "__v", l2sq_seq(F.col("__v"), F.col("__cv")).alias("dmin")
    )
    rows = [
        seed.select(
            F.col("sid").alias("center_id"),
            F.lit(1).alias("rank"),
            F.lit(None).cast("double").alias("radius"),
        )
    ]
    selected = seed.select(F.col("sid").alias("pid"))
    for rank in range(2, k + 1):
        cur = cur.localCheckpoint()
        remaining = cur.join(F.broadcast(selected), "pid", "left_anti")
        pick = _argmax_min_id(remaining, [], "dmin", "pid").localCheckpoint()
        rows.append(
            pick.select(
                F.col("sid").alias("center_id"),
                F.lit(rank).alias("rank"),
                F.col("score").alias("radius"),
            )
        )
        selected = selected.unionByName(pick.select(F.col("sid").alias("pid")))
        pick_vec = base.join(
            F.broadcast(pick.withColumnRenamed("sid", "pid").select("pid")),
            "pid",
        ).select(F.col("__v").alias("__cv"))
        cur = cur.crossJoin(F.broadcast(pick_vec)).select(
            "pid",
            "__v",
            F.least(
                F.col("dmin"), l2sq_seq(F.col("__v"), F.col("__cv"))
            ).alias("dmin"),
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
