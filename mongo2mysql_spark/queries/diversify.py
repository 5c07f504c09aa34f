"""Diversity-selection branches (extension layer): MMR-diversified
retrieval and greedy k-center coreset selection, served as 'mmr' /
'kcenter' branches of the `ann_topk_ivf` slot (the registry holds
exactly 50 entries — COVERAGE.md slot policy — so same-family results
multiplex into one tagged slot).

Oracle parity: the greedy loops are UNROLLED into chained CTEs (one
pair of argmax-resolve CTEs per pick — no recursive-CTE semantics in
the hash contract).  Both engines resolve every argmax the same
tie-safe way: max(score) first, then min(id) among exact-equals; the
scores themselves are the ROUND(·,6) fold cosine / fixed-order squared
-L2 fold, bit-identical by the functions/vector.py contract, and the
MMR combine is two products and a subtract with literal λ on both
sides (the Python-float λ and 1−λ are emitted via ``repr`` so the SQL
literal parses to the same double Spark's ``F.lit`` carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.vector import sql_dot, sql_norm
from mongo2mysql_spark.operators.diversify import sql_l2sq

N_QUERIES = 5
MMR_K = 5
MMR_OVERFETCH = 5  # candidate pool = MMR_K * MMR_OVERFETCH per query
MMR_LAM = 0.7
KC_K = 6


def _cos(a: str, b: str) -> str:
    return f"ROUND({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}), 6)"


def _mmr_ctes(k: int, n_cand: int, lam: float) -> tuple[str, list[str]]:
    """Unrolled MMR greedy as chained CTEs.  Returns (cte_sql, pick
    CTE names in rank order); each pick CTE has (query_id, sid, score).
    """
    lam_s = f"CAST({lam!r} AS DOUBLE)"
    oml_s = f"CAST({1.0 - lam!r} AS DOUBLE)"
    ctes = [
        f"""mmrscore AS MATERIALIZED (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_cos('q.embedding', 'e.embedding')} AS rel
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES})""",
        f"""mmrcand AS MATERIALIZED (
      SELECT query_id, neighbor_id, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, neighbor_id) AS rn
        FROM mmrscore)
      WHERE rn <= {n_cand})""",
        f"""mmrsims AS MATERIALIZED (
      SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
             {_cos('ea.embedding', 'eb.embedding')} AS sim
      FROM mmrcand a
      JOIN mmrcand b ON b.query_id = a.query_id
                    AND b.neighbor_id <> a.neighbor_id
      JOIN embeddings ea ON ea.vec_id = a.neighbor_id
      JOIN embeddings eb ON eb.vec_id = b.neighbor_id)""",
        """mmrb1 AS MATERIALIZED (
      SELECT query_id, max(rel) AS score FROM mmrcand GROUP BY query_id)""",
        """mmrs1 AS MATERIALIZED (
      SELECT c.query_id, min(c.neighbor_id) AS sid, b.score
      FROM mmrcand c JOIN mmrb1 b ON b.query_id = c.query_id
                                 AND c.rel = b.score
      GROUP BY c.query_id, b.score)""",
    ]
    picks = ["mmrs1"]
    sel_union = "SELECT query_id, sid FROM mmrs1"
    for t in range(2, k + 1):
        ctes.append(f"mmrsel{t - 1} AS MATERIALIZED ({sel_union})")
        ctes.append(
            f"""mmrg{t} AS MATERIALIZED (
      SELECT s.query_id, s.a_id,
             ({lam_s} * c.rel) - ({oml_s} * max(s.sim)) AS mmr
      FROM mmrsims s
      JOIN mmrsel{t - 1} x ON x.query_id = s.query_id AND x.sid = s.b_id
      JOIN mmrcand c ON c.query_id = s.query_id AND c.neighbor_id = s.a_id
      WHERE NOT EXISTS (SELECT 1 FROM mmrsel{t - 1} y
                        WHERE y.query_id = s.query_id AND y.sid = s.a_id)
      GROUP BY s.query_id, s.a_id, c.rel)"""
        )
        ctes.append(
            f"""mmrb{t} AS MATERIALIZED (
      SELECT query_id, max(mmr) AS score FROM mmrg{t} GROUP BY query_id)"""
        )
        ctes.append(
            f"""mmrs{t} AS MATERIALIZED (
      SELECT g.query_id, min(g.a_id) AS sid, b.score
      FROM mmrg{t} g JOIN mmrb{t} b ON b.query_id = g.query_id
                                   AND g.mmr = b.score
      GROUP BY g.query_id, b.score)"""
        )
        picks.append(f"mmrs{t}")
        sel_union += f" UNION ALL SELECT query_id, sid FROM mmrs{t}"
    return ",\n    ".join(ctes), picks


def _kcenter_ctes(k: int) -> tuple[str, list[str]]:
    """Unrolled farthest-first traversal.  Returns (cte_sql, center CTE
    names); kc1 has (sid), kc2.. have (sid, radius)."""
    ctes = [
        "kc1 AS MATERIALIZED (SELECT min(vec_id) AS sid FROM embeddings)",
        f"""kd1 AS MATERIALIZED (
      SELECT e.vec_id AS pid,
             e.embedding AS v,
             {sql_l2sq('e.embedding', 'c.embedding')} AS dmin
      FROM embeddings e, embeddings c
      WHERE c.vec_id = (SELECT sid FROM kc1))""",
    ]
    names = ["kc1"]
    sel = "SELECT sid FROM kc1"
    for t in range(2, k + 1):
        prev = f"kd{t - 1}"
        ctes.append(
            f"""kb{t} AS MATERIALIZED (
      SELECT max(dmin) AS radius FROM {prev}
      WHERE pid NOT IN ({sel}))"""
        )
        ctes.append(
            f"""kc{t} AS MATERIALIZED (
      SELECT min(pid) AS sid, (SELECT radius FROM kb{t}) AS radius
      FROM {prev}
      WHERE dmin = (SELECT radius FROM kb{t})
        AND pid NOT IN ({sel}))"""
        )
        names.append(f"kc{t}")
        sel += f" UNION ALL SELECT sid FROM kc{t}"
        if t < k:
            ctes.append(
                f"""kd{t} AS MATERIALIZED (
      SELECT d.pid, d.v,
             least(d.dmin, {sql_l2sq('d.v', 'c.embedding')}) AS dmin
      FROM {prev} d, embeddings c
      WHERE c.vec_id = (SELECT sid FROM kc{t}))"""
            )
    return ",\n    ".join(ctes), names


_DIV_MEMO: dict[tuple, dict] = {}


def diversify_branches(spark, sf_dir: str, e: DataFrame) -> dict[str, DataFrame]:
    """The two diversity branches in `ann_topk_ivf`'s union shape:
    'mmr' maps relevance onto the slot's ``cosine`` column (it IS the
    ROUND(·,6) query cosine) and carries the pick-time criterion in
    ``score``; 'kcenter' is corpus-global (NULL query_id/cosine) with
    the squared cover radius in ``score``.  Memoized per
    (application, sf_dir) — see the build() comment.  Registered under
    `ann_topk_ivf` rather than an own slot per the registry slot
    policy (COVERAGE.md — the driver checks at most 50 entries)."""
    from mongo2mysql_spark.operators.diversify import kcenter_select, mmr_topk
    from mongo2mysql_spark.queries import slot_memo

    def build() -> dict:
        q = e.filter(F.col("vec_id") < N_QUERIES)
        mmr = mmr_topk(
            e, q, "vec_id", "embedding",
            k=MMR_K, overfetch=MMR_OVERFETCH, lam=MMR_LAM,
        ).select(
            "query_id",
            "neighbor_id",
            F.col("relevance").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
            "score",
        )
        kc = kcenter_select(e, "vec_id", "embedding", k=KC_K).select(
            F.lit(None).cast("bigint").alias("query_id"),
            F.col("center_id").alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
            F.col("radius").alias("score"),
        )
        # selections are write-once artifacts (a deployment runs the
        # greedy once, reads the picks many times); the unrolled greedy
        # also costs real driver-side ANALYSIS (deep plans), so pay it
        # once per (application, sf_dir)
        return {"mmr": mmr.localCheckpoint(), "kcenter": kc.localCheckpoint()}

    return slot_memo(_DIV_MEMO, spark, sf_dir, build)


def diversify_oracle_parts() -> tuple[str, str]:
    """(ctes, union_legs) for splicing into `ann_topk_ivf`'s oracle.
    The legs emit the slot's shared columns; the caller appends its
    other branches' NULL fill for ``score`` and these legs fill the
    caller's extra columns with NULLs via the shared tail constant."""
    mmr_ctes, mmr_picks = _mmr_ctes(MMR_K, MMR_K * MMR_OVERFETCH, MMR_LAM)
    kc_ctes, kc_names = _kcenter_ctes(KC_K)
    ctes = f"{mmr_ctes},\n    {kc_ctes}"
    legs = []
    for t, name in enumerate(mmr_picks, start=1):
        legs.append(
            f"""SELECT 'mmr' AS branch, s.query_id, s.sid AS neighbor_id,
           c.rel AS cosine, CAST({t} AS INTEGER) AS rank,
           CAST(NULL AS BIGINT) AS anchor_id,
           CAST(NULL AS BIGINT) AS positive_id,
           CAST(NULL AS DOUBLE) AS pos_cos,
           CAST(NULL AS BIGINT) AS negative_id,
           CAST(NULL AS DOUBLE) AS neg_cos,
           CAST(NULL AS DOUBLE) AS adc_d2,
           s.score
    FROM {name} s JOIN mmrcand c ON c.query_id = s.query_id
                                AND c.neighbor_id = s.sid"""
        )
    legs.append(
        """SELECT 'kcenter' AS branch, CAST(NULL AS BIGINT) AS query_id,
           sid AS neighbor_id, CAST(NULL AS DOUBLE) AS cosine,
           CAST(1 AS INTEGER) AS rank,
           CAST(NULL AS BIGINT) AS anchor_id,
           CAST(NULL AS BIGINT) AS positive_id,
           CAST(NULL AS DOUBLE) AS pos_cos,
           CAST(NULL AS BIGINT) AS negative_id,
           CAST(NULL AS DOUBLE) AS neg_cos,
           CAST(NULL AS DOUBLE) AS adc_d2,
           CAST(NULL AS DOUBLE) AS score
    FROM kc1"""
    )
    for t, name in enumerate(kc_names[1:], start=2):
        legs.append(
            f"""SELECT 'kcenter' AS branch, CAST(NULL AS BIGINT) AS query_id,
           sid AS neighbor_id, CAST(NULL AS DOUBLE) AS cosine,
           CAST({t} AS INTEGER) AS rank,
           CAST(NULL AS BIGINT) AS anchor_id,
           CAST(NULL AS BIGINT) AS positive_id,
           CAST(NULL AS DOUBLE) AS pos_cos,
           CAST(NULL AS BIGINT) AS negative_id,
           CAST(NULL AS DOUBLE) AS neg_cos,
           CAST(NULL AS DOUBLE) AS adc_d2,
           radius AS score
    FROM {name}"""
        )
    return ctes, "\n    UNION ALL\n    ".join(legs)
