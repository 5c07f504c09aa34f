"""Market-basket association rules — frequent co-occurring item pairs
with support/confidence/lift (extension layer — the reference's 556-LoC
ETL core, Porter.php, has no analytics surface).

The Agrawal & Srikant VLDB 1994 Apriori shape restricted to pairs (the
readout that drives recommendations and co-purchase analysis), built so
every stage is bounded and the whole frame hash-verifies cross-engine:

- baskets dedup to DISTINCT (basket, item) — an item twice in one
  basket counts once;
- the Apriori pruning step runs FIRST: items below ``min_item_count``
  are dropped via a broadcast join of the (small, frequent-only) item
  count table, so the pair self-join never sees infrequent items —
  candidate pairs shrink quadratically with the prune;
- pairs generate by a self-equi-join on the basket key with the
  ``item_a < item_b`` canonical order — per-basket cost O(k²) in the
  basket SIZE (orders hold a handful of items; the join key is the
  basket, so no item hot key), never corpus²;
- support/confidence qualify on integer counts; the three floats
  served (conf_a2b, conf_b2a, lift) are each ONE IEEE division of
  exact integers — lift's operands staged as n_ab·N and n_a·n_b.

Plan: dedup shuffle on (basket, item) → broadcast prune → self-join
shuffled on basket → pair-count hash aggregate (map-side combined) →
two broadcast joins back to item counts.  The basket-count scalar rides
a 1-row broadcast crossJoin (the house-allowlisted pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 10,
    min_pair_count: int = 3,
) -> DataFrame:
    """Qualifying item pairs: (item_a, item_b, n_a, n_b, n_ab,
    n_baskets, conf_a2b, conf_b2a, lift) with item_a < item_b,
    n_a/n_b ≥ min_item_count and n_ab ≥ min_pair_count."""
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    counts = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    freq = counts.filter(F.col("n_item") >= min_item_count)
    fitems = items.join(F.broadcast(freq.select("item")), "item")
    a = fitems.select(
        F.col("basket"), F.col("item").alias("item_a")
    )
    b = fitems.select(
        F.col("basket"), F.col("item").alias("item_b")
    )
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    n_baskets = items.select("basket").distinct().select(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    out = (
        pairs.join(
            F.broadcast(
                freq.select(
                    F.col("item").alias("item_a"),
                    F.col("n_item").alias("n_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                freq.select(
                    F.col("item").alias("item_b"),
                    F.col("n_item").alias("n_b"),
                )
            ),
            "item_b",
        )
        # 1-row broadcast crossJoin: the scalar basket count (bounded —
        # the standing allowlisted pattern, see tools/plan_audit.py)
        .crossJoin(F.broadcast(n_baskets))
    )
    lift_num = (
        F.col("n_ab").cast("decimal(19,0)")
        * F.col("n_baskets").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    lift_den = (
        F.col("n_a").cast("decimal(19,0)")
        * F.col("n_b").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        "n_baskets",
        (F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
            "conf_a2b"
        ),
        (F.col("n_ab").cast("double") / F.col("n_b").cast("double")).alias(
            "conf_b2a"
        ),
        (lift_num.cast("double") / lift_den.cast("double")).alias("lift"),
    )


def association_rules_sql(
    source_cte: str,
    basket_col: str,
    item_col: str,
    min_item_count: int = 10,
    min_pair_count: int = 3,
) -> str:
    """DuckDB restatement; a final CTE ``brules(item_a, item_b, n_a,
    n_b, n_ab, n_baskets, conf_a2b, conf_b2a, lift)`` with the
    identical arithmetic chain."""
    return f"""bitems AS MATERIALIZED (
      SELECT DISTINCT {basket_col} AS basket, {item_col} AS item
      FROM {source_cte}),
    bcounts AS MATERIALIZED (
      SELECT item, CAST(count(*) AS BIGINT) AS n_item
      FROM bitems GROUP BY item HAVING count(*) >= {min_item_count}),
    bfitems AS (
      SELECT i.basket, i.item FROM bitems i
      JOIN bcounts c ON c.item = i.item),
    bpairs AS (
      SELECT x.item AS item_a, y.item AS item_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM bfitems x JOIN bfitems y
        ON x.basket = y.basket AND x.item < y.item
      GROUP BY 1, 2 HAVING count(*) >= {min_pair_count}),
    bn AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
           FROM bitems),
    brules AS (
      SELECT p.item_a, p.item_b, ca.n_item AS n_a, cb.n_item AS n_b,
             p.n_ab, bn.n_baskets,
             CAST(p.n_ab AS DOUBLE) / CAST(ca.n_item AS DOUBLE)
               AS conf_a2b,
             CAST(p.n_ab AS DOUBLE) / CAST(cb.n_item AS DOUBLE)
               AS conf_b2a,
             CAST(CAST(CAST(p.n_ab AS HUGEINT) * bn.n_baskets
                       AS DECIMAL(38,0)) AS DOUBLE)
               / CAST(CAST(CAST(ca.n_item AS HUGEINT) * cb.n_item
                           AS DECIMAL(38,0)) AS DOUBLE) AS lift
      FROM bpairs p
      JOIN bcounts ca ON ca.item = p.item_a
      JOIN bcounts cb ON cb.item = p.item_b
      CROSS JOIN bn)"""
