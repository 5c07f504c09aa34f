"""100x scaling probe for the heaviest operator families — measured
SHUFFLE BYTES per stage, not just wall time (the 10x probe is
scheduler-dominated at sf0.01 scale and proves little about shuffle
behavior; this one scales the shuffle-bearing inputs 1x/10x/100x and
reads the actual shuffle read/write volumes from Spark's status REST
API, per job group).

Families probed (the r10 verdict's ask: dedup pair generation + ANN
search, plus the two heaviest bench stages):

- ``lsh_pairs``   — the MinHash-LSH band self-join + est-Jaccard
  rejoin (operators/dedup.lsh_candidate_pairs) over synthetic
  signatures carrying the sf0.1 corpus's bucket-size shape (2% of
  docs in planted size-4 families, the rest singletons).  Signatures
  are synthesized because the shingle->minhash map phase is
  embarrassingly parallel (no shuffle risk); the band join IS the
  scale-bearing stage.
- ``components``  — alternating-star transitive closure
  (operators/components.connected_components) over chain+clique
  graphs, the iterative-shuffle family.
- ``ivf_probe``   — IVF cell-pruned ANN search
  (operators/similarity.topk_ivf) over the real embeddings
  replicated 1x/10x/100x (cells get denser, which is exactly how the
  corpus grows under a fixed codebook).
- ``mad_quantiles`` — grouped exact median (operators/selection.
  grouped_exact_quantiles), the resample_gapfill 'mad' branch's
  phase-1/phase-2 shape, over events replicated 1x/10x/100x (fixed
  key cardinality, 100x rows per group — the hot-group risk).

Emits one JSON line per (family, scale) and a markdown table for
COVERAGE.md.  Linear-or-better shuffle growth and wall growth well
under the row-growth factor are the pass criteria; super-linear
shuffle growth is the red flag this probe exists to catch.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongo2mysql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 100)


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def measure(spark, label: str, action):
    """Run ``action`` under a job group; return (wall_s, shuffle_write
    MB, shuffle_read MB) summed over the group's completed stages."""
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    t0 = time.time()
    out_rows = action()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    jobs = [j for j in _rest(spark, "/jobs") if j.get("jobGroup") == label]
    stage_ids = {s for j in jobs for s in j["stageIds"]}
    sw = sr = 0
    for s in _rest(spark, "/stages"):
        if s["stageId"] in stage_ids and s["status"] == "COMPLETE":
            sw += s.get("shuffleWriteBytes", 0)
            sr += s.get("shuffleReadBytes", 0)
    return {
        "wall_s": round(wall, 2),
        "shuffle_write_mb": round(sw / 1e6, 2),
        "shuffle_read_mb": round(sr / 1e6, 2),
        "out_rows": out_rows,
    }


def synthetic_signatures(spark, n_docs: int):
    """16-column minhash signatures with the corpus's bucket shape:
    2% of docs in size-4 near-dup families (identical signatures —
    every band collides, like true near-dups), the rest unique."""
    planted = int(n_docs * 0.02)
    base = spark.range(n_docs).select(F.col("id"))
    group = F.when(
        F.col("id") < planted, F.concat(F.lit("f"), (F.col("id") / 4).cast("long").cast("string"))
    ).otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
    cols = [F.xxhash64(group, F.lit(i)).alias(f"mh{i}") for i in range(16)]
    return base.select("id", *cols)


def chain_clique_edges(spark, n_nodes: int):
    """Chains of 10 over most nodes plus 1% of nodes in 20-cliques —
    long-diameter AND dense components in one closure."""
    chain = (
        spark.range(n_nodes)
        .filter(F.col("id") % 10 != 9)
        .select(F.col("id").alias("id_1"), (F.col("id") + 1).alias("id_2"))
    )
    n_cl = max(1, n_nodes // 2000)  # 20-node cliques over 1% of nodes
    cl = (
        spark.range(n_cl * 20)
        .select(
            (F.col("id") + n_nodes).alias("u"),
            (F.col("id") / 20).cast("long").alias("c"),
            (F.col("id") % 20).alias("j"),
        )
    )
    clique = (
        cl.alias("x")
        .join(cl.alias("y"), (F.col("x.c") == F.col("y.c")) & (F.col("x.j") < F.col("y.j")))
        .select(F.col("x.u").alias("id_1"), F.col("y.u").alias("id_2"))
    )
    return chain.unionByName(clique)


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = build_session(
        app_name="probe-scale100",
        extra_conf={
            "spark.ui.enabled": "true",  # the REST metrics source
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mongo2mysql_spark.operators.components import connected_components
    from mongo2mysql_spark.operators.dedup import lsh_candidate_pairs
    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles
    from mongo2mysql_spark.operators.similarity import topk_ivf
    from mongo2mysql_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")
    n_emb = emb.count()
    results = []

    def record(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def replicate(df, ids, factor):
        r = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
        )
        out = r
        for c in ids:
            out = out.withColumn(c, F.col(c) + F.col("__r") * F.lit(10_000_000))
        return out.drop("__r")

    for scale in SCALES:
        # --- LSH band join + est-Jaccard rejoin
        sig = synthetic_signatures(spark, 5_000 * scale)
        m = measure(
            spark, f"lsh_pairs@{scale}",
            lambda s=sig: lsh_candidate_pairs(s, "id", k=16, bands=8).count(),
        )
        record({"family": "lsh_pairs", "scale": scale,
                "rows_in": 5_000 * scale, **m})
        # --- connected components closure
        edges = chain_clique_edges(spark, 30_000 * scale)
        m = measure(
            spark, f"components@{scale}",
            lambda e=edges: connected_components(e).count(),
        )
        record({"family": "components", "scale": scale,
                "rows_in": 30_000 * scale, **m})
        # --- IVF probe over a replicated corpus.  The codebook stays
        # FIXED as the corpus grows (cells get denser) — the first
        # probe draft let stride selection derive centroids from the
        # replicated corpus, which scaled the centroid count 100x and
        # blew up the collected-centroid assignment expression (a real
        # scale hazard this probe caught: stride books are the
        # oracle-restatable TEST variant; production grows the corpus
        # under a fixed trained codebook, operators/kmeans.kmeans_fit)
        corpus = replicate(emb, ["vec_id"], scale)
        cents = emb.filter(F.col("vec_id") % 97 == 0)
        q = emb.filter(F.col("vec_id") < 5)
        m = measure(
            spark, f"ivf_probe@{scale}",
            lambda c=corpus, qq=q, ce=cents: topk_ivf(
                c, qq, "vec_id", "embedding",
                centroids=ce, k=5, nprobe=4,
            ).count(),
        )
        record({"family": "ivf_probe", "scale": scale,
                "rows_in": n_emb * scale, **m})
        # --- grouped exact median (the 'mad' phase shape)
        evs = replicate(ev, ["event_id"], scale)
        m = measure(
            spark, f"mad_quantiles@{scale}",
            lambda e=evs: grouped_exact_quantiles(
                e, ["event_type"], "value", {"med": 0.5}
            ).count(),
        )
        record({"family": "mad_quantiles", "scale": scale,
                "rows_in": 100_000 * scale, **m})
        # --- attribution credit (r11): user-keyed touch x conversion
        # join — replication multiplies USERS (ids offset), so per-user
        # activity stays fixed and the join should scale linearly
        from mongo2mysql_spark.operators.behavior import attribution_credit

        eva = replicate(ev, ["event_id", "user_id"], scale)
        m = measure(
            spark, f"attribution@{scale}",
            lambda e=eva: attribution_credit(
                e, "user_id", "event_type", "ts", "event_id",
                "view", "purchase", within_ms=86_400_000,
            ).count(),
        )
        record({"family": "attribution", "scale": scale,
                "rows_in": 100_000 * scale, **m})
        spark.catalog.clearCache()

    # markdown table for COVERAGE.md
    print("\n| family | scale | rows in | wall s | shuffle write MB |"
          " shuffle read MB | out rows |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['family']} | {r['scale']}x | {r['rows_in']:,} |"
              f" {r['wall_s']} | {r['shuffle_write_mb']} |"
              f" {r['shuffle_read_mb']} | {r['out_rows']:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
