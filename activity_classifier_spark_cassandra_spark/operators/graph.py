"""Connected components: near-dup PAIRS → dedup CLUSTERS.

Every near-dup operator in operators/dedup.py emits pairs; a real
corpus clean needs the transitive closure (A~B, B~C ⇒ {A,B,C} is one
cluster with one survivor).  This is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each round is two keyed shuffles (join labels to
edge endpoints + min-aggregate), converging in at most the graph
diameter — and dedup-similarity graphs are short-diameter by
construction (clusters are near-cliques), so a handful of rounds
suffices at any corpus size.  For adversarial long-chain graphs the
large-star/small-star variant (pointer jumping, O(log n) rounds) is the
upgrade path; the per-round dataflow below is unchanged.

Iterative Spark mechanics this demonstrates deliberately:
- ``localCheckpoint(eager=True)`` per round — truncates lineage so the
  plan doesn't grow by two joins every iteration (the classic iterative-
  algorithm OOM/stack blowup);
- early exit on a converged-count action per round, not a fixed
  iteration count;
- the edge list is persisted once and reused every round.

The DuckDB oracle computes the same components with a recursive CTE —
exact reachability, so any propagation bug (dropped vertex, one-way
edge, premature stop) hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .dedup import q_simhash_near_dup

MAX_ITER = 25


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(vertex_id, component) with component = min vertex id reachable.

    ``edges`` is undirected input (each pair listed once, either
    order); vertices are exactly the ids appearing in edges."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(MAX_ITER):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(
            neighbor_min, labels["id"] == F.col("id2"), "left"
        ).select(
            "id",
            F.col("comp").alias("old_comp"),
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
        )
        # Path halving (pointer jumping): also adopt the label OF my
        # label.  Pure min-propagation needs diameter rounds — long
        # chains in a near-dup graph make that dozens of full shuffles
        # at corpus scale; following one extra pointer per round brings
        # convergence to O(log diameter).
        ptr = stepped.select(
            F.col("id").alias("pid"), F.col("comp").alias("pcomp")
        )
        updated = (
            stepped.join(ptr, stepped["comp"] == F.col("pid"), "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("pcomp"), F.col("comp"))
                ).alias("comp"),
                "old_comp",
            )
            .withColumn("_changed", F.col("comp") < F.col("old_comp"))
            .drop("old_comp")
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the SimHash near-dup pairs and report each component's
    representative (min doc_id), size, and member list — the exact
    artifact a corpus-clean job feeds into its keep-one-per-cluster
    delete pass."""
    pairs = q_simhash_near_dup(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components(pairs, src="doc1", dst="doc2")
    members = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return comp.groupBy(F.col("comp").alias("representative")).agg(
        F.count(F.lit(1)).alias("cluster_size"),
        members.alias("members"),
    )


def dedup_clusters_sql() -> str:
    from .dedup import SIMHASH_NEAR_DUP_SQL

    pairs_sql = SIMHASH_NEAR_DUP_SQL.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
sym AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
),
labels AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
)
SELECT comp AS representative, COUNT(*) AS cluster_size,
       STRING_AGG(id, ',' ORDER BY id) AS members
FROM labels GROUP BY comp
"""


# ------------------------------------------------ full-pipeline query
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pre-training data pipeline as ONE lazy plan: quality
    gate → exact-dup removal (q_corpus_clean) → near-dup clustering
    (SimHash pairs → connected components) → drop every cluster member
    except its representative → per-language corpus summary.

    Composition is the point: each stage is an already-verified
    operator, and Catalyst fuses the whole chain — the quality
    projections prune before any shuffle, the near-dup side is the
    banded LSH join (never all-pairs), and the final anti-join carries
    only non-representative ids (≪ corpus)."""
    from .dedup import q_corpus_clean

    kept = q_corpus_clean(spark, sf_dir)
    pairs = q_simhash_near_dup(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components(pairs, src="doc1", dst="doc2")
    non_rep = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    final = kept.join(non_rep, "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


def corpus_pipeline_sql() -> str:
    from .dedup import CORPUS_CLEAN_SQL, SIMHASH_NEAR_DUP_SQL

    pairs_sql = SIMHASH_NEAR_DUP_SQL.strip().rstrip(";")
    kept_sql = CORPUS_CLEAN_SQL.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
sym AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION
  SELECT doc2, doc1 FROM pairs
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
),
labels AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
),
nonrep AS (SELECT id AS doc_id FROM labels WHERE id <> comp),
kept AS ({kept_sql})
SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
FROM kept
WHERE doc_id NOT IN (SELECT doc_id FROM nonrep)
GROUP BY lang
"""
