"""Connected components over a pair table — duplicate-cluster assignment.

A near-dup detector (minhash/simhash/embedding) emits PAIRS; a training
pipeline needs CLUSTERS (keep one canonical doc per component, drop the
rest). This is connected components over the dup-pair graph with the
component label = min member id.

Spark-first design: iterative min-label propagation on DataFrames.

- state: ``labels(id, lab)``, initialized lab = id.
- step: every node offers its label to its neighbors
  (edges are kept both directions); a node's new label is
  ``min(own, min(offered))``. Expressed as join + groupBy — two hash
  shuffles per iteration, both on ``id``, so AQE coalesces them and a
  future bucketed edge table would make them exchange-free.
- termination: labels are monotonically non-increasing and bounded, so
  the loop is a fixpoint; it converges in at most ``diameter`` rounds
  (each round a label travels one hop). ``localCheckpoint`` truncates the
  growing lineage each round — without it the plan doubles per iteration.

At 100 TB the round count, not the per-round cost, is what hurts; the
published fix is large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) which contracts the graph
each round and converges in O(log n) rounds on pathological chains. Dup
graphs from banded LSH are overwhelmingly tiny cliques (diameter 1-2), so
plain propagation is the right default; the star variant is a drop-in
replacement of the step if a corpus proves chain-heavy.

Oracle (queries.py x_dup_clusters): DuckDB recursive CTE propagating
labels along the same edges — set-semantics UNION guarantees termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Resolve an undirected pair table to ``(id, component)`` where
    ``component`` is the minimum id reachable from ``id``. Only ids that
    appear in ``pairs`` are emitted (singletons are their own component
    trivially and would dominate the output).

    ``max_iterations`` is a safety bound; the loop exits as soon as a
    round changes no label (checked with a single count aggregate, the
    only driver-side action per round).
    """
    # both directions in ONE scan of the pair lineage (a union would run
    # the upstream candidate-generation pipeline once per branch)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "lab", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        offered = (
            edges.join(labels, edges["s"] == labels["id"], "inner")
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("lab").alias("offered"))
        )
        new_labels = (
            labels.join(offered, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("offered"), F.col("lab"))
                ).alias("lab"),
                (F.col("offered") < F.col("lab")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id"), F.col("lab").alias("component"))
