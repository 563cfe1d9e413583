"""Connected components over near-duplicate pair graphs.

The dedup family (operators/dedup.py, similarity.py) emits PAIRS; a
curation pipeline needs CLUSTERS — "keep one canonical document per
duplicate group" is a component problem, not a pair problem (A~B and
B~C must collapse to one survivor even when A~C was never emitted).

Algorithm: iterative min-label propagation (the textbook distributed
CC — each node repeatedly takes the minimum label among itself and its
neighbors; converges in graph-diameter rounds). Near-dup graphs have
tiny diameters (dup clusters are dense), so rounds stay single-digit;
``max_iter`` guards pathological chains, and large-star/small-star
(Kiveris et al. 2014) is the documented upgrade path if a corpus ever
produces deep chains.

The RESULT is path-independent — every node ends with the MINIMUM id
in its component — so the driver oracle is a strict recursive-CTE
recomputation, not a pinned output.

Scale shape: each round is one hash join (edges x labels) + one hash
aggregate (min per node) — map-side partials, AQE-splittable; labels
persist per round with the previous round released, and lineage is cut
every few rounds with localCheckpoint so plans don't grow with the
iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.cache import release_one, scoped_persist


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` is the minimum node id of the connected component.
    Raises if ``max_iter`` rounds don't converge (near-dup graphs
    converge in a handful)."""
    edges = scoped_persist(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(
            pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
        .distinct()
    )
    labels = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for it in range(max_iter):
        nbr = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = scoped_persist(new_labels)
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "__old"),
                            "node")
            .where(F.col("component") != F.col("__old"))
            .limit(1)
            .count()
        )
        release_one(labels)  # also drops the superseded registry entry
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "a pathological chain graph; use a larger max_iter or the "
        "large-star/small-star variant"
    )


def attach_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    out_col: str = "component",
    canonical_col: str = "is_canonical",
    max_iter: int = 50,
) -> DataFrame:
    """Append ``out_col`` (component = min doc id of the near-dup
    cluster; a doc in no pair is its own component) and
    ``canonical_col`` (1 for the one survivor per cluster — the min
    id) to ``docs``. ``docs`` minus the non-canonical rows IS the
    deduplicated corpus."""
    clash = set(docs.columns) & {"component", out_col, canonical_col}
    if clash:
        raise ValueError(
            f"attach_components: docs already has column(s) {sorted(clash)} "
            "('component' is used internally) — rename them or pick "
            "different out_col/canonical_col"
        )
    comp = connected_components(pairs, a=a, b=b, max_iter=max_iter)
    out = docs.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(out_col, F.coalesce(F.col("component"), F.col(id_col)))
    if "component" != out_col:
        out = out.drop("component")
    return out.withColumn(
        canonical_col, (F.col(id_col) == F.col(out_col)).cast("int")
    )
