"""Connected components over near-duplicate pair edges.

Pairwise dedup output (id1, id2) is not enough to DROP duplicates:
near-duplication is transitive in practice (A~B, B~C), so the keep/drop
decision needs the connected component of each doc — keep one canonical
doc (the min id) per component.

Spark-idiomatic iterative algorithm (the GraphFrames/Pregel shape,
without the dependency): every node starts labeled with its own id and
repeatedly adopts the minimum label among itself and its neighbors.
Each iteration is one join + groupBy (shuffle on node id); iterations
needed = graph diameter, and near-dup clusters are near-cliques, so it
converges in a handful of rounds. ``localCheckpoint`` truncates the
lineage each round — without it the plan doubles per iteration and
Catalyst analysis time explodes.

The same closure is expressible in DuckDB as a recursive CTE, so the
iterative operator is exactly oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min node id reachable via edges.

    ``nodes``: one column ``id_col`` (all ids, including singletons).
    ``edges``: columns id1/id2, undirected.
    """
    labels = nodes.select(F.col(id_col).alias("id")).withColumn("comp", F.col("id"))
    sym = edges.select(
        F.col("id1").alias("a"), F.col("id2").alias("b")
    ).unionAll(edges.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def dedup_components(docs: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Component id per document given near-dup pair edges; singleton
    docs are their own component. The canonical keeper of each
    component is the doc whose id equals the component id."""
    comp = connected_components(docs.select(F.col(id_col).alias("id")), pairs)
    return comp.select(F.col("id").alias(id_col), "component").orderBy(id_col)
