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
    all_nodes = nodes.select(F.col(id_col).alias("id"))
    # materialize the edge list BEFORE symmetrizing: the two union
    # branches are separate consumers, and an expensive upstream plan
    # (LSH pair generation here) would execute once per branch
    edges = edges.select("id1", "id2").localCheckpoint(eager=True)
    sym = edges.select(
        F.col("id1").alias("a"), F.col("id2").alias("b")
    ).unionAll(edges.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    # iterate ONLY over nodes with at least one edge: singletons can
    # never change label, and at corpus scale nearly every doc is a
    # singleton — looping over them would shuffle the whole corpus once
    # per round for no information
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # the convergence flag rides the checkpointed result — a
        # separate old-vs-new compare join would add a shuffle + action
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
                (F.coalesce(F.col("nbr_comp") < F.col("comp"), F.lit(False))).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()  # local scan, no shuffle
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    singletons = all_nodes.join(labels, "id", "left_anti").withColumn("comp", F.col("id"))
    return labels.unionAll(singletons).select(F.col("id"), F.col("comp").alias("component"))


def dedup_components(docs: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Component id per document given near-dup pair edges; singleton
    docs are their own component. The canonical keeper of each
    component is the doc whose id equals the component id."""
    comp = connected_components(docs.select(F.col(id_col).alias("id")), pairs)
    return comp.select(F.col("id").alias(id_col), "component").orderBy(id_col)
