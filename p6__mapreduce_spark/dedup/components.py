"""Connected components over near-duplicate pair edges.

Pairwise dedup output (id1, id2) is not enough to DROP duplicates:
near-duplication is transitive in practice (A~B, B~C), so the keep/drop
decision needs the connected component of each doc — keep one canonical
doc (the min id) per component.

Spark-idiomatic iterative algorithm (the GraphFrames/Pregel shape,
without the dependency): every node starts labeled with its own id and
repeatedly adopts the minimum label among itself, its neighbors, and
its current label's own label (pointer jumping). Each iteration is one
join + groupBy plus a self-join (shuffles on node id); the label-of-
label hop doubles the propagated distance per round, so convergence is
O(log diameter) — near-dup clusters are near-cliques and finish in a
handful of rounds, and even pathological chains fit in max_iter=25. ``localCheckpoint`` truncates the
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
    changed = -1
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # pointer jumping: also adopt the label OF my current label
        # (comp always names another edge node, so the self-join always
        # hits). Neighbor-min alone needs diameter rounds; combined
        # with label-of-label the propagated distance doubles per
        # round, so chain-shaped graphs converge in O(log diameter).
        hop = labels.select(
            F.col("id").alias("hop_id"), F.col("comp").alias("hop_comp")
        )
        # the convergence flag rides the checkpointed result — a
        # separate old-vs-new compare join would add a shuffle + action
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .join(hop, labels["comp"] == F.col("hop_id"), "left")
            .select(
                "id",
                F.least(
                    F.col("comp"),
                    F.coalesce("nbr_comp", F.col("comp")),
                    F.coalesce("hop_comp", F.col("comp")),
                ).alias("new_comp"),
                (
                    F.coalesce(F.col("nbr_comp") < F.col("comp"), F.lit(False))
                    | F.coalesce(F.col("hop_comp") < F.col("comp"), F.lit(False))
                ).alias("chg"),
            )
            .withColumnRenamed("new_comp", "comp")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()  # local scan, no shuffle
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    if changed != 0:
        # silent truncation would hand callers wrong canonical-keeper
        # assignments; with pointer jumping max_iter=25 covers graphs
        # of diameter ~2**25, so reaching here means something is wrong
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    singletons = all_nodes.join(labels, "id", "left_anti").withColumn("comp", F.col("id"))
    return labels.unionAll(singletons).select(F.col("id"), F.col("comp").alias("component"))


def dedup_components(docs: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Component id per document given near-dup pair edges; singleton
    docs are their own component. The canonical keeper of each
    component is the doc whose id equals the component id."""
    comp = connected_components(docs.select(F.col(id_col).alias("id")), pairs)
    return comp.select(F.col("id").alias(id_col), "component").orderBy(id_col)
