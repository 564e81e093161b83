"""Connected components over near-duplicate pair edges.

The missing last step of every dedup family (MinHash/SimHash/embedding
pairs): near-dup PAIRS are not dedup GROUPS — transitive closure turns
(a,b),(b,c) into one {a,b,c} cluster with a canonical representative. Not in
the reference (its dedup is exact per-key, §2.6); this is the
training-data-pipeline extension that makes `minhash_lsh_pairs` &co usable
for actual corpus dedup.

Algorithm: iterative min-label propagation — every node starts as its own
component (its id), and each round adopts the minimum label reachable over
one hop, until a fixpoint. Rounds = graph diameter, and near-dup graphs are
shallow (duplicate clusters are dense, star-like); each round is one
shuffle-join of the (node, comp) table with the skinny edge list. The
monotone non-increasing label-sum gives a one-scalar convergence probe per
round (no row-by-row diff). Persist/unpersist keeps each iteration's
lineage O(1) — without it the plan doubles per round.

At 100 TB-scale graphs with long chains, swap the propagation loop for the
large-star/small-star formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same join primitive, O(log^2 n) rounds; for
near-dup dedup the plain loop converges in 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component): component = min node id in the connected component.

    ``edges`` are undirected pairs; isolated nodes don't appear (callers
    union them back if every doc needs a row — see ``dedup_groups``).
    """
    from pyspark import StorageLevel

    # no distinct: duplicate edges cannot change a min-label propagation,
    # and deduping would cost a full shuffle of the edge list
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # seed with the one-hop minimum (node itself or any neighbor) — one
    # aggregation that replaces the first propagation round
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("dst"), F.min("src")).alias("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        # one hop: each node offers its current comp to every neighbor
        offers = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every document a dedup group and a keep/drop verdict.

    Returns (id_col, group, keep): ``group`` is the component's min doc id
    (docs with no near-dup edges form their own singleton group) and
    ``keep`` marks the canonical representative — the classic
    keep-one-per-cluster corpus dedup step. The component table is tiny
    relative to the corpus (only docs that had a near-dup edge), so the
    attach join broadcasts in the common case.
    """
    comp = connected_components(pairs, id_a, id_b)
    out = (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("group"),
        )
    )
    return out.withColumn("keep", F.col(id_col) == F.col("group"))
