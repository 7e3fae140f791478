"""Connected components over candidate-pair edges — the clustering step
every near-dup pipeline needs between "pair generator" (LSH / Jaccard /
SimHash) and "kill list" (pick one representative per duplicate group).

The reference converter has no graph operator (its scope ends at the
per-record envelope, JsonConverter.java:142-155); this is a
training-data-pipeline extension (SURVEY.md §2.4) in the spirit of the
dedup family: pairs in, ``(id, component)`` out, where ``component`` is
the minimum id reachable through the undirected pair graph — the unique
fixpoint, independent of iteration order, hence oracle-checkable.

Algorithm: distributed label propagation with pointer jumping
(path halving), the DataFrame form of the classic PRAM/Pregel CC:

1. every node starts labeled with itself;
2. each round, a node takes the min of its own label and its
   neighbors' labels (one shuffle keyed by node id);
3. labels then pointer-jump — ``label <- label(label)`` — so a chain of
   length d converges in O(log d) rounds, not O(d);
4. stop when a round changes nothing.

Scale notes (the 100 TB story):

- Near-dup clusters are overwhelmingly tiny (pairs of mirrors, small
  mirror families); the diameter bound makes rounds ~2-4 in practice.
- Each round is two shuffles bounded by |E| and |V| of the PAIR graph —
  orders of magnitude smaller than the corpus (only docs that collided
  in some band appear at all). The corpus itself is never touched.
- ``localCheckpoint`` truncates lineage each round; without it the plan
  doubles per iteration and the final job recomputes every round from
  scratch. On a real cluster with an HDFS checkpoint dir, swap for
  ``checkpoint`` if executor loss during the loop must be survivable.
- The per-round ``count()`` is the convergence test — one scalar action
  per round, the standard driver-side loop of every iterative Spark
  graph algorithm (GraphX/GraphFrames do the same under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """``(id, component)`` for every node in ``edges``, where component is
    the min id reachable through the undirected graph. Deterministic
    (unique fixpoint). ``max_iters`` is a safety bound — with pointer
    jumping, 25 rounds covers components of diameter ~2^25."""
    sym = edges.select(
        F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
    )
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=True)

    # r6: fuse the first neighbor-min round into the init — label(v)
    # starts at min(v, min neighbors) instead of v. Any init with
    # final_comp(v) <= label(v) <= v converges to the same unique
    # fixpoint, and the fused init IS round one's result, so the loop
    # runs one round fewer (A/B: identical labels, 3 -> 2 rounds and
    # 1.8 -> 1.2s on the sf1.0 dup graph). sym is symmetrized, so every
    # node appears as `u` and the groupBy covers all nodes.
    lab = (
        sym.groupBy(F.col("u").alias("id"))
        .agg(F.least(F.min("v"), F.col("u")).alias("comp"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        # neighbor-min: each node receives its neighbors' current labels
        msgs = (
            sym.join(lab.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "comp")
        )
        upd = msgs.union(lab).groupBy("id").agg(F.min("comp").alias("comp"))
        # pointer jump: comp <- min(comp, label(comp)) — halves chain depth
        jump = lab.select(F.col("id").alias("comp"), F.col("comp").alias("jcomp"))
        upd = upd.join(jump, "comp", "left").select(
            "id", F.least("comp", F.coalesce("jcomp", "comp")).alias("comp")
        )
        upd = upd.localCheckpoint(eager=True)
        changed = (
            upd.join(lab.withColumnRenamed("comp", "old"), "id")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        lab = upd
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(components deeper than ~2^max_iters hops?); raise max_iters — "
        "silently returning partial labels would corrupt downstream dedup"
    )


def duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster near-dup candidate pairs: ``(doc_id, cluster, cluster_size,
    is_representative)`` for every doc appearing in any pair. ``cluster``
    is the min doc id of the component — the canonical survivor; rows
    with ``is_representative = false`` are the dedup kill list."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster"),
        "cluster_size",
        (F.col("id") == F.col("comp")).alias("is_representative"),
    )
