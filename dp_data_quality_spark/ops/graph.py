"""Duplicate-graph resolution: connected components + canonical survivors.

The pair emitters (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``neardup_pairs``) produce EDGES of the duplicate
graph.  An actual dedup pass must go one step further: group the pairs
into connected components (A~B and B~C put A,B,C in one cluster even if
A,C never paired) and keep exactly ONE survivor per cluster.  The
reference stops at flagging duplicate rows (validation keep-first,
validation_rulebook.py dup rule); this is the corpus-level analogue a
training-data pipeline needs.

Scale design
------------
``connected_components`` is iterative min-label propagation, pure
DataFrame ops: each round is one join (edges x labels, shuffle on node
id) + one groupBy-min.  Rounds needed = graph diameter.  Duplicate
components are near-cliques — every member pairs with most others
because near-dup similarity is close to transitive — so the loop exits
after 2-4 rounds in practice; convergence is detected with a
changed-label count that rides the same aggregate (no extra join).
Labels are checkpointed per round, so lineage never re-executes
earlier rounds.  From round 1 a pointer-jumping hop (each node adopts
its label's label — the Hash-to-Min idea; cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) runs
alongside the neighbour propagation, so adversarial long-chain graphs
converge in O(log d) rounds instead of O(d) — a 150-link chain closes
within the default bound (pytest).  ``max_rounds`` still bounds the
loop and the function raises rather than silently returning partial
labels.

``resolve_duplicates`` then labels EVERY corpus row: docs absent from
the pair graph are their own singleton component (no join explosion —
the component table only covers docs that appeared in a pair, and
sizes come from a groupBy on that table, not a window over the
corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, component_id) for every node that appears in ``pairs``;
    component_id = the smallest node id in the component.

    Node ids must be orderable (the canonical label is the min);
    hash string keys to int64 first if ordering by raw strings is not
    intended.  One shuffle per round on the node id; rounds = component
    diameter (near-dup clusters: 2-4)."""
    # Both edge directions from ONE pass over `pairs` (explode, not
    # union-of-two-selects: pair emitters like minhash_lsh_pairs are
    # expensive subtrees, and a union would execute that subtree twice
    # before anything materializes).  The edge table is then
    # localCheckpoint-ed, not persist-ed: the loop joins edges against
    # labels DERIVED FROM edges, and Spark's self-join de-duplication
    # re-analyzes that branch with fresh expression ids, which misses
    # the cache for the Generate(explode) plan and silently re-executes
    # the whole pair pipeline every round (measured: 14s rounds vs 1.5s
    # with the truncated plan at sf0.1).  Checkpointing cuts the
    # lineage, so reuse is unconditional and the pair emitter runs
    # exactly once.  Production note: executor loss drops local
    # checkpoints — use reliable checkpointing for multi-hour jobs.
    a, b = F.col(a_col), F.col(b_col)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(a.alias("src"), b.alias("dst")),
                    F.struct(b.alias("src"), a.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)  # re-joined every round
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for rnd in range(max_rounds):
        # labels of each node's neighbours, shipped along the edges
        neigh = edges.join(
            labels, edges["src"] == labels["id"], "inner"
        ).select(F.col("dst").alias("id"), "label")
        # own row carries the previous label in "old" so the changed
        # count needs no self-join; min ignores the others' nulls
        null_old = F.lit(None).cast(labels.schema["label"].dataType)
        both = labels.select(
            "id", "label", F.col("label").alias("old")
        ).unionByName(neigh.withColumn("old", null_old))
        # pointer jumping from round 1 on: each node also adopts its
        # LABEL's label (labels are always node ids, so the self-join
        # resolves; in round 0 labels are the identity and the hop is a
        # no-op, so it is skipped).  Neighbour propagation alone needs
        # diameter-many rounds — a chain of n near-dups converges in
        # O(n); with the label-of-label hop the frontier doubles per
        # round, so convergence is O(log d) (Hash-to-Min family) and
        # max_rounds=25 covers any graph a corpus can produce.  The
        # hop join moves only (id, label) pairs.
        if rnd > 0:
            hop = (
                labels.alias("a")
                .join(labels.alias("b"), F.col("a.label") == F.col("b.id"), "inner")
                .select(F.col("a.id").alias("id"), F.col("b.label").alias("label"))
            )
            both = both.unionByName(hop.withColumn("old", null_old))
        new = both.groupBy("id").agg(
            F.min("label").alias("label"), F.min("old").alias("old")
        )
        # Truncate lineage each round: iterative plans otherwise NEST
        # (round k's plan embeds round k-1's), and by ~6 rounds plan
        # compilation itself OOMs.  localCheckpoint materializes the
        # round's labels and restarts the plan from the stored blocks
        # (one job; the convergence count below reads those blocks).
        new = new.localCheckpoint(eager=True)
        changed = new.filter(F.col("label") < F.col("old")).count()
        labels = new.select("id", "label")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(graph diameter exceeds the bound — raise max_rounds or use "
        "an alternating-star formulation)"
    )


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Label every row of ``df`` with its duplicate cluster and elect one
    canonical survivor per cluster (the smallest id — deterministic and
    engine-reproducible).

    Adds: ``component_id`` (own id for singletons), ``component_size``
    (int, 1 for singletons), ``is_canonical`` (exactly one true per
    component).  Filtering ``is_canonical`` IS the dedup; the rest is
    the drop lineage."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").cast("int").alias("component_size")
    )
    labelled = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .drop(comp["id"])
        .withColumn("component_id", F.coalesce("component_id", F.col(id_col)))
        .join(sizes, "component_id", "left")
        .withColumn("component_size", F.coalesce("component_size", F.lit(1)))
        .withColumn("is_canonical", F.col("component_id") == F.col(id_col))
    )
    return labelled.select(*df.columns, "component_id", "component_size", "is_canonical")


def neardup_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that keeps every near-duplicate CLUSTER in one
    split.  Splitting on the raw doc id leaks near-identical text across
    train and eval (the classic benchmark-contamination failure); hashing
    the cluster's canonical id instead makes cross-split leakage
    structurally impossible.  Composes :func:`resolve_duplicates` with
    ``ops.sampling.deterministic_split`` — same md5 hash family, so the
    assignment stays engine-reproducible."""
    from .sampling import deterministic_split

    labelled = resolve_duplicates(df, pairs, id_col=id_col, a_col=a_col, b_col=b_col)
    return deterministic_split(labelled, "component_id", fractions, out_col=out_col)
