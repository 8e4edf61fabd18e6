"""Global proximity tree as Spark DataFrame dataflow (SURVEY §3.2;
reference global_model_manager.py:168-402).

The reference's BFS level loop costs O(k·open_nodes) Spark actions per
level (one weighted-Gini job per candidate split — the reason its
global training takes 1,900-5,300 s). This implementation keeps the
same semantics but batches ALL candidate splits of ALL open nodes into
TWO jobs per level (SURVEY §7 Phase 4):

  1. pool+stats job — one window pass yields both the per-(node,label)
                    counts (count window, same partitioning → no extra
                    shuffle) and the bounded k-per-(node,label) exemplar
                    pool (collect: O(k·nodes·classes) rows — the
                    reference's own "P2" lesson)
  2. gini job     — one projection computes every candidate's branch
                    assignment natively (nearest_exemplar_index — no
                    Python UDF), stack-unpivots to (candidate, branch),
                    groupBy counts; weighted Gini finishes on the
                    driver over the tiny count table.

plus one routing projection (pure column expression, no shuffle).

Prediction broadcasts the plain-dict tree and traverses it in one
Arrow-batched pandas UDF pass (U3 parity; reference :405-483).
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..functions.distances import nearest_exemplar_index


@dataclass
class TreeNode:
    """Driver-side tree IR (reference global_model_manager.py:55-57)."""

    node_id: int
    parent_id: int | None = None
    is_leaf: bool = False
    prediction: int | None = None
    exemplar_labels: list[int] = field(default_factory=list)
    exemplars: list[list[float]] = field(default_factory=list)
    children: dict[int, int] = field(default_factory=dict)  # branch ix → child node_id


class GlobalProximityTree:
    def __init__(
        self,
        n_splitters: int = 5,
        max_depth: int = 15,
        min_samples_split: int = 4,
        exemplar_pool_k: int = 3,
        seed: int = 42,
        metric: str = "euclidean",
        dtw_window: int | None = None,
    ) -> None:
        if metric not in ("euclidean", "dtw"):
            raise ValueError(f"metric must be 'euclidean' or 'dtw', got {metric!r}")
        self.n_splitters = n_splitters
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.exemplar_pool_k = exemplar_pool_k
        self.seed = seed
        self.metric = metric
        self.dtw_window = dtw_window
        self.nodes: dict[int, TreeNode] = {}
        self.majority_class: int | None = None

    def _branch_ix(self, features: F.Column, exemplars: F.Column) -> F.Column:
        """0-based nearest-exemplar index under the configured kernel:
        the native codegen expression for euclidean, an Arrow-batched
        pandas UDF for DTW (inherently iterative — reference
        distance_measures.py:16-52)."""
        if self.metric == "euclidean":
            return nearest_exemplar_index(features, exemplars)
        from .dtw import nearest_dtw_index_udf

        return nearest_dtw_index_udf(self.dtw_window)(features, exemplars)

    # ------------------------------------------------------------------ fit

    def fit(self, df: DataFrame, label_col: str = "label", features_col: str = "features") -> "GlobalProximityTree":
        rng = random.Random(self.seed)
        assign = df.select(
            F.col(label_col).cast("int").alias("label"),
            F.col(features_col).cast("array<double>").alias("features"),
            F.lit(0).alias("node_id"),
        ).persist()
        assign.count()

        # global majority for the null-prediction fallback (reference
        # :182-184) — derived from level 0's stats (node 0 holds every
        # row), no separate job; computed directly only if the BFS loop
        # never runs (max_depth == 0)
        self.majority_class = None
        self.nodes = {0: TreeNode(0)}
        next_id = 1
        open_nodes = [0]
        depth = 0

        while open_nodes and depth < self.max_depth:
            # job 1: ONE pass gets both the per-(node,label) stats (a
            # count window over the same partitioning — no extra
            # shuffle) and the bounded exemplar pool (k random rows per
            # (node,label)). Collect is bounded by k·nodes·classes rows.
            # order key hashes row CONTENT (not partition-seeded rand):
            # the sampled pool is identical on any cluster layout, so a
            # seeded fit is reproducible across sessions/retries.
            w = Window.partitionBy("node_id", "label").orderBy(
                F.xxhash64(F.lit(self.seed + depth), "features")
            )
            cw = Window.partitionBy("node_id", "label")
            pool_rows = (
                assign.filter(F.col("node_id").isin(open_nodes))
                .withColumn("_rk", F.row_number().over(w))
                .withColumn("_cnt", F.count("*").over(cw))
                .filter(F.col("_rk") <= self.exemplar_pool_k)
                .select("node_id", "label", "features", "_cnt", "_rk")
                .collect()
            )
            # collect() row order follows task completion — sort so the
            # driver-side pool lists (and rng.choice over them) are
            # deterministic too
            pool_rows.sort(key=lambda r: (r["node_id"], r["label"], r["_rk"]))
            stats: dict[int, dict[int, int]] = {}
            pool: dict[int, dict[int, list[list[float]]]] = {}
            for r in pool_rows:
                stats.setdefault(r["node_id"], {})[r["label"]] = r["_cnt"]
                pool.setdefault(r["node_id"], {}).setdefault(r["label"], []).append(
                    list(r["features"])
                )
            if self.majority_class is None and 0 in stats:
                # level 0: node 0's per-label counts ARE the global counts
                s0 = stats[0]
                self.majority_class = int(max(sorted(s0), key=lambda k: s0[k]))

            # leaf checks on the driver (reference :248-253)
            split_nodes = []
            for nid in open_nodes:
                node_stats = stats.get(nid, {})
                total = sum(node_stats.values())
                if total < self.min_samples_split or len(node_stats) <= 1:
                    self._make_leaf(nid, node_stats)
                else:
                    split_nodes.append(nid)
            if not split_nodes:
                break

            # candidate splits: per node, n_splitters random exemplar sets
            candidates: dict[int, list[tuple[list[int], list[list[float]]]]] = {}
            for nid in split_nodes:
                node_pool = pool.get(nid, {})
                labels = sorted(node_pool)
                if len(labels) < 2:
                    self._make_leaf(nid, stats.get(nid, {}))
                    continue
                cands = []
                for _ in range(self.n_splitters):
                    exemplars = [rng.choice(node_pool[lbl]) for lbl in labels]
                    cands.append((labels, exemplars))
                candidates[nid] = cands
            if not candidates:
                break

            # job 3: ONE batched gini job for all (node, candidate) pairs.
            # Candidate exemplars travel as a broadcast-joined table, NOT
            # as per-exemplar literal expressions: a literal plan grows
            # O(nodes·k·dims) and Catalyst analysis/codegen time dominates
            # the level (measured 400+ s at sf0.01); the joined plan is
            # constant-size regardless of how many nodes are open.
            spark = assign.sparkSession
            cand_rows = [
                (nid, c, cands[c][1])
                for nid, cands in candidates.items()
                for c in range(self.n_splitters)
            ]
            cand_df = spark.createDataFrame(
                cand_rows, "node_id int, cand int, exemplars array<array<double>>"
            )
            stacked = (
                assign.filter(F.col("node_id").isin(list(candidates)))
                .join(F.broadcast(cand_df), "node_id")
                .groupBy(
                    "node_id",
                    "cand",
                    self._branch_ix(F.col("features"), F.col("exemplars")).alias(
                        "branch"
                    ),
                    "label",
                )
                .count()
                .collect()
            )

            # driver-side weighted Gini over the tiny count table
            agg: dict[tuple[int, int], dict[int, dict[int, int]]] = {}
            for r in stacked:
                agg.setdefault((r["node_id"], r["cand"]), {}).setdefault(r["branch"], {})[
                    r["label"]
                ] = r["count"]
            # sorted(): collect order is task-completion order; iterating
            # sorted keys makes Gini tie-breaks (strict <, so the lowest
            # cand id wins a tie) and child-id allocation deterministic
            best: dict[int, tuple[float, int]] = {}
            for (nid, cand), branches in sorted(agg.items()):
                # integer sums are order-free, but the float Gini
                # accumulation is NOT associative — iterate branches and
                # labels in sorted order so the result doesn't inherit
                # the collect()'s task-completion order (a near-tied
                # candidate pair otherwise flips winners across layouts)
                total = sum(sum(b.values()) for b in branches.values())
                if len(branches) < 2:
                    gini = 1.0  # degenerate: routes everything one way
                else:
                    gini = 0.0
                    for branch in sorted(branches):
                        bcounts = branches[branch]
                        bt = sum(bcounts.values())
                        p2 = sum((bcounts[lbl] / bt) ** 2 for lbl in sorted(bcounts))
                        gini += (bt / total) * (1.0 - p2)
                if nid not in best or gini < best[nid][0]:
                    best[nid] = (gini, cand)

            # materialize winners into the tree; routing goes through the
            # same broadcast-join pattern (constant-size plan per level)
            route_rows: list[tuple[int, list[list[float]], list[int]]] = []
            for nid, (gini, cand) in sorted(best.items()):
                labels, exemplars = candidates[nid][cand]
                if gini >= 1.0:
                    self._make_leaf(nid, stats.get(nid, {}))
                    continue
                node = self.nodes[nid]
                node.exemplar_labels = labels
                node.exemplars = exemplars
                child_ids = []
                for _ in labels:
                    self.nodes[next_id] = TreeNode(next_id, parent_id=nid)
                    child_ids.append(next_id)
                    next_id += 1
                node.children = dict(enumerate(child_ids))
                route_rows.append((nid, exemplars, child_ids))

            if not route_rows:
                break

            route_df = spark.createDataFrame(
                route_rows,
                "node_id int, exemplars array<array<double>>, child_map array<int>",
            )
            new_assign = (
                assign.join(F.broadcast(route_df), "node_id", "left")
                .select(
                    "label",
                    "features",
                    F.when(
                        F.col("exemplars").isNotNull(),
                        F.element_at(
                            F.col("child_map"),
                            self._branch_ix(F.col("features"), F.col("exemplars")) + 1,
                        ),
                    )
                    .otherwise(F.col("node_id"))
                    .cast("int")
                    .alias("node_id"),
                )
                .persist()
            )
            new_assign.count()
            assign.unpersist()
            assign = new_assign
            open_nodes = [
                nid for nid, n in self.nodes.items() if not n.is_leaf and not n.children
            ]
            depth += 1

        if self.majority_class is None:  # max_depth == 0: loop never ran
            top = (
                assign.groupBy("label").count().orderBy(F.desc("count"), F.asc("label")).first()
            )
            self.majority_class = int(top["label"])

        # dangling-node sweep (reference :384-398): anything still open → leaf
        if open_nodes:
            stats_rows = (
                assign.filter(F.col("node_id").isin(open_nodes))
                .groupBy("node_id", "label")
                .count()
                .collect()
            )
            stats = {}
            for r in stats_rows:
                stats.setdefault(r["node_id"], {})[r["label"]] = r["count"]
            for nid in open_nodes:
                self._make_leaf(nid, stats.get(nid, {}))
        assign.unpersist()
        return self

    def _make_leaf(self, nid: int, node_stats: dict[int, int]) -> None:
        node = self.nodes[nid]
        node.is_leaf = True
        if node_stats:
            # majority; ties to smallest label (deterministic)
            node.prediction = max(sorted(node_stats), key=lambda k: node_stats[k])
        else:
            node.prediction = self.majority_class

    # -------------------------------------------------------------- predict

    def predict(self, df: DataFrame, features_col: str = "features") -> DataFrame:
        """Broadcast-tree pandas UDF traversal (reference :405-483):
        single distributed pass, no shuffle; null-safe fallback to the
        majority class via coalesce (reference :475)."""
        spark = df.sparkSession
        state = self.to_state()
        bc = spark.sparkContext.broadcast(state)
        majority = self.majority_class

        @F.pandas_udf(IntegerType())
        def traverse(features: pd.Series) -> pd.Series:
            from bigdata_spark.ml.dtw import dtw_distance

            state = bc.value
            nodes = state["nodes"]
            metric = state["params"].get("metric", "euclidean")
            window = state["params"].get("dtw_window")
            out = []
            for ts in features:
                x = np.asarray(ts, dtype=np.float64)
                node = nodes["0"]
                hops = 0
                while not node["is_leaf"] and hops < 50:
                    ex = np.asarray(node["exemplars"], dtype=np.float64)
                    if metric == "euclidean":
                        ix = int(np.argmin(((ex - x) ** 2).sum(axis=1)))
                    else:
                        ix = int(
                            np.argmin([dtw_distance(x, e, window=window) for e in ex])
                        )
                    node = nodes[str(node["children"][str(ix)])]
                    hops += 1
                out.append(node["prediction"] if node["is_leaf"] else None)
            return pd.Series(out, dtype="Int32")

        return df.withColumn(
            "prediction",
            F.coalesce(
                traverse(F.col(features_col).cast("array<double>")), F.lit(majority)
            ).cast("int"),
        )

    # ---------------------------------------------------------- persistence

    def to_state(self) -> dict:
        return {
            "majority_class": self.majority_class,
            "params": {
                "n_splitters": self.n_splitters,
                "max_depth": self.max_depth,
                "min_samples_split": self.min_samples_split,
                "exemplar_pool_k": self.exemplar_pool_k,
                "seed": self.seed,
                "metric": self.metric,
                "dtw_window": self.dtw_window,
            },
            "nodes": {
                str(nid): {
                    "is_leaf": n.is_leaf,
                    "prediction": n.prediction,
                    "exemplar_labels": n.exemplar_labels,
                    "exemplars": n.exemplars,
                    "children": {str(k): v for k, v in n.children.items()},
                }
                for nid, n in self.nodes.items()
            },
        }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_state(), f)

    @classmethod
    def load(cls, path: str) -> "GlobalProximityTree":
        with open(path) as f:
            state = json.load(f)
        t = cls(**state["params"])
        t.majority_class = state["majority_class"]
        for nid, nd in state["nodes"].items():
            t.nodes[int(nid)] = TreeNode(
                node_id=int(nid),
                is_leaf=nd["is_leaf"],
                prediction=nd["prediction"],
                exemplar_labels=nd["exemplar_labels"],
                exemplars=nd["exemplars"],
                children={int(k): v for k, v in nd["children"].items()},
            )
        return t

    @property
    def depth(self) -> int:
        def node_depth(nid: int) -> int:
            n = self.nodes[nid]
            if not n.children:
                return 1
            return 1 + max(node_depth(c) for c in n.children.values())

        return node_depth(0) if self.nodes else 0
