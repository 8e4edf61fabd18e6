"""Global proximity tree as Spark DataFrame dataflow (SURVEY §3.2;
reference global_model_manager.py:168-402).

The reference's BFS level loop costs O(k·open_nodes) Spark actions per
level (one weighted-Gini job per candidate split — the reason its
global training takes 1,900-5,300 s). This implementation keeps the
same semantics but runs ONE fused Spark job per level (SURVEY §7
Phase 4), plus one bootstrap job:

  bootstrap — a window pass over the root yields the per-label counts
              and the k-per-label exemplar pool (bounded collect —
              the reference's own "P2" lesson).
  level job — every candidate's branch assignment is computed natively
              (nearest_exemplar_index — no Python UDF) over the
              frontier joined with a broadcast candidate-exemplar
              table; ONE window over (node, cand, branch, label)
              yields BOTH the branch-label counts (the weighted-Gini
              input, finished on the driver over the tiny table, and
              the would-be children's label stats — so leaf checks run
              at child creation with no stats job) AND the
              k-per-group exemplar pool for the next level, ranked by
              a content hash keyed to the next depth — bit-identical
              to what a dedicated next-level sampling pass would draw
              for the winning candidate's branches.

The routing projection (broadcast join + column expressions, no
shuffle; an inner join that drops rows bound for leaf children, so the
frontier shrinks monotonically) is never materialized by its own
action: the NEXT level's fused job is its first action and fills the
cache, after which the parent level's cache is dropped. Net: 1 job per
level (the reference: O(k·open_nodes)+3), and the last level's routing
never executes at all.

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
        )
        # Spread an under-partitioned frontier across the executors: a
        # small training table often arrives as 1-2 scan partitions and
        # every level's distance compute (the real per-row cost) would
        # run serially. Routing joins are narrow, so the whole BFS
        # inherits this layout. No-op at scale (inputs already have
        # >= parallelism partitions); content-hash ranking keeps the
        # fitted tree independent of the physical layout either way.
        spread = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)
        if assign.rdd.getNumPartitions() < spread:
            assign = assign.repartition(spread)
        assign = assign.persist()

        # global majority for the null-prediction fallback (reference
        # :182-184) — derived from the bootstrap stats (node 0 holds
        # every row), no separate job
        self.majority_class = None
        self.nodes = {0: TreeNode(0)}
        next_id = 1
        depth = 0
        # per-node label counts, accumulated across levels: the root
        # from the bootstrap count window, every later node from its
        # parent's winning gini branch counts — so leaf decisions and
        # the final dangling-node sweep never need their own Spark job
        stats: dict[int, dict[int, int]] = {}
        prev_assign: DataFrame | None = None

        # ---- bootstrap job: root pool + per-label counts, one pass.
        # order key hashes row CONTENT (not partition-seeded rand): the
        # sampled pool is identical on any cluster layout, so a seeded
        # fit is reproducible across sessions/retries. Arrow boundary
        # (toPandas), not .collect(): the pool is O(k·classes) rows of
        # feature arrays and py4j Row materialization was the measured
        # bottleneck on wide trees.
        w0 = Window.partitionBy("node_id", "label").orderBy(
            F.xxhash64(F.lit(self.seed), "features")
        )
        cw0 = Window.partitionBy("node_id", "label")
        pool_pdf = (
            assign.withColumn("_rk", F.row_number().over(w0))
            .withColumn("_cnt", F.count("*").over(cw0))
            .filter(F.col("_rk") <= self.exemplar_pool_k)
            .select("node_id", "label", "features", "_cnt", "_rk")
            .toPandas()
            .sort_values(["node_id", "label", "_rk"])
        )
        pool: dict[int, dict[int, list[list[float]]]] = {}
        for nid_, lbl_, feats_, cnt_ in zip(
            pool_pdf["node_id"], pool_pdf["label"], pool_pdf["features"], pool_pdf["_cnt"]
        ):
            stats.setdefault(int(nid_), {})[int(lbl_)] = int(cnt_)
            pool.setdefault(int(nid_), {}).setdefault(int(lbl_), []).append(
                np.asarray(feats_, dtype=np.float64).tolist()
            )
        s0 = stats.get(0, {})
        if s0:
            self.majority_class = int(max(sorted(s0), key=lambda k: s0[k]))
        # root leaf check (reference :248-253); later levels run these
        # at child creation from the fused job's branch counts
        open_nodes = (
            [0]
            if sum(s0.values()) >= self.min_samples_split and len(s0) > 1
            else []
        )
        if not open_nodes:
            self._make_leaf(0, s0)

        while open_nodes and depth < self.max_depth:
            # candidate splits: per node, n_splitters random exemplar
            # sets drawn from the (winning-branch) pool of the previous
            # level — iteration order is ascending node id, so the rng
            # draw sequence is deterministic
            candidates: dict[int, list[tuple[list[int], list[list[float]]]]] = {}
            for nid in open_nodes:
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

            # THE fused level job — the only Spark job per level. For
            # every (node, candidate) pair it computes, in one window
            # pass over the frontier stacked n_splitters times:
            #   - the per-(branch,label) counts (_cnt — the gini input,
            #     and the would-be child's label stats), and
            #   - the k-per-(branch,label) exemplar pool for the NEXT
            #     level, ranked by xxhash64(seed+depth+1, features) —
            #     exactly the ranking a separate next-level pool pass
            #     would use, so the winning candidate's branch pools are
            #     bit-identical to a dedicated sampling job.
            # Candidate exemplars travel as a broadcast-joined table,
            # NOT per-exemplar literals: a literal plan grows
            # O(nodes·k·dims) and Catalyst analysis/codegen dominates
            # (measured 400+ s at sf0.01); the joined plan is
            # constant-size however many nodes are open. The shuffle
            # moves frontier×n_splitters full rows — at scale that is
            # n_splitters× a plain pool pass, the price of running one
            # job per level instead of three.
            spark = assign.sparkSession
            cand_pdf = pd.DataFrame(
                [
                    (nid, c, cands[c][1])
                    for nid, cands in candidates.items()
                    for c in range(self.n_splitters)
                ],
                columns=["node_id", "cand", "exemplars"],
            )
            cand_df = spark.createDataFrame(
                cand_pdf, "node_id int, cand int, exemplars array<array<double>>"
            )
            part = ("node_id", "cand", "branch", "label")
            wp = Window.partitionBy(*part).orderBy(
                F.xxhash64(F.lit(self.seed + depth + 1), "features")
            )
            cwp = Window.partitionBy(*part)
            # inner join IS the node filter: every open node has
            # candidate rows (depth>0 open nodes are split-worthy by
            # construction; depth-0 degenerates drop out of the join)
            stacked = (
                assign.join(F.broadcast(cand_df), "node_id")
                .withColumn(
                    "branch", self._branch_ix(F.col("features"), F.col("exemplars"))
                )
                .withColumn("_rk", F.row_number().over(wp))
                .withColumn("_cnt", F.count("*").over(cwp))
                .filter(F.col("_rk") <= self.exemplar_pool_k)
                .select("node_id", "cand", "branch", "label", "features", "_cnt", "_rk")
                .toPandas()  # O(nodes·cands·branches·labels·k) rows — Arrow, not py4j
            )
            # this action is also the FIRST one over the previous
            # level's routing projection — it just landed in the cache,
            # so the parent level's cache can go now
            if prev_assign is not None:
                prev_assign.unpersist()
                prev_assign = None
            stacked = stacked.sort_values(["node_id", "cand", "branch", "label", "_rk"])

            # unpack pass 1: branch counts for gini (rk==1 rows carry
            # the partition count; feature arrays are NOT touched here).
            # Vectorized prefilter: the rk==1 mask and int casts run in
            # pandas/numpy, the Python loop only walks the small result.
            top = stacked[stacked["_rk"] == 1]
            agg: dict[tuple[int, int], dict[int, dict[int, int]]] = {}
            for nid_, cand_, branch_, lbl_, cnt_ in zip(
                top["node_id"].astype(int), top["cand"].astype(int),
                top["branch"].astype(int), top["label"].astype(int),
                top["_cnt"].astype(int),
            ):
                agg.setdefault((int(nid_), int(cand_)), {}).setdefault(
                    int(branch_), {}
                )[int(lbl_)] = int(cnt_)
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

            # unpack pass 2: exemplar pools ONLY for each node's winning
            # candidate (ADVICE r3 — losers' pools were an n_splitters×
            # driver-memory overhead; the next level only ever reads the
            # winner's branch pools)
            winners = {nid: cand for nid, (_g, cand) in best.items()}
            win_mask = [
                winners.get(int(n)) == int(c)
                for n, c in zip(stacked["node_id"], stacked["cand"])
            ]
            win = stacked[win_mask]
            cand_pool: dict[tuple[int, int, int], dict[int, list[list[float]]]] = {}
            for nid_, cand_, branch_, lbl_, feats_ in zip(
                win["node_id"].astype(int), win["cand"].astype(int),
                win["branch"].astype(int), win["label"].astype(int),
                win["features"],
            ):
                # Arrow hands back numpy arrays; .tolist() converts the
                # whole vector at C speed (the old per-element float()
                # comprehension was ~40% of driver unpack time)
                cand_pool.setdefault(
                    (int(nid_), int(cand_), int(branch_)), {}
                ).setdefault(int(lbl_), []).append(np.asarray(feats_, dtype=np.float64).tolist())

            # materialize winners into the tree; routing goes through the
            # same broadcast-join pattern (constant-size plan per level).
            # Each child's label counts are the winning candidate's
            # per-branch gini counts — routing sends exactly those rows
            # there — so leaf checks happen NOW, with no stats job next
            # level, and the pool pass only scans split-worthy children.
            route_rows: list[tuple[int, list[list[float]], list[int], list[bool]]] = []
            new_open: list[int] = []
            next_pool: dict[int, dict[int, list[list[float]]]] = {}
            for nid, (gini, cand) in sorted(best.items()):
                labels, exemplars = candidates[nid][cand]
                if gini >= 1.0:
                    self._make_leaf(nid, stats.get(nid, {}))
                    continue
                node = self.nodes[nid]
                node.exemplar_labels = labels
                node.exemplars = exemplars
                child_ids = []
                child_open = []
                branches = agg[(nid, cand)]
                for b_ix in range(len(labels)):
                    self.nodes[next_id] = TreeNode(next_id, parent_id=nid)
                    child_ids.append(next_id)
                    cstats = dict(branches.get(b_ix, {}))
                    stats[next_id] = cstats
                    total = sum(cstats.values())
                    if total < self.min_samples_split or len(cstats) <= 1:
                        self._make_leaf(next_id, cstats)
                        child_open.append(False)
                    else:
                        new_open.append(next_id)
                        child_open.append(True)
                        # the winning candidate's branch pool IS the
                        # child's exemplar pool next level
                        next_pool[next_id] = cand_pool.get((nid, cand, b_ix), {})
                    next_id += 1
                node.children = dict(enumerate(child_ids))
                route_rows.append((nid, exemplars, child_ids, child_open))
            pool = next_pool

            # either break leaves no dangling node: every node this
            # level was split (has children) or explicitly leafed
            open_nodes = new_open
            if not route_rows or not open_nodes:
                break

            # Routing is an INNER join (rows at nodes just closed drop
            # out) plus an open-child filter: a row whose target child
            # is already a leaf can never influence the tree again —
            # its label counts were captured in `stats` — so assign
            # shrinks monotonically to the active frontier.
            route_df = spark.createDataFrame(
                pd.DataFrame(
                    route_rows,
                    columns=["node_id", "exemplars", "child_map", "open_map"],
                ),
                "node_id int, exemplars array<array<double>>, "
                "child_map array<int>, open_map array<boolean>",
            )
            new_assign = (
                assign.join(F.broadcast(route_df), "node_id")
                .withColumn(
                    "_ix", self._branch_ix(F.col("features"), F.col("exemplars")) + 1
                )
                .filter(F.element_at(F.col("open_map"), F.col("_ix")))
                .select(
                    "label",
                    "features",
                    F.element_at(F.col("child_map"), F.col("_ix"))
                    .cast("int")
                    .alias("node_id"),
                )
                .persist()
            )
            # no count() here: the next level's pool collect is the
            # first (and only needed) materialization of this projection;
            # if the loop exits instead, the routing never runs at all
            prev_assign = assign
            assign = new_assign
            depth += 1

        # dangling-node sweep (reference :384-398): anything still open →
        # leaf, from the stats accumulated at creation time — no job
        for nid in open_nodes:
            self._make_leaf(nid, stats.get(nid, {}))
        if prev_assign is not None:
            prev_assign.unpersist()
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
        # same under-partitioning guard as fit(): one scan partition
        # would serialize the whole Arrow-batched traversal
        spread = max(2, spark.sparkContext.defaultParallelism // 2)
        if df.rdd.getNumPartitions() < spread:
            df = df.repartition(spread)

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
