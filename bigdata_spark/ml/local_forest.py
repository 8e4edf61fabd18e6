"""Local (per-partition) proximity forest (SURVEY §3.3; reference
local_model_manager.py).

Spark-first redesign of the reference's RDD hop (U5,
``df.rdd.mapPartitions`` at local_model_manager.py:195): training runs
as ``groupBy(_partition_id).applyInPandas`` — same semantics (one tree
per balanced stratified partition), but it stays in the DataFrame API,
gets Arrow batching, and the returned model state is a JSON string
column instead of opaque pickles (engine-portable persistence,
SURVEY §7 hard-point 3).

Scale: training shuffles each row once (the partition groupBy);
prediction broadcasts the (small) forest and runs one Arrow-batched
pandas UDF pass — no shuffle, same as the reference's predict path.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType, StringType, DoubleType

from ..operators.preprocess import balanced_stratified_repartition
from .proximity import ProximityTree


class LocalProximityForest:
    """One proximity tree per partition, majority-vote ensemble with
    optional OOB-accuracy weighting (reference local_model_manager.py:
    133-146,178-188)."""

    def __init__(
        self,
        num_partitions: int = 4,
        n_splitters: int = 5,
        max_depth: int = 20,
        use_weighting: bool = False,
        seed: int = 42,
        metric: str = "euclidean",
        dtw_window: int | None = None,
    ) -> None:
        self.num_partitions = num_partitions
        self.n_splitters = n_splitters
        self.max_depth = max_depth
        self.use_weighting = use_weighting
        self.seed = seed
        self.metric = metric
        self.dtw_window = dtw_window
        self.trees: list[ProximityTree] = []
        self.weights: list[float] = []

    # -- train -------------------------------------------------------------

    def fit(self, df: DataFrame, label_col: str = "label", features_col: str = "features") -> "LocalProximityForest":
        """df: (label int, features array<double>). Assigns balanced
        stratified partitions (W1+O3) then trains one tree per partition
        via applyInPandas."""
        # _row_key: content hash carried into the pandas group so each
        # partition's rows can be sorted deterministically before
        # training — applyInPandas delivers rows in shuffle-fetch order,
        # which varies run to run and would otherwise change the tree.
        keyed = df.select(label_col, features_col).withColumn(
            "_row_key", F.xxhash64(F.lit(self.seed), label_col, features_col)
        )
        parted = balanced_stratified_repartition(
            keyed,
            label_col,
            self.num_partitions,
            seed=self.seed,
            keep_partition_col=True,
        )

        n_splitters = self.n_splitters
        max_depth = self.max_depth
        use_weighting = self.use_weighting
        seed = self.seed
        metric = self.metric
        dtw_window = self.dtw_window
        schema = StructType(
            [
                StructField("partition_id", IntegerType()),
                StructField("tree_json", StringType()),
                StructField("oob_score", DoubleType()),
            ]
        )

        def train_partition(key, pdf):
            pid = int(key[0])
            pdf = pdf.sort_values("_row_key", kind="mergesort")
            X = np.stack(pdf[features_col].to_numpy())
            y = pdf[label_col].to_numpy().astype(np.int64)
            oob = 1.0
            if use_weighting and len(y) >= 10:
                # 80/20 holdout for the ensemble weight (reference
                # local_model_manager.py:178-188)
                rng = np.random.default_rng(seed + pid)
                ix = rng.permutation(len(y))
                cut = int(len(y) * 0.8)
                tr, va = ix[:cut], ix[cut:]
                t = ProximityTree(
                    n_splitters, max_depth, seed=seed + pid,
                    metric=metric, dtw_window=dtw_window,
                ).fit(X[tr], y[tr])
                oob = float((t.predict(X[va]) == y[va]).mean()) if len(va) else 1.0
            tree = ProximityTree(
                n_splitters, max_depth, seed=seed + pid,
                metric=metric, dtw_window=dtw_window,
            ).fit(X, y)
            return pd.DataFrame(
                [{"partition_id": pid, "tree_json": json.dumps(tree.to_state()), "oob_score": oob}]
            )

        rows = (
            parted.groupBy("_partition_id")
            .applyInPandas(train_partition, schema=schema)
            .collect()
        )
        rows.sort(key=lambda r: r["partition_id"])
        self.trees = [ProximityTree.from_state(json.loads(r["tree_json"])) for r in rows]
        self.weights = [r["oob_score"] if self.use_weighting else 1.0 for r in rows]
        return self

    # -- predict -----------------------------------------------------------

    def predict(self, df: DataFrame, features_col: str = "features") -> DataFrame:
        """Append a ``prediction`` column via broadcast forest + one
        Arrow-batched pandas UDF pass (reference prediction_manager.py:
        84-98 shape); ties break to the smallest class id."""
        spark = df.sparkSession
        states = [t.to_state() for t in self.trees]
        weights = list(self.weights)
        bc = spark.sparkContext.broadcast((states, weights))

        @F.pandas_udf(IntegerType())
        def forest_predict(features: pd.Series) -> pd.Series:
            states_, weights_ = bc.value
            trees = [ProximityTree.from_state(s) for s in states_]
            X = np.stack(features.to_numpy())
            classes = sorted(
                {int(c) for t in trees for c in (t.classes_.tolist() if t.classes_ is not None else [])}
            )
            cls_ix = {c: i for i, c in enumerate(classes)}
            votes = np.zeros((len(X), len(classes)))
            for t, w in zip(trees, weights_):
                pred = t.predict(X)
                for r, p in enumerate(pred):
                    votes[r, cls_ix[int(p)]] += w
            out = [classes[i] for i in np.argmax(votes, axis=1)]
            return pd.Series(out, dtype="int32")

        return df.withColumn("prediction", forest_predict(F.col(features_col)))

    # -- persistence (S5/S6: JSON model sink/source) -----------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "num_partitions": self.num_partitions,
                    "n_splitters": self.n_splitters,
                    "max_depth": self.max_depth,
                    "use_weighting": self.use_weighting,
                    "seed": self.seed,
                    "weights": self.weights,
                    "trees": [t.to_state() for t in self.trees],
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "LocalProximityForest":
        with open(path) as f:
            state = json.load(f)
        m = cls(
            num_partitions=state["num_partitions"],
            n_splitters=state["n_splitters"],
            max_depth=state["max_depth"],
            use_weighting=state["use_weighting"],
            seed=state["seed"],
        )
        m.weights = state["weights"]
        m.trees = [ProximityTree.from_state(s) for s in state["trees"]]
        return m
