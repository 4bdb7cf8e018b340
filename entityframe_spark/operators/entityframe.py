"""EntityFrame: multi-collection container + analyse()/sweep() API.

Parity target: the reference's designed EntityFrame
(docs/design/interface.md:180-237, 441-471): named collections over a
shared record space, ``ef.analyse(col("a").sweep(...),
col("truth").at(1.0), metrics=[...])`` returning a uniform
List[Dict[str, float]] with "{collection}_threshold" keys.

Spark execution: threshold grids are expanded into memberships
DataFrames once (A17), a single grouped contingency aggregation
computes every (t_a, t_b) cell, and the metric expressions evaluate
per grid point — the whole sweep is one shuffle, replacing the
reference's incremental O(k) update design (algorithms.md:671-786).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.core.quantize import PRECISION_FACTOR, threshold_to_fp
from entityframe_spark.operators import metrics as M
from entityframe_spark.operators.collection import Collection


@dataclass(frozen=True)
class ColExpression:
    """col("name").at(t) / .sweep(start, stop, step) expression."""

    name: str
    thresholds: tuple[float, ...] = ()

    def at(self, threshold: float) -> "ColExpression":
        return ColExpression(self.name, (float(threshold),))

    def sweep(self, start: float, stop: float, step: float) -> "ColExpression":
        if step <= 0:
            raise ValueError("step must be positive")
        pts, t = [], float(start)
        # inclusive stop with fixed-point tolerance, like the designed
        # sweep grid (interface.md:404-419)
        while t <= stop + 1e-9:
            pts.append(round(t, 9))
            t += step
        return ColExpression(self.name, tuple(pts))


def col(name: str) -> ColExpression:
    return ColExpression(name)


class EntityFrame:
    """Named collections sharing one record space; in Spark simply a
    dict of Collections (SURVEY.md §1.1 EntityFrame row)."""

    def __init__(self) -> None:
        self.collections: dict[str, Collection] = {}

    def add_collection(self, name: str, collection: Collection) -> "EntityFrame":
        self.collections[name] = collection
        return self

    def add_collection_from_edges(self, name: str, edges, **kw) -> "EntityFrame":
        spark_or_df = edges if isinstance(edges, DataFrame) else kw.pop("spark")
        if isinstance(edges, DataFrame):
            self.collections[name] = Collection.from_edges(edges, **kw)
        else:
            self.collections[name] = Collection.from_edges(spark_or_df, edges, **kw)
        return self

    def add_collection_from_memberships(
        self, name: str, memberships: DataFrame, records: DataFrame | None = None
    ) -> "EntityFrame":
        self.collections[name] = Collection.from_memberships(memberships, records)
        return self

    def __getitem__(self, name: str) -> Collection:
        return self.collections[name]

    # -- analyse -----------------------------------------------------------

    def analyse(self, *expressions: ColExpression, metrics: list[str] | None = None):
        """Uniform List[Dict[str, float]] result (interface.md:195-233).

        One expression  -> per-threshold stats (entity_count, entropy).
        Two expressions -> pairwise comparison metrics over the
        cartesian product of the two threshold grids.
        """
        if len(expressions) == 1:
            return self._analyse_single(expressions[0], metrics)
        if len(expressions) == 2:
            return self._analyse_pair(expressions[0], expressions[1], metrics)
        raise NotImplementedError("analyse supports 1 or 2 expressions")

    # American spelling alias, like the reference
    analyze = analyse

    def analyse_df(
        self, *expressions: ColExpression, metrics: list[str] | None = None
    ) -> DataFrame:
        """DataFrame-returning variant (the Spark-native contract)."""
        if len(expressions) == 1:
            return self._single_df(expressions[0], metrics)
        if len(expressions) == 2:
            return self._pair_df(expressions[0], expressions[1], metrics)
        raise NotImplementedError("analyse supports 1 or 2 expressions")

    def _grid_memberships(self, expr: ColExpression, alias: str) -> DataFrame:
        coll = self.collections[expr.name]
        fps = [threshold_to_fp(t) for t in expr.thresholds]
        mem = coll.memberships_for_grid(list(expr.thresholds))
        return (
            mem.where(F.col("threshold_fp").isin(fps))
            .select(
                F.col("threshold_fp").alias(f"t_{alias}"),
                "record_id",
                F.col("cluster_id").alias(f"cluster_{alias}"),
            )
            # downstream contingency branches self-join this; cut lineage
            # so the cogrouped reconstruction isn't re-analysed per branch
            .localCheckpoint(eager=False)
        )

    def _single_df(self, expr: ColExpression, metric_names) -> DataFrame:
        mem = self._grid_memberships(expr, "a")
        sizes = mem.groupBy("t_a", "cluster_a").agg(F.count(F.lit(1)).alias("sz"))
        totals = mem.groupBy("t_a").agg(F.count(F.lit(1)).alias("N"))
        out = (
            sizes.join(totals, "t_a")
            .groupBy("t_a")
            .agg(
                F.count(F.lit(1)).alias("entity_count"),
                F.round(
                    F.coalesce(
                        F.sum(
                            -(F.col("sz") / F.col("N"))
                            * F.log(F.col("sz") / F.col("N"))
                        ),
                        F.lit(0.0),
                    ),
                    9,
                ).alias("entropy"),
            )
        )
        wanted = metric_names or ["entity_count", "entropy"]
        return out.select(
            (F.col("t_a") / F.lit(float(PRECISION_FACTOR))).alias(
                f"{expr.name}_threshold"
            ),
            *[F.col(m) for m in wanted],
        ).orderBy(f"{expr.name}_threshold")

    def _pair_df(
        self, ea: ColExpression, eb: ColExpression, metric_names
    ) -> DataFrame:
        ma = self._grid_memberships(ea, "a")
        mb = self._grid_memberships(eb, "b")
        cells = (
            ma.join(mb, "record_id")
            .groupBy("t_a", "t_b", "cluster_a", "cluster_b")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        res = M.metrics_from_cells(
            cells.withColumnRenamed("t_a", "key_ta").withColumnRenamed("t_b", "key_tb"),
            keys=["key_ta", "key_tb"],
        )
        wanted = metric_names or ["f1", "precision", "recall", "ari", "nmi"]
        name_a = f"{ea.name}_threshold"
        name_b = f"{eb.name}_threshold"
        if ea.name == eb.name:
            name_a, name_b = f"{ea.name}_threshold", f"{eb.name}_threshold_2"
        return res.select(
            (F.col("key_ta") / F.lit(float(PRECISION_FACTOR))).alias(name_a),
            (F.col("key_tb") / F.lit(float(PRECISION_FACTOR))).alias(name_b),
            *[F.col(m) for m in wanted],
        ).orderBy(name_a, name_b)

    def _analyse_single(self, expr, metric_names):
        rows = self._single_df(expr, metric_names).collect()
        return [r.asDict() for r in rows]

    def _analyse_pair(self, ea, eb, metric_names):
        rows = self._pair_df(ea, eb, metric_names).collect()
        return [r.asDict() for r in rows]
