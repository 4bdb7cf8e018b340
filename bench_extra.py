"""Phase-level isolation benchmarks (guide §1.4): times each sub-stage
of the headline queries separately, with job descriptions, so
OPTIMIZATION_r06.md can attribute wall-clock to stages instead of
guessing. Does NOT replace bench.py (frozen for measurement); prints
one JSON line with per-phase seconds.

Methodology: BENCH_REPS runs per query (default 3), min per phase —
same estimator as bench.py. Phases within a query run in bench.py's
exact order so checkpoint reuse matches the real query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    which = set((os.environ.get("BENCH_QUERIES", "q1,q4") or "").split(","))

    import __spark_entry__ as em
    from entityframe_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext

    results: dict[str, dict[str, list[float]]] = {}

    def phase(qname: str, pname: str, fn):
        sc.setJobDescription(f"{qname}: {pname}")
        t0 = time.time()
        out = fn()
        wall = round(time.time() - t0, 3)
        results.setdefault(qname, {}).setdefault(pname, []).append(wall)
        sc.setJobDescription(None)
        return out

    # ---------------- q1 phases ----------------
    def q1_run():
        from pyspark.sql.window import Window

        from entityframe_spark.pipeline.blocking import build_candidate_pairs
        from entityframe_spark.pipeline.linkage import (
            assign_record_ids,
            cluster_edges,
            full_partition,
        )
        from entityframe_spark.pipeline.scoring import (
            attach_pair_texts,
            prepare_record_features,
            score_pairs,
        )
        from entityframe_spark.pipeline.transcripts import collapse_conversations

        e = em._load(spark, sf_dir, "events")
        transcripts = e.select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.concat_ws(" ", "event_type", "props").alias("text"),
            F.lit("").alias("tool"),
            F.col("ts"),
        )
        collapsed = prepare_record_features(
            assign_record_ids(collapse_conversations(transcripts))
        ).localCheckpoint(eager=False)
        n_records = phase("q1", "collapse+features count", collapsed.count)
        pairs = build_candidate_pairs(collapsed, max_block_size=64).localCheckpoint(
            eager=False
        )
        phase("q1", "blocking pairs count", pairs.count)
        scored = phase(
            "q1",
            "attach+score ckpt",
            lambda: score_pairs(
                attach_pair_texts(pairs, collapsed, features_count=n_records)
            ).localCheckpoint(eager=True),
        )
        phase(
            "q1",
            "checksum agg",
            lambda: scored.agg(
                F.sum(F.xxhash64(*scored.columns).cast("decimal(38,0)"))
            ).collect(),
        )
        phase(
            "q1",
            "cluster+count",
            lambda: full_partition(collapsed, cluster_edges(scored, 0.5)).count(),
        )

    # ---------------- q4 phases ----------------
    def q4_run():
        from entityframe_spark.pipeline.dedup import (
            dedup_groups,
            minhash_lsh_candidates,
            ngram_jaccard_pairs,
        )

        d = em._load(spark, sf_dir, "documents")
        cands = minhash_lsh_candidates(d).localCheckpoint(eager=False)
        n_c = phase("q4", "lsh candidates count", cands.count)
        verified = ngram_jaccard_pairs(d, min_jaccard=0.6, candidate_pairs=cands)
        vc = verified.localCheckpoint(eager=False)
        phase("q4", "ngram verify count", vc.count)
        phase("q4", "cc groups count", lambda: dedup_groups(vc).count())
        results.setdefault("q4", {})["n_candidates"] = [float(n_c)]

    # ---------------- q2 phases ----------------
    def q2_run():
        from entityframe_spark.operators.hierarchy import (
            build_merge_edges,
            memberships_for_grid,
        )

        edges = em._supplier_edges(spark, sf_dir)
        me = phase(
            "q2",
            "build_merge_edges ckpt",
            lambda: build_merge_edges(edges).localCheckpoint(eager=False),
        )
        recs = em._edge_records(edges)
        phase(
            "q2",
            "memberships+agg",
            lambda: memberships_for_grid(me, recs, em.SWEEP_FPS)
            .groupBy("threshold_fp")
            .agg(F.countDistinct("cluster_id").alias("c"))
            .count(),
        )

    # ---------------- q7 phases ----------------
    def q7_run():
        from entityframe_spark.operators.collection import Collection
        from entityframe_spark.operators.entityframe import EntityFrame, col

        def _nway_edges(seed: int):
            c = em._load(spark, sf_dir, "customer")
            return c.select(
                F.col("c_custkey").cast("string").alias("src"),
                F.concat(F.lit("n"), F.col("c_nationkey")).alias("dst"),
                (
                    F.pmod(F.xxhash64("c_custkey", F.lit(seed)), F.lit(1000)) / 1000.0
                ).alias("weight"),
            )

        ef7 = EntityFrame()
        ef7.add_collection("a", Collection.from_edges(_nway_edges(1)))
        ef7.add_collection("b", Collection.from_edges(_nway_edges(2)))
        ga = col("a").sweep(0.0, 0.99, 0.01)
        gb = col("b").sweep(0.0, 0.99, 0.01)
        phase("q7", "analyse_df count", lambda: ef7.analyse_df(ga, gb).count())

    runners = {"q1": q1_run, "q2": q2_run, "q4": q4_run, "q7": q7_run}
    for _ in range(reps):
        for name, fn in runners.items():
            if name in which:
                fn()

    mins = {
        q: {p: min(v) for p, v in phases.items()} for q, phases in results.items()
    }
    print(
        json.dumps(
            {
                "metric": "phase_isolation",
                "sf": sf_dir,
                "cpus": cpus,
                "reps": reps,
                "phases_min": mins,
                "phases_all": results,
            }
        )
    )


if __name__ == "__main__":
    main()
