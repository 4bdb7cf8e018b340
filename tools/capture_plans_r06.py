"""Capture .explain("formatted") for every headline bench query.

Usage: python tools/capture_plans_r06.py <tag>
Writes plans/r06/<query>_<tag>.txt (tag = before / after).

Each file may hold several sections (imperative queries like q1 are a
chain of materialisations; the plan of each materialised stage is
captured in order). Pure plan capture — nothing is executed except the
tiny driver-side probes the library itself runs while BUILDING the
plans (count probes that pick routes), which are part of the plan
shape being documented.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as em
    from entityframe_spark.session import get_spark

    spark = get_spark(app_name=f"plans_{tag}", cores=cpus, shuffle_partitions=cpus)

    def save(name: str, sections: list[tuple[str, str]]) -> None:
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            for title, text in sections:
                f.write(f"===== {title} =====\n")
                f.write(text)
                f.write("\n")
        print(f"wrote {path}")

    # ---- q1 linkage pipeline: capture each materialised stage's plan
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
    )
    sections = [("stage collapse+features", _fmt(collapsed))]
    collapsed_ck = collapsed.localCheckpoint(eager=False)
    n_records = collapsed_ck.count()
    pairs = build_candidate_pairs(collapsed_ck, max_block_size=64)
    sections.append(("stage candidate pairs", _fmt(pairs)))
    pairs_ck = pairs.localCheckpoint(eager=False)
    scored = score_pairs(
        attach_pair_texts(pairs_ck, collapsed_ck, features_count=n_records)
    )
    sections.append(("stage attach+score", _fmt(scored)))
    scored_ck = scored.localCheckpoint(eager=True)
    clusters = full_partition(collapsed_ck, cluster_edges(scored_ck, 0.5))
    sections.append(("stage cluster (full partition)", _fmt(clusters)))
    save("q1_linkage_pipeline", sections)

    # ---- q2 hierarchy build
    from entityframe_spark.operators.hierarchy import (
        build_merge_edges,
        memberships_for_grid,
    )

    edges = em._supplier_edges(spark, sf_dir)
    me = build_merge_edges(edges)
    sections = [("stage merge edges", _fmt(me))]
    me_ck = me.localCheckpoint(eager=False)
    recs = em._edge_records(edges)
    mem = memberships_for_grid(me_ck, recs, em.SWEEP_FPS)
    agg = mem.groupBy("threshold_fp").agg(F.countDistinct("cluster_id").alias("c"))
    sections.append(("stage grid memberships + agg", _fmt(agg)))
    save("q2_hierarchy_build", sections)

    # ---- q3 sweep metrics
    save("q3_sweep_metrics", [("full query", _fmt(em.q_sweep_metrics(spark, sf_dir)))])

    # ---- q4 dedup minhash
    from entityframe_spark.pipeline.dedup import (
        dedup_groups,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = em._load(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(d)
    sections = [("stage lsh candidates", _fmt(cands))]
    cands_ck = cands.localCheckpoint(eager=False)
    verified = ngram_jaccard_pairs(d, min_jaccard=0.6, candidate_pairs=cands_ck)
    sections.append(("stage ngram verify", _fmt(verified)))
    groups = dedup_groups(verified)
    sections.append(("stage dedup groups (CC)", _fmt(groups)))
    save("q4_dedup_minhash", sections)

    # ---- q5 / q6
    save("q5_ann_topk", [("full query", _fmt(em.q_ann_topk(spark, sf_dir)))])
    save("q6_text_profile", [("full query", _fmt(em.q_text_profile(spark, sf_dir)))])

    # ---- q7 n-way sweep
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
    res = ef7.analyse_df(ga, gb)
    save("q7_nway_sweep_100x100", [("full query", _fmt(res))])

    spark.stop()


if __name__ == "__main__":
    main()
