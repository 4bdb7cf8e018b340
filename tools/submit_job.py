"""spark-submit entrypoint for the transcript record-linkage pipeline.

The north rule requires the job to "run via spark-submit --py-files on
multi-executor clusters" — this is that entrypoint, exercised for real
by tests/test_submit.py (which zips the package, spark-submits this
file with --py-files on a local master, and checks the written
clusters + metrics). On a real cluster the same command line works
unchanged with --master yarn/k8s:// and cluster-sized resources:

    python tools/make_pyfiles_zip.py /tmp/entityframe_spark.zip
    spark-submit --master <master> \
        --py-files /tmp/entityframe_spark.zip \
        tools/submit_job.py \
        --transcripts s3://bucket/transcripts \
        --truth s3://bucket/truth \
        --workdir s3://bucket/checkpoints/run1 \
        --out s3://bucket/out/run1

Design constraints honoured here:
- NO SparkSession config beyond getOrCreate(): master, memory, AQE,
  shuffle partitions all come from spark-submit / spark-defaults, as
  they would on a cluster. (entityframe_spark.session.get_spark is the
  local-dev constructor; an already-running session wins inside it,
  but the submit path must not depend on local-dev defaults at all.)
- The package arrives via --py-files (a zip on the executors' and
  driver's sys.path), so imports happen inside main(), after
  spark-submit has installed the zip.
- Stages checkpoint through StageRunner (resumable: re-submitting with
  the same --workdir/--run-id skips completed stages; per-stage
  lineage + metrics rows land in the workdir's _stages table).

Input table shape (BASELINE.json input_hint): conv_id string,
turn_idx int, role string, text string, tool string, ts timestamp.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--transcripts",
        required=True,
        help="parquet path of the transcripts table, or synth:N to "
        "generate N deterministic conversations in-session (tests)",
    )
    p.add_argument(
        "--truth",
        default=None,
        help="optional parquet path (conv_id string, truth_cluster long); "
        "with synth:N inputs the synthesiser's own truth is used",
    )
    p.add_argument("--workdir", required=True, help="checkpoint dir (any Hadoop FS)")
    p.add_argument("--out", required=True, help="output dir for clusters/metrics")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--max-block-size", type=int, default=64)
    p.add_argument("--run-id", default="run0")
    p.add_argument(
        "--no-resume",
        action="store_true",
        help="recompute every stage even if checkpointed",
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    # imports AFTER spark-submit has put the --py-files zip on sys.path
    from pyspark.sql import SparkSession

    from entityframe_spark.pipeline.linkage import run_pipeline
    from entityframe_spark.pipeline.transcripts import synthesize_transcripts

    spark = SparkSession.builder.getOrCreate()

    truth = None
    if args.transcripts.startswith("synth:"):
        n = int(args.transcripts.split(":", 1)[1])
        transcripts, truth = synthesize_transcripts(spark, n_conversations=n)
    else:
        transcripts = spark.read.parquet(args.transcripts)
    if args.truth:
        truth = spark.read.parquet(args.truth)

    result = run_pipeline(
        spark,
        transcripts,
        args.workdir,
        truth=truth,
        match_threshold=args.threshold,
        max_block_size=args.max_block_size,
        resume=not args.no_resume,
        run_id=args.run_id,
    )

    result["clusters"].write.mode("overwrite").parquet(args.out + "/clusters")
    summary = {
        "n_records": result["collapsed"].count(),
        "n_candidate_pairs": result["pairs"].count(),
        "n_clusters": result["clusters"].select("cluster_id").distinct().count(),
    }
    if "evaluation" in result:
        ev = result["evaluation"]  # one-row DataFrame (tp fp fn p r f1)
        ev.write.mode("overwrite").parquet(args.out + "/metrics")
        summary["evaluation"] = {
            k: (float(v) if v is not None else None)
            for k, v in ev.collect()[0].asDict().items()
        }
    # one machine-readable line for the submitting process to capture
    print("SUBMIT_RESULT " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
