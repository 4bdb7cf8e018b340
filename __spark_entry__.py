"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline on
sf0.001; ``queries()`` exposes one callable per implemented operator
from SURVEY.md §2 (plus the training-data ops); ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for every SQL-expressible one.
Column names/aliases match exactly between both sides; float outputs
are rounded to 6dp on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared synthetic-edge definition (supplier -> nation bipartite graph)
# used by every clustering query; identical arithmetic in Spark and SQL
# ---------------------------------------------------------------------------

NATION_OFFSET = 1_000_000

EDGES_SQL = f"""
  SELECT s_suppkey AS src,
         {NATION_OFFSET} + s_nationkey AS dst,
         CAST((s_suppkey * 37) % 101 AS BIGINT) * 10000 AS w_fp
  FROM supplier
"""


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _load(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").cast("long").alias("src"),
        (F.lit(NATION_OFFSET) + F.col("s_nationkey")).cast("long").alias("dst"),
        (((F.col("s_suppkey") * 37) % 101).cast("long") * 10000).alias("w_fp"),
    )


def _edge_records(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("record_id"))
        .unionAll(edges.select(F.col("dst").alias("record_id")))
        .distinct()
    )


def _cc_oracle_sql(threshold_fp: int, select: str) -> str:
    """Recursive-CTE connected components over the supplier edges at a
    threshold: comp(node) = min reachable node over active edges;
    inactive endpoints stay singletons."""
    return f"""
WITH RECURSIVE
edges AS ({EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
act AS (SELECT src, dst FROM edges WHERE w_fp >= {threshold_fp}),
und AS (SELECT src AS u, dst AS v FROM act UNION SELECT dst, src FROM act),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
),
comp AS (SELECT node AS record_id, MIN(r) AS cluster_id FROM reach GROUP BY node)
{select}
"""


def _clusters_at(spark: SparkSession, sf_dir: str, threshold_fp: int) -> DataFrame:
    from entityframe_spark.operators.components import connected_components

    edges = _supplier_edges(spark, sf_dir)
    active = edges.where(F.col("w_fp") >= F.lit(threshold_fp))
    comps = connected_components(active, "src", "dst")
    return (
        _edge_records(edges)
        .join(comps.withColumnRenamed("node", "record_id"), "record_id", "left")
        .select(
            "record_id", F.coalesce("component", "record_id").alias("cluster_id")
        )
    )


# customer-based twin partitions for the metric queries
def _customer_partitions(spark: SparkSession, sf_dir: str):
    c = _load(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("record_id"),
        F.col("c_mktsegment").alias("cluster_id"),
    )
    b = c.select(
        F.col("c_custkey").alias("record_id"),
        (F.col("c_nationkey") % 5).cast("long").alias("cluster_id"),
    )
    return a, b


_METRICS_PAIR_SQL = """
WITH
a AS (SELECT c_custkey AS record_id, c_mktsegment AS cluster_a FROM customer),
b AS (SELECT c_custkey AS record_id, CAST(c_nationkey % 5 AS BIGINT) AS cluster_b FROM customer),
cells AS (
  SELECT cluster_a, cluster_b, COUNT(*) AS n
  FROM a JOIN b USING (record_id) GROUP BY 1, 2
),
ma AS (SELECT cluster_a, SUM(n) AS a_i FROM cells GROUP BY 1),
mb AS (SELECT cluster_b, SUM(n) AS b_j FROM cells GROUP BY 1),
tot AS (SELECT SUM(n) AS n_tot FROM cells),
en AS (
  SELECT c.cluster_a, c.cluster_b, c.n, ma.a_i, mb.b_j, tot.n_tot
  FROM cells c JOIN ma USING (cluster_a) JOIN mb USING (cluster_b) CROSS JOIN tot
),
sums AS (
  SELECT
    MAX(n_tot) AS n_tot,
    SUM(n * (n - 1) / 2.0) AS tp,
    SUM((n::DOUBLE / n_tot) * ln(n::DOUBLE * n_tot / (a_i * b_j))) AS mi,
    SUM(-(n::DOUBLE / n_tot) * ln(n::DOUBLE / a_i)) AS h_b_given_a,
    SUM(-(n::DOUBLE / n_tot) * ln(n::DOUBLE / b_j)) AS h_a_given_b,
    SUM(n::DOUBLE * n / a_i) AS bc_p,
    SUM(n::DOUBLE * n / b_j) AS bc_r
  FROM en
),
marga AS (
  SELECT SUM(a_i * (a_i - 1) / 2.0) AS pp,
         SUM(-(a_i::DOUBLE / n_tot) * ln(a_i::DOUBLE / n_tot)) AS h_a
  FROM (SELECT DISTINCT cluster_a, a_i, n_tot FROM en)
),
margb AS (
  SELECT SUM(b_j * (b_j - 1) / 2.0) AS ap,
         SUM(-(b_j::DOUBLE / n_tot) * ln(b_j::DOUBLE / n_tot)) AS h_b
  FROM (SELECT DISTINCT cluster_b, b_j, n_tot FROM en)
)
SELECT
  CAST(round(tp / pp, 6) AS DOUBLE) AS precision,
  CAST(round(tp / ap, 6) AS DOUBLE) AS recall,
  CAST(round(2 * (tp / pp) * (tp / ap) / (tp / pp + tp / ap), 6) AS DOUBLE) AS f1,
  CAST(round((tp - pp * ap / (n_tot * (n_tot - 1) / 2.0))
       / ((pp + ap) / 2.0 - pp * ap / (n_tot * (n_tot - 1) / 2.0)), 6) AS DOUBLE) AS ari,
  CAST(round(2 * mi / (h_a + h_b), 6) AS DOUBLE) AS nmi,
  CAST(round(2 * (1 - h_b_given_a / h_b) * (1 - h_a_given_b / h_a)
       / ((1 - h_b_given_a / h_b) + (1 - h_a_given_b / h_a)), 6) AS DOUBLE) AS v_measure,
  CAST(round(bc_p / n_tot, 6) AS DOUBLE) AS bcubed_precision,
  CAST(round(bc_r / n_tot, 6) AS DOUBLE) AS bcubed_recall,
  CAST(round((tp + (n_tot * (n_tot - 1) / 2.0 - pp - ap + tp))
       / (n_tot * (n_tot - 1) / 2.0), 6) AS DOUBLE) AS agreement
FROM sums CROSS JOIN marga CROSS JOIN margb
"""


def _round6(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c).cast("double"), 6))
    return df


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_records_intern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: dedup (source,key) -> dense stable record ids."""
    from entityframe_spark.core.records import intern_records

    d = _load(spark, sf_dir, "documents")
    return intern_records(
        d.select(F.col("source"), F.col("doc_id").alias("key")), "source", "key"
    )


def q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: fixed-point quantisation histogram."""
    from entityframe_spark.core.quantize import quantize_weights

    s = _load(spark, sf_dir, "supplier")
    w = (((F.col("s_suppkey") * 37) % 101) / 100.0).alias("weight")
    return (
        s.select(quantize_weights(w, 6))
        .groupBy("w_fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_clusters_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2: connected components at threshold 0.5 incl. isolates."""
    return _clusters_at(spark, sf_dir, 500_000)


def q_entity_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: entity sizes at threshold 0.3."""
    return (
        _clusters_at(spark, sf_dir, 300_000)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("entity_size"))
    )


SWEEP_FPS = [200_000, 500_000, 800_000]


def q_entity_count_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A17/C3: entity_count across a threshold grid from ONE
    dendrogram build (memberships_for_grid)."""
    from entityframe_spark.operators.hierarchy import (
        build_merge_edges,
        memberships_for_grid,
    )

    edges = _supplier_edges(spark, sf_dir)
    me = build_merge_edges(edges).localCheckpoint(eager=False)
    recs = _edge_records(edges)
    mem = memberships_for_grid(me, recs, SWEEP_FPS)
    return mem.groupBy("threshold_fp").agg(
        F.countDistinct("cluster_id").alias("entity_count")
    )


def q_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: contingency cells between two customer partitions."""
    from entityframe_spark.operators.metrics import contingency

    a, b = _customer_partitions(spark, sf_dir)
    return contingency(a, b)


def q_pairwise_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-A10: the full eval metric row for two partitions."""
    from entityframe_spark.operators.metrics import compare_partitions

    a, b = _customer_partitions(spark, sf_dir)
    out = compare_partitions(a, b)
    return _round6(out, out.columns)


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: resolution entropy of the mktsegment partition."""
    from entityframe_spark.operators.metrics import partition_entropy

    a, _ = _customer_partitions(spark, sf_dir)
    return _round6(partition_entropy(a), ["entropy"])


def q_entity_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/J7: per-entity best-match Jaccard between two partitions."""
    from entityframe_spark.operators.metrics import entity_jaccard

    a, b = _customer_partitions(spark, sf_dir)
    return _round6(entity_jaccard(a, b), ["jaccard"])


def q_window_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window collapse: ordered event_type concat per user."""
    e = _load(spark, sf_dir, "events")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.concat_ws("\n", ordered.getField("event_type")).alias("event_seq"),
    )


def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: normalised Levenshtein over adjacent customer names."""
    from entityframe_spark.functions.similarity import levenshtein_sim

    c = _load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    l = c.withColumnsRenamed({"c_custkey": "k", "c_name": "left_name"})
    r = c.select(
        (F.col("c_custkey") - 1).alias("k"), F.col("c_name").alias("right_name")
    )
    return l.join(r, "k").select(
        F.col("k").alias("left_key"),
        F.round(levenshtein_sim(F.col("left_name"), F.col("right_name")), 6).alias(
            "lev_sim"
        ),
    )


def q_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: token Jaccard over nearby document pairs."""
    from entityframe_spark.functions.similarity import token_jaccard

    d = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    l = d.select(F.col("doc_id").alias("left_id"), F.col("text").alias("lt"))
    r = d.select(F.col("doc_id").alias("right_id"), F.col("text").alias("rt"))
    pairs = l.join(
        r, (F.col("right_id") > F.col("left_id")) & (F.col("right_id") <= F.col("left_id") + 2)
    )
    return pairs.select(
        "left_id",
        "right_id",
        F.round(token_jaccard(F.col("lt"), F.col("rt")), 6).alias("token_jaccard"),
    )


def q_entity_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: sha256/md5 over sorted-member canonical form."""
    clusters = _clusters_at(spark, sf_dir, 500_000)
    ents = clusters.groupBy("cluster_id").agg(
        F.array_sort(F.collect_list(F.col("record_id").cast("string"))).alias("m")
    )
    canon = F.concat_ws(",", F.col("m"))
    return ents.select(
        "cluster_id", F.sha2(canon, 256).alias("sha256"), F.md5(canon).alias("md5")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on documents."""
    from entityframe_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(_load(spark, sf_dir, "documents")).select(
        "text_hash", "dup_count", "keep_id"
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (brute force on a small slice —
    the LSH-fed variant is q via dedup tests)."""
    from entityframe_spark.pipeline.dedup import ngram_jaccard_pairs

    d = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    return ngram_jaccard_pairs(d, n=3, min_jaccard=0.5)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs on a slice."""
    from entityframe_spark.pipeline.dedup import embedding_near_duplicates

    e = _load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    return embedding_near_duplicates(e, min_cosine=0.9)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 embedding."""
    from entityframe_spark.pipeline.ann import brute_force_topk

    e = _load(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return brute_force_topk(e, [float(x) for x in qv], k=10, exclude_ids=(0,))


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counts, ratios, quality, lang id,
    fingerprint."""
    from entityframe_spark.pipeline.textstats import text_profile

    return text_profile(_load(spark, sf_dir, "documents"))


def q_transcript_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule collapse on events-as-transcripts: conversation =
    user, turn order = (ts, event_id), text = props."""
    e = _load(spark, sf_dir, "events")
    t = e.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("ts"),
        F.col("event_id"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "text")))
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws("\n", ordered.getField("text")).alias("full_text"),
        F.concat_ws("|", F.array_sort(F.collect_set("role"))).alias("role_sig"),
    )


def q_sweep_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: eval metrics for a 3-point threshold sweep of the supplier
    clustering against the nation partition as truth — one grouped
    contingency for the whole grid."""
    from entityframe_spark.operators.hierarchy import (
        build_merge_edges,
        memberships_for_grid,
    )
    from entityframe_spark.operators.metrics import metrics_from_cells

    edges = _supplier_edges(spark, sf_dir)
    me = build_merge_edges(edges).localCheckpoint(eager=False)
    recs = _edge_records(edges)
    mem = memberships_for_grid(me, recs, SWEEP_FPS)
    s = _load(spark, sf_dir, "supplier")
    truth = s.select(
        F.col("s_suppkey").cast("long").alias("record_id"),
        F.col("s_nationkey").cast("long").alias("cluster_b"),
    ).unionByName(
        s.select(
            (F.lit(NATION_OFFSET) + F.col("s_nationkey")).cast("long").alias("record_id"),
            F.col("s_nationkey").cast("long").alias("cluster_b"),
        ).distinct()
    )
    cells = (
        mem.select(
            F.col("threshold_fp"), "record_id", F.col("cluster_id").alias("cluster_a")
        )
        .join(truth, "record_id")
        .groupBy("threshold_fp", "cluster_a", "cluster_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = metrics_from_cells(cells, keys=["threshold_fp"])
    return _round6(
        out.select("threshold_fp", "precision", "recall", "f1", "ari", "nmi"),
        ["precision", "recall", "f1", "ari", "nmi"],
    )


PAIR_GRID_A = [200_000, 500_000, 800_000]
PAIR_GRID_B = [350_000, 650_000]


def _supplier_edges_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second deterministic weighting of the supplier->nation edge
    graph (multiplier 73 instead of 37) — side B of the pair sweep."""
    s = _load(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").cast("long").alias("src"),
        (F.lit(NATION_OFFSET) + F.col("s_nationkey")).cast("long").alias("dst"),
        (((F.col("s_suppkey") * 73) % 101).cast("long") * 10000).alias("w_fp"),
    )


def q_pair_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 pair-grid fused route (operators/pair_sweep.py): every
    (t_a, t_b) cell of a 3x2 threshold grid over two independently
    weighted supplier clusterings, computed as kernel-side sufficient
    statistics (no |grid_a| x |grid_b| x n membership join) and fed
    through the same metrics_from_stats expressions as the shuffle
    route. The reference designs this sweep as incremental updates
    (docs/design/algorithms.md:671-786); the DuckDB oracle recomputes
    each grid point from first principles (recursive-CTE components
    on both sides + contingency metrics)."""
    from entityframe_spark.operators.hierarchy import build_merge_edges
    from entityframe_spark.operators.metrics import metrics_from_stats
    from entityframe_spark.operators.pair_sweep import pair_sweep_stats

    ea = _supplier_edges(spark, sf_dir)
    eb = _supplier_edges_b(spark, sf_dir)
    recs = _edge_records(ea)
    stats = pair_sweep_stats(
        recs,
        build_merge_edges(ea),
        build_merge_edges(eb),
        PAIR_GRID_A,
        PAIR_GRID_B,
    )
    if stats is None:  # supplier graphs sit far below the gates
        raise RuntimeError(
            "pair_sweep_stats unexpectedly returned None (gate tripped) "
            "for the supplier pair grid"
        )
    out = metrics_from_stats(stats, keys=["key_ta", "key_tb"])
    return _round6(
        out.select(
            F.col("key_ta").alias("threshold_a"),
            F.col("key_tb").alias("threshold_b"),
            "precision",
            "recall",
            "f1",
            "ari",
            "nmi",
        ),
        ["precision", "recall", "f1", "ari", "nmi"],
    )


def q_records_intern_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S6: attribute identity — same (source, key) with different
    attrs is a different record (data_context.rs:47-78). Keys are
    doc_id % 100 so attr maps disambiguate colliding keys."""
    from entityframe_spark.core.records import intern_records_with_attributes

    d = _load(spark, sf_dir, "documents").select(
        F.col("source"),
        (F.col("doc_id") % 100).cast("string").alias("key"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("attrs"),
    )
    out = intern_records_with_attributes(d)
    return out.select("record_id", "source", "key", "attr_sig")


def q_assimilate_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/U3: two collections interned on DIFFERENT key universes,
    assimilated into one frame space, compared via contingency.
    A = custkeys < 600 clustered by mktsegment; B = custkeys >= 300 by
    nation%5; assimilation appends B-only keys after A's ids."""
    from entityframe_spark.core.quantize import threshold_to_fp
    from entityframe_spark.core.records import intern_records
    from entityframe_spark.operators import hierarchy
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame
    from entityframe_spark.operators.metrics import contingency

    c = _load(spark, sf_dir, "customer")

    def make(universe: DataFrame, cluster_col) -> Collection:
        recs = intern_records(
            universe.select(
                F.lit("s").alias("source"),
                F.col("c_custkey").cast("string").alias("key"),
            ),
            "source",
            "key",
        )
        mem = (
            universe.select(
                F.col("c_custkey").cast("string").alias("key"),
                cluster_col.alias("cluster_key"),
            )
            .join(recs, "key")
            .select("record_id", "cluster_key")
        )
        reps = mem.groupBy("cluster_key").agg(F.min("record_id").alias("cid"))
        m = mem.join(reps, "cluster_key").select(
            "record_id", F.col("cid").alias("cluster_id")
        )
        return Collection.from_memberships(m, records=recs)

    a = make(c.where(F.col("c_custkey") < 600), F.col("c_mktsegment"))
    b = make(
        c.where(F.col("c_custkey") >= 300),
        (F.col("c_nationkey") % 5).cast("string"),
    )
    ef = EntityFrame()
    ef.add_collection("a", a)
    ef.add_collection("b", b)
    t = threshold_to_fp(1.0)
    pa = hierarchy.partition_at(ef.collections["a"].merge_edges, ef.records, t)
    pb = hierarchy.partition_at(ef.collections["b"].merge_edges, ef.records, t)
    return contingency(pa, pb)


def q_entity_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: entity lifetimes over the sweep grid. (cluster_id,
    entity_size) identifies an entity: clusters sharing a min record
    are nested, so equal size => identical member set."""
    from entityframe_spark.operators.hierarchy import build_merge_edges
    from entityframe_spark.operators.stability import entity_lifetime

    edges = _supplier_edges(spark, sf_dir)
    me = build_merge_edges(edges).localCheckpoint(eager=False)
    recs = _edge_records(edges)
    out = entity_lifetime(me, recs, SWEEP_FPS)
    return out.select(
        "cluster_id", "entity_size", "t_start_fp", "t_end_fp", "lifetime_points"
    )


def q_stability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: S(t1,t2) = |P(t1) ∩ P(t2)| / |P(t1) ∪ P(t2)| over entity
    sets for the supplier hierarchy at (0.5, 0.2)."""
    from entityframe_spark.operators.hierarchy import build_merge_edges
    from entityframe_spark.operators.stability import stability_score

    edges = _supplier_edges(spark, sf_dir)
    me = build_merge_edges(edges).localCheckpoint(eager=False)
    recs = _edge_records(edges)
    out = stability_score(me, recs, 500_000, 200_000)
    return _round6(out, ["stability"]).select(
        "common_entities", "total_entities", "stability"
    )


def q_consensus_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: the sweep-grid threshold that best agrees with the truth
    partition (argmax f1) — consensus cut selection."""
    out = q_sweep_metrics(spark, sf_dir)
    return (
        out.orderBy(F.col("f1").desc(), F.col("threshold_fp"))
        .limit(1)
        .select("threshold_fp", "f1")
    )


def _chain_fixture_edges(spark: SparkSession) -> DataFrame:
    """Deterministic two-chain + cross-merge graph whose union-find
    merge sizes are CLOSED-FORM (oracle-able in pure SQL): chain A over
    even nodes 0..40, chain B over odd nodes 1..41 (each edge extends
    the chain by one node, sizes (i+1, 1)), then one cross edge (0, 1)
    at 0.5 merging the two 21-node clusters (sizes 21, 21). All 41
    thresholds are distinct, so merge order is total. The supplier-
    hierarchy variants stay covered by pytest
    (tests/test_entityframe_features.py)."""
    a = spark.range(20).select(
        (F.col("id") * 2).alias("src"),
        (F.col("id") * 2 + 2).alias("dst"),
        (F.lit(990_000) - F.col("id") * 20_000).cast("long").alias("w_fp"),
    )
    b = spark.range(20).select(
        (F.col("id") * 2 + 1).alias("src"),
        (F.col("id") * 2 + 3).alias("dst"),
        (F.lit(980_000) - F.col("id") * 20_000).cast("long").alias("w_fp"),
    )
    cross = spark.range(1).select(
        F.lit(0).cast("long").alias("src"),
        F.lit(1).cast("long").alias("dst"),
        F.lit(500_000).cast("long").alias("w_fp"),
    )
    return a.unionAll(b).unionAll(cross)


# the chain fixture's merge events, recomputed independently in SQL:
# chain edge i merges the growing prefix cluster (size i+1, rep = chain
# head) with the next singleton; the cross edge merges the two finished
# 21-node chains
_CHAIN_MERGES_SQL = """
  SELECT CAST(990000 - 20000*i AS BIGINT) AS threshold_fp,
         CAST(2*i+2 AS BIGINT) AS child, CAST(0 AS BIGINT) AS parent,
         CAST(i+1 AS BIGINT) AS left_size, CAST(1 AS BIGINT) AS right_size
  FROM range(0, 20) t(i)
  UNION ALL
  SELECT CAST(980000 - 20000*i AS BIGINT),
         CAST(2*i+3 AS BIGINT), CAST(1 AS BIGINT),
         CAST(i+1 AS BIGINT), CAST(1 AS BIGINT)
  FROM range(0, 20) t(i)
  UNION ALL
  SELECT CAST(500000 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT),
         CAST(21 AS BIGINT), CAST(21 AS BIGINT)
"""


def q_merge_criticality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: top-20 most critical merges C(m) = |E_l| x |E_r| on the
    chain fixture — sizes are closed-form, so the SQL oracle recomputes
    them independently of the union-find."""
    from entityframe_spark.operators.hierarchy import build_merge_edges_sized
    from entityframe_spark.operators.stability import merge_criticality

    sized = build_merge_edges_sized(_chain_fixture_edges(spark))
    return (
        merge_criticality(sized)
        .orderBy(F.col("criticality").desc(), F.col("child"))
        .limit(20)
        .select("threshold_fp", "child", "parent", "criticality", "merged_size")
    )


def q_information_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: relative information loss per merge threshold on the chain
    fixture (formula in operators/stability.py; n=42 participating
    records -> C(n,2)=861 pairs, recomputed in the SQL oracle)."""
    from entityframe_spark.operators.hierarchy import build_merge_edges_sized
    from entityframe_spark.operators.stability import information_content

    sized = build_merge_edges_sized(_chain_fixture_edges(spark))
    out = information_content(sized)
    return _round6(out, ["i_cum", "info_loss"]).orderBy("threshold_fp")


def q_entity_set_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+: per-entity best-match Jaccard/Dice/overlap between the
    two customer partitions (principles.md:327-331)."""
    from entityframe_spark.operators.metrics import entity_set_metrics

    a, b = _customer_partitions(spark, sf_dir)
    return _round6(entity_set_metrics(a, b), ["jaccard", "dice", "overlap"])


def q_collection_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection.sweep surface: per-threshold entity_count + entropy
    over the supplier hierarchy grid (one dendrogram pass)."""
    from entityframe_spark.operators.collection import Collection

    edges = _supplier_edges(spark, sf_dir)
    coll = Collection.from_edges(
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
            (F.col("w_fp") / 1_000_000.0).alias("weight"),
        )
    )
    out = coll.sweep(0.2, 0.8, 0.3)
    return _round6(out, ["threshold", "entropy"])


def q_sweep_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection.sweep FAST PATH (max_cells=0 forces the O(m+|grid|)
    incremental merge-delta route, hierarchy.sweep_stats_from_merges):
    same grid and oracle as collection_sweep, so the driver verifies
    the two routes agree with DuckDB independently."""
    from entityframe_spark.operators.collection import Collection

    edges = _supplier_edges(spark, sf_dir)
    coll = Collection.from_edges(
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
            (F.col("w_fp") / 1_000_000.0).alias("weight"),
        )
    )
    out = coll.sweep(0.2, 0.8, 0.3, max_cells=0)
    return _round6(out, ["threshold", "entropy"])


# fixed near-dup corpus for the simhash oracle: three long base
# sentences with one-token edits (small hamming) plus unrelated texts
_SIMHASH_BASE1 = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the distant purple mountains tonight"
)
_SIMHASH_BASE2 = (
    "entity resolution at web scale requires careful blocking scoring "
    "and transitive clustering over candidate record pairs every day"
)
_SIMHASH_BASE3 = (
    "spark dataframes shuffle partitions across executor nodes and the "
    "catalyst optimizer prunes columns before the parquet scan happens"
)
SIMHASH_CORPUS = [
    (0, _SIMHASH_BASE1),
    (1, _SIMHASH_BASE1.replace("dog", "cat")),
    (2, _SIMHASH_BASE1.replace("tonight", "today")),
    (3, _SIMHASH_BASE2),
    (4, _SIMHASH_BASE2.replace("day", "night")),
    (5, _SIMHASH_BASE2.replace("careful", "cautious")),
    (6, _SIMHASH_BASE3),
    (7, _SIMHASH_BASE3.replace("happens", "occurs")),
    (8, "totally disjoint vocabulary aardvark zymurgy quixotic jabberwocky"),
    (9, "another unrelated short text about nothing in particular"),
    (10, _SIMHASH_BASE1.replace("quick", "swift").replace("dog", "wolf")),
    (11, _SIMHASH_BASE3.replace("spark", "flink").replace("parquet", "orc")),
]


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates on a fixed 12-doc corpus. The
    oracle is a golden VALUES table computed by an independent scalar
    reimplementation of the crc32 simhash + 4x16-bit banding (see
    tests/test_similarity.py for the scalar-parity property test):
    7 expected pairs, hamming 2..9."""
    from entityframe_spark.pipeline.dedup import simhash_candidates

    d = spark.createDataFrame(SIMHASH_CORPUS, "doc_id long, text string")
    return simhash_candidates(d).select(
        "left_id", "right_id", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("left_id", "right_id")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: deterministic synthetic media (payload byte
    j of media i = (i*31+j*7)%256 — closed form) -> binary payloads ->
    mapInPandas feature extraction (decode stubbed). The checked
    feature is the mod-997 byte-sum checksum (feature[8]): integer-
    valued, exactly representable in float32, so the SQL oracle
    recomputes it from the formula with no float-rounding hazard."""
    from entityframe_spark.pipeline.multimodal import (
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=48)
    out = extract_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        F.element_at("feature", 8).cast("long").alias("byte_sum_mod"),
    ).orderBy("media_id")


def q_staged_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 staged resolution (reference interface.md:731-763): stage 1
    resolves documents WITHIN each of two sources (even/odd doc ids) by
    exact 16-char lower-text prefix; stage 2 links stage-1 entities
    across sources by the same canonical key over their super-node
    reps; the composed partition at t=1.0 therefore equals a global
    group-by on the prefix — which is exactly what the SQL oracle
    computes, independently of the star-expansion + union-find + CC
    machinery the Spark path exercises."""
    from entityframe_spark.operators.staged import (
        link_entities_exact,
        staged_collection,
    )

    d = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("record_id"),
        F.substring(F.lower(F.col("text")), 1, 16).alias("link_key"),
        (F.col("doc_id") % 2 == 0).alias("_even"),
    )
    # stage 1: within-source partitions (cluster = min doc id sharing
    # the key within the source; ids globally distinct across sources)
    stage1 = (
        d.groupBy("_even", "link_key")
        .agg(F.min("record_id").alias("cluster_id"))
        .join(d, ["_even", "link_key"])
        .select("record_id", "cluster_id")
    )
    cross = link_entities_exact(stage1, d.select("record_id", "link_key"))
    coll = staged_collection(stage1, cross)
    part = coll.at(1.0)
    return (
        part.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("cluster_id").alias("entity_rep"), "n_docs")
        .orderBy("entity_rep")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "records_intern": q_records_intern,
        "quantize_weights": q_quantize,
        "clusters_at_threshold": q_clusters_at,
        "entity_sizes": q_entity_sizes,
        "entity_count_sweep": q_entity_count_sweep,
        "contingency": q_contingency,
        "pairwise_metrics": q_pairwise_metrics,
        "entropy": q_entropy,
        "entity_jaccard": q_entity_jaccard,
        "window_collapse": q_window_collapse,
        "levenshtein_sim": q_levenshtein,
        "token_jaccard": q_token_jaccard,
        "entity_hash": q_entity_hash,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_neardup": q_ngram_jaccard,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk_cosine": q_ann_topk,
        "text_profile": q_text_profile,
        "transcript_collapse": q_transcript_collapse,
        "sweep_metrics": q_sweep_metrics,
        "pair_sweep_metrics": q_pair_sweep,
        "records_intern_attrs": q_records_intern_attrs,
        "assimilate_contingency": q_assimilate_contingency,
        "entity_lifetime": q_entity_lifetime,
        "stability_score": q_stability_score,
        "consensus_threshold": q_consensus_threshold,
        "merge_criticality": q_merge_criticality,
        "information_loss": q_information_loss,
        "simhash_neardup": q_simhash_candidates,
        "multimodal_features": q_multimodal_features,
        "entity_set_metrics": q_entity_set_metrics,
        "collection_sweep": q_collection_sweep,
        "sweep_incremental": q_sweep_incremental,
        "staged_resolution": q_staged_resolution,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def _cc_sweep_oracle(select_per_t: str) -> str:
    parts = [
        _cc_oracle_sql(t, select_per_t.format(t=t)) for t in SWEEP_FPS
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["records_intern"] = """
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY source, key) - 1 AS BIGINT) AS record_id,
             source, key
      FROM (SELECT DISTINCT source, CAST(doc_id AS VARCHAR) AS key FROM documents)
    """

    sqls["quantize_weights"] = """
      SELECT CAST(round(((s_suppkey * 37) % 101) / 100.0 * 1000000) AS BIGINT) AS w_fp,
             COUNT(*) AS cnt
      FROM supplier GROUP BY 1
    """

    sqls["clusters_at_threshold"] = _cc_oracle_sql(
        500_000, "SELECT record_id, cluster_id FROM comp"
    )

    sqls["entity_sizes"] = _cc_oracle_sql(
        300_000,
        "SELECT cluster_id, COUNT(*) AS entity_size FROM comp GROUP BY 1",
    )

    sqls["entity_count_sweep"] = _cc_sweep_oracle(
        "SELECT CAST({t} AS BIGINT) AS threshold_fp, "
        "COUNT(DISTINCT cluster_id) AS entity_count FROM comp"
    )

    sqls["contingency"] = """
      WITH a AS (SELECT c_custkey AS record_id, c_mktsegment AS cluster_a FROM customer),
           b AS (SELECT c_custkey AS record_id, CAST(c_nationkey % 5 AS BIGINT) AS cluster_b FROM customer)
      SELECT cluster_a, cluster_b, COUNT(*) AS n
      FROM a JOIN b USING (record_id) GROUP BY 1, 2
    """

    sqls["pairwise_metrics"] = _METRICS_PAIR_SQL

    sqls["entropy"] = """
      WITH s AS (SELECT c_mktsegment, COUNT(*) AS sz FROM customer GROUP BY 1),
           t AS (SELECT SUM(sz) AS n FROM s)
      SELECT CAST(round(SUM(-(sz::DOUBLE / n) * ln(sz::DOUBLE / n)), 6) AS DOUBLE) AS entropy
      FROM s CROSS JOIN t
    """

    sqls["entity_jaccard"] = """
      WITH a AS (SELECT c_custkey AS record_id, c_mktsegment AS cluster_a FROM customer),
           b AS (SELECT c_custkey AS record_id, CAST(c_nationkey % 5 AS BIGINT) AS cluster_b FROM customer),
           cells AS (SELECT cluster_a, cluster_b, COUNT(*) AS n FROM a JOIN b USING (record_id) GROUP BY 1,2),
           ma AS (SELECT cluster_a, SUM(n) AS a_i FROM cells GROUP BY 1),
           mb AS (SELECT cluster_b, SUM(n) AS b_j FROM cells GROUP BY 1),
           j AS (SELECT c.cluster_a, c.cluster_b,
                        c.n::DOUBLE / (ma.a_i + mb.b_j - c.n) AS jac
                 FROM cells c JOIN ma USING (cluster_a) JOIN mb USING (cluster_b)),
           best AS (SELECT cluster_a, MAX(jac) AS jac FROM j GROUP BY 1)
      SELECT j.cluster_a, MIN(j.cluster_b) AS best_cluster_b,
             CAST(round(j.jac, 6) AS DOUBLE) AS jaccard
      FROM j JOIN best ON j.cluster_a = best.cluster_a AND j.jac = best.jac
      GROUP BY j.cluster_a, j.jac
    """

    sqls["window_collapse"] = """
      SELECT user_id, COUNT(*) AS n_events,
             string_agg(event_type, chr(10) ORDER BY ts, event_id) AS event_seq
      FROM events GROUP BY user_id
    """

    sqls["levenshtein_sim"] = """
      SELECT l.c_custkey AS left_key,
             CAST(round(CASE WHEN greatest(length(l.c_name), length(r.c_name)) = 0 THEN 1.0
                  ELSE 1.0 - levenshtein(l.c_name, r.c_name)::DOUBLE
                       / greatest(length(l.c_name), length(r.c_name)) END, 6) AS DOUBLE) AS lev_sim
      FROM customer l JOIN customer r ON r.c_custkey = l.c_custkey + 1
    """

    sqls["token_jaccard"] = r"""
      WITH d AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS toks
                 FROM documents WHERE doc_id < 60)
      SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             CAST(round(
               CASE WHEN len(list_distinct(l.toks || r.toks)) = 0 THEN 1.0
                    ELSE len(list_intersect(l.toks, r.toks))::DOUBLE
                         / len(list_distinct(l.toks || r.toks)) END, 6) AS DOUBLE) AS token_jaccard
      FROM d l JOIN d r ON r.doc_id > l.doc_id AND r.doc_id <= l.doc_id + 2
    """

    sqls["entity_hash"] = _cc_oracle_sql(
        500_000,
        """
        SELECT cluster_id,
               sha256(string_agg(CAST(record_id AS VARCHAR), ',' ORDER BY CAST(record_id AS VARCHAR))) AS sha256,
               md5(string_agg(CAST(record_id AS VARCHAR), ',' ORDER BY CAST(record_id AS VARCHAR))) AS md5
        FROM comp GROUP BY cluster_id
        """,
    )

    sqls["dedup_exact"] = """
      SELECT md5(text) AS text_hash, COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
      FROM documents GROUP BY 1 HAVING COUNT(*) > 1
    """

    sqls["ngram_jaccard_neardup"] = r"""
      WITH d AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)]) AS grams
        FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents WHERE doc_id < 150)
      )
      SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             CAST(round(len(list_intersect(l.grams, r.grams))::DOUBLE
                  / len(list_distinct(l.grams || r.grams)), 6) AS DOUBLE) AS jaccard
      FROM d l JOIN d r ON r.doc_id > l.doc_id
      WHERE len(list_intersect(l.grams, r.grams))::DOUBLE
            / len(list_distinct(l.grams || r.grams)) >= 0.5
    """

    sqls["embedding_neardup"] = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 150)
      SELECT l.vec_id AS left_id, r.vec_id AS right_id,
             CAST(round(list_cosine_similarity(l.v, r.v), 6) AS DOUBLE) AS cosine
      FROM e l JOIN e r ON r.vec_id > l.vec_id
      WHERE round(list_cosine_similarity(l.v, r.v), 6) >= 0.9
    """

    sqls["ann_topk_cosine"] = """
      WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id,
             CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS DOUBLE) AS cosine
      FROM embeddings CROSS JOIN q
      WHERE vec_id <> 0
      ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) DESC, vec_id
      LIMIT 10
    """

    sqls["text_profile"] = _TEXT_PROFILE_SQL

    sqls["transcript_collapse"] = """
      SELECT CAST(user_id AS VARCHAR) AS conv_id, COUNT(*) AS n_turns,
             string_agg(props, chr(10) ORDER BY ts, event_id) AS full_text,
             array_to_string(list_sort(list_distinct(list(event_type))), '|') AS role_sig
      FROM events GROUP BY user_id
    """

    sqls["sweep_metrics"] = _SWEEP_METRICS_ORACLE
    sqls["pair_sweep_metrics"] = _PAIR_SWEEP_ORACLE

    sqls["records_intern_attrs"] = """
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY source, key, attr_sig) - 1 AS BIGINT)
               AS record_id,
             source, key, attr_sig
      FROM (SELECT DISTINCT source,
                   CAST(doc_id % 100 AS VARCHAR) AS key,
                   CASE WHEN lang IS NULL THEN '{"lang":null}'
                        ELSE '{"lang":"' || lang || '"}' END AS attr_sig
            FROM documents)
    """

    sqls["assimilate_contingency"] = """
      WITH univ_a AS (SELECT c_custkey AS k, c_mktsegment AS grp
                      FROM customer WHERE c_custkey < 600),
           univ_b AS (SELECT c_custkey AS k, CAST(c_nationkey % 5 AS VARCHAR) AS grp
                      FROM customer WHERE c_custkey >= 300),
           frame0 AS (SELECT CAST(k AS VARCHAR) AS key,
                             CAST(ROW_NUMBER() OVER (ORDER BY CAST(k AS VARCHAR)) - 1 AS BIGINT) AS rid
                      FROM univ_a),
           unseen AS (SELECT CAST(k AS VARCHAR) AS key FROM univ_b
                      WHERE CAST(k AS VARCHAR) NOT IN (SELECT key FROM frame0)),
           appended AS (SELECT key,
                               (SELECT MAX(rid) FROM frame0)
                               + CAST(ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS rid
                        FROM unseen),
           frame AS (SELECT key, rid FROM frame0 UNION ALL SELECT key, rid FROM appended),
           amem AS (SELECT f.rid, a.grp FROM univ_a a
                    JOIN frame f ON f.key = CAST(a.k AS VARCHAR)),
           areps AS (SELECT grp, MIN(rid) AS cl FROM amem GROUP BY grp),
           alab AS (SELECT amem.rid, areps.cl FROM amem JOIN areps USING (grp)),
           bmem AS (SELECT f.rid, b.grp FROM univ_b b
                    JOIN frame f ON f.key = CAST(b.k AS VARCHAR)),
           breps AS (SELECT grp, MIN(rid) AS cl FROM bmem GROUP BY grp),
           blab AS (SELECT bmem.rid, breps.cl FROM bmem JOIN breps USING (grp)),
           allr AS (SELECT frame.rid,
                           COALESCE(alab.cl, frame.rid) AS cluster_a,
                           COALESCE(blab.cl, frame.rid) AS cluster_b
                    FROM frame
                    LEFT JOIN alab ON alab.rid = frame.rid
                    LEFT JOIN blab ON blab.rid = frame.rid)
      SELECT cluster_a, cluster_b, COUNT(*) AS n FROM allr GROUP BY 1, 2
    """

    sqls["entity_lifetime"] = f"""
      WITH all_t AS ({_cc_sweep_oracle(
        "SELECT CAST({t} AS BIGINT) AS t, cluster_id, "
        "CAST(COUNT(*) AS BIGINT) AS entity_size FROM comp GROUP BY 2"
      )})
      SELECT cluster_id, entity_size,
             MAX(t) AS t_start_fp, MIN(t) AS t_end_fp,
             CAST(COUNT(*) AS BIGINT) AS lifetime_points
      FROM all_t GROUP BY 1, 2
    """

    sqls["stability_score"] = _STABILITY_ORACLE

    sqls["consensus_threshold"] = f"""
      SELECT threshold_fp, f1 FROM ({_SWEEP_METRICS_ORACLE})
      ORDER BY f1 DESC, threshold_fp LIMIT 1
    """

    sqls["entity_set_metrics"] = """
      WITH a AS (SELECT c_custkey AS record_id, c_mktsegment AS cluster_a FROM customer),
           b AS (SELECT c_custkey AS record_id, CAST(c_nationkey % 5 AS BIGINT) AS cluster_b FROM customer),
           cells AS (SELECT cluster_a, cluster_b, COUNT(*) AS n FROM a JOIN b USING (record_id) GROUP BY 1,2),
           ma AS (SELECT cluster_a, SUM(n) AS a_i FROM cells GROUP BY 1),
           mb AS (SELECT cluster_b, SUM(n) AS b_j FROM cells GROUP BY 1),
           j AS (SELECT c.cluster_a, c.cluster_b,
                        c.n::DOUBLE / (ma.a_i + mb.b_j - c.n) AS jac,
                        2 * c.n::DOUBLE / (ma.a_i + mb.b_j) AS dice,
                        c.n::DOUBLE / least(ma.a_i, mb.b_j) AS ovl
                 FROM cells c JOIN ma USING (cluster_a) JOIN mb USING (cluster_b)),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_a
                                              ORDER BY jac DESC, cluster_b) AS rn FROM j)
      SELECT cluster_a, cluster_b AS best_cluster_b,
             CAST(round(jac, 6) AS DOUBLE) AS jaccard,
             CAST(round(dice, 6) AS DOUBLE) AS dice,
             CAST(round(ovl, 6) AS DOUBLE) AS overlap
      FROM r WHERE rn = 1
    """

    sqls["merge_criticality"] = f"""
      WITH merges AS ({_CHAIN_MERGES_SQL})
      SELECT threshold_fp, child, parent,
             CAST(left_size * right_size AS BIGINT) AS criticality,
             CAST(left_size + right_size AS BIGINT) AS merged_size
      FROM merges
      ORDER BY criticality DESC, child
      LIMIT 20
    """

    sqls["information_loss"] = f"""
      WITH merges AS ({_CHAIN_MERGES_SQL}),
           im AS (SELECT threshold_fp,
                         -ln(left_size * right_size / 861.0) / ln(2) AS i_m
                  FROM merges),
           byt AS (SELECT threshold_fp, SUM(i_m) AS i_t FROM im GROUP BY 1),
           tot AS (SELECT SUM(i_m) AS ih FROM im)
      SELECT threshold_fp,
             CAST(round(SUM(i_t) OVER (ORDER BY threshold_fp DESC), 6) AS DOUBLE)
               AS i_cum,
             CAST(round(1 - SUM(i_t) OVER (ORDER BY threshold_fp DESC) / ih, 6)
               AS DOUBLE) AS info_loss
      FROM byt CROSS JOIN tot
      ORDER BY threshold_fp
    """

    # golden VALUES computed by an independent scalar reimplementation
    # of the crc32 simhash + 4x16-bit banding over SIMHASH_CORPUS
    sqls["simhash_neardup"] = """
      SELECT CAST(left_id AS BIGINT) AS left_id,
             CAST(right_id AS BIGINT) AS right_id,
             CAST(hamming AS BIGINT) AS hamming
      FROM (VALUES (0, 2, 7), (0, 10, 8), (2, 10, 9), (3, 4, 7),
                   (3, 5, 4), (4, 5, 7), (6, 7, 2)) t(left_id, right_id, hamming)
      ORDER BY left_id, right_id
    """

    sqls["multimodal_features"] = """
      WITH m AS (SELECT i AS media_id,
                        CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS kind,
                        64 + (i % 5) * 32 AS nb
                 FROM range(0, 48) t(i)),
           b AS (SELECT m.media_id, m.kind, m.nb,
                        (m.media_id * 31 + r.j * 7) % 256 AS v
                 FROM m JOIN range(0, 224) r(j) ON r.j < m.nb)
      SELECT media_id, kind, CAST(nb AS INTEGER) AS n_bytes,
             CAST(SUM(v) % 997 AS BIGINT) AS byte_sum_mod
      FROM b GROUP BY media_id, kind, nb
      ORDER BY media_id
    """

    sqls["staged_resolution"] = """
      SELECT CAST(MIN(doc_id) AS BIGINT) AS entity_rep,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
      GROUP BY substr(lower(text), 1, 16)
      ORDER BY entity_rep
    """

    sqls["collection_sweep"] = " UNION ALL ".join(
        "SELECT * FROM ("
        + _cc_oracle_sql(
            t,
            f"""
            SELECT CAST({t} / 1000000.0 AS DOUBLE) AS threshold,
                   CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS entity_count,
                   CAST(round(SUM(-(sz::DOUBLE / n_tot) * ln(sz::DOUBLE / n_tot)), 6) AS DOUBLE) AS entropy
            FROM (SELECT cluster_id, COUNT(*) AS sz FROM comp GROUP BY 1)
            CROSS JOIN (SELECT COUNT(*) AS n_tot FROM comp)
            """,
        )
        + ")"
        for t in (200_000, 500_000, 800_000)
    )
    # the incremental fast path must reproduce the same per-threshold
    # stats; verifying both routes against the same independent oracle
    sqls["sweep_incremental"] = sqls["collection_sweep"]

    return sqls


def _entity_sig_cte(t: int, name: str) -> str:
    """comp at threshold t -> one member-list signature per cluster."""
    return _cc_oracle_sql(
        t,
        "SELECT string_agg(CAST(record_id AS VARCHAR), ',' "
        "ORDER BY record_id) AS sig FROM comp GROUP BY cluster_id",
    )


_STABILITY_ORACLE = f"""
WITH a AS ({_entity_sig_cte(500_000, "a")}),
     b AS ({_entity_sig_cte(200_000, "b")}),
     u AS (SELECT sig, MAX(ina) AS ina, MAX(inb) AS inb FROM (
             SELECT sig, 1 AS ina, 0 AS inb FROM a
             UNION ALL
             SELECT sig, 0, 1 FROM b) GROUP BY sig)
SELECT CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS common_entities,
       CAST(COUNT(*) AS BIGINT) AS total_entities,
       CAST(round(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)::DOUBLE
            / COUNT(*), 6) AS DOUBLE) AS stability
FROM u
"""


_TEXT_PROFILE_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\s+') AS toks,
         string_split_regex(lower(trim(text)), '\s+') AS ltoks
  FROM documents
),
base AS (
  SELECT doc_id, text, toks, ltoks,
         len(toks) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text)
              ELSE 0.0 END AS praw,
         CASE WHEN len(ltoks) > 0
              THEN len(list_filter(ltoks, x -> list_contains(
                   ['the','and','of','to','a','in','is','it','that','for',
                    'on','with','as','at','by','an','be','this','are','or'], x)))::DOUBLE / len(ltoks)
              ELSE 0.0 END AS sraw,
         CASE WHEN len(toks) > 0
              THEN length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / len(toks)
              ELSE 0.0 END AS mean_wl,
         len(list_filter(ltoks, x -> list_contains(['the','and','of','to','is'], x))) AS h_en,
         len(list_filter(ltoks, x -> list_contains(['el','la','de','que','y'], x))) AS h_es,
         len(list_filter(ltoks, x -> list_contains(['der','die','und','das','ist'], x))) AS h_de,
         len(list_filter(ltoks, x -> list_contains(['le','la','et','les','des'], x))) AS h_fr,
         list_reduce(list_transform(ltoks, x -> length(x) * 131 + ascii(x)),
                     (a, b) -> (a * 31 + b) % 1000003) % 1000003 AS fingerprint
  FROM t
)
SELECT doc_id,
       n_tokens,
       n_bpe_tokens,
       CAST(round(praw, 6) AS DOUBLE) AS punct_ratio,
       CAST(round(sraw, 6) AS DOUBLE) AS stopword_ratio,
       CAST(round(((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END)
             + (CASE WHEN praw < 0.2 THEN 1.0 ELSE 0.4 END)
             + (CASE WHEN mean_wl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS DOUBLE) AS quality,
       CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
            WHEN h_fr = greatest(h_en, h_es, h_de, h_fr) THEN 'fr'
            WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
            WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
            ELSE 'de' END AS pred_lang,
       fingerprint
FROM base
"""


def _sweep_metric_oracle_one(t: int) -> str:
    return f"""
WITH RECURSIVE
edges AS ({EDGES_SQL}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
act AS (SELECT src, dst FROM edges WHERE w_fp >= {t}),
und AS (SELECT src AS u, dst AS v FROM act UNION SELECT dst, src FROM act),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
),
comp AS (SELECT node AS record_id, MIN(r) AS cluster_a FROM reach GROUP BY node),
truth AS (
  -- explicit DISTINCT: inside a WITH RECURSIVE block DuckDB 1.0 treats
  -- a plain CTE's UNION like UNION ALL (observed), so dedup manually
  SELECT DISTINCT record_id, cluster_b FROM (
    SELECT CAST(s_suppkey AS BIGINT) AS record_id, CAST(s_nationkey AS BIGINT) AS cluster_b FROM supplier
    UNION ALL
    SELECT CAST({NATION_OFFSET} + s_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT) FROM supplier
  )
),
cells AS (
  SELECT cluster_a, cluster_b, COUNT(*) AS n
  FROM comp JOIN truth USING (record_id) GROUP BY 1, 2
),
ma AS (SELECT cluster_a, SUM(n) AS a_i FROM cells GROUP BY 1),
mb AS (SELECT cluster_b, SUM(n) AS b_j FROM cells GROUP BY 1),
tot AS (SELECT SUM(n) AS n_tot FROM cells),
en AS (
  SELECT c.cluster_a, c.cluster_b, c.n, ma.a_i, mb.b_j, tot.n_tot
  FROM cells c JOIN ma USING (cluster_a) JOIN mb USING (cluster_b) CROSS JOIN tot
),
sums AS (
  SELECT MAX(n_tot) AS n_tot,
         SUM(n * (n - 1) / 2.0) AS tp,
         SUM((n::DOUBLE / n_tot) * ln(n::DOUBLE * n_tot / (a_i * b_j))) AS mi
  FROM en
),
marga AS (
  SELECT SUM(a_i * (a_i - 1) / 2.0) AS pp,
         SUM(-(a_i::DOUBLE / n_tot) * ln(a_i::DOUBLE / n_tot)) AS h_a
  FROM (SELECT DISTINCT cluster_a, a_i, n_tot FROM en)
),
margb AS (
  SELECT SUM(b_j * (b_j - 1) / 2.0) AS ap,
         SUM(-(b_j::DOUBLE / n_tot) * ln(b_j::DOUBLE / n_tot)) AS h_b
  FROM (SELECT DISTINCT cluster_b, b_j, n_tot FROM en)
)
SELECT CAST({t} AS BIGINT) AS threshold_fp,
  CAST(round(CASE WHEN pp > 0 THEN tp / pp ELSE 0 END, 6) AS DOUBLE) AS precision,
  CAST(round(CASE WHEN ap > 0 THEN tp / ap ELSE 0 END, 6) AS DOUBLE) AS recall,
  CAST(round(CASE WHEN pp > 0 AND ap > 0 AND tp > 0
       THEN 2 * (tp / pp) * (tp / ap) / (tp / pp + tp / ap) ELSE 0 END, 6) AS DOUBLE) AS f1,
  CAST(round((tp - pp * ap / (n_tot * (n_tot - 1) / 2.0))
       / ((pp + ap) / 2.0 - pp * ap / (n_tot * (n_tot - 1) / 2.0)), 6) AS DOUBLE) AS ari,
  CAST(round(CASE WHEN h_a + h_b > 0 THEN 2 * mi / (h_a + h_b) ELSE 1 END, 6) AS DOUBLE) AS nmi
FROM sums CROSS JOIN marga CROSS JOIN margb
"""


_SWEEP_METRICS_ORACLE = " UNION ALL ".join(
    f"SELECT * FROM ({_sweep_metric_oracle_one(t)})" for t in SWEEP_FPS
)


def _pair_sweep_oracle_one(ta: int, tb: int) -> str:
    """One (t_a, t_b) grid point from first principles: recursive-CTE
    connected components of BOTH weighted edge sets, then the same
    contingency metric algebra as _sweep_metric_oracle_one."""
    return f"""
WITH RECURSIVE
edges_a AS ({EDGES_SQL}),
edges_b AS (
  SELECT s_suppkey AS src,
         {NATION_OFFSET} + s_nationkey AS dst,
         CAST((s_suppkey * 73) % 101 AS BIGINT) * 10000 AS w_fp
  FROM supplier
),
nodes AS (SELECT src AS node FROM edges_a UNION SELECT dst FROM edges_a),
act_a AS (SELECT src, dst FROM edges_a WHERE w_fp >= {ta}),
und_a AS (SELECT src AS u, dst AS v FROM act_a UNION SELECT dst, src FROM act_a),
reach_a(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach_a.node, und_a.v FROM reach_a JOIN und_a ON und_a.u = reach_a.r
),
comp_a AS (SELECT node AS record_id, MIN(r) AS cluster_a FROM reach_a GROUP BY node),
act_b AS (SELECT src, dst FROM edges_b WHERE w_fp >= {tb}),
und_b AS (SELECT src AS u, dst AS v FROM act_b UNION SELECT dst, src FROM act_b),
reach_b(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach_b.node, und_b.v FROM reach_b JOIN und_b ON und_b.u = reach_b.r
),
comp_b AS (SELECT node AS record_id, MIN(r) AS cluster_b FROM reach_b GROUP BY node),
cells AS (
  SELECT cluster_a, cluster_b, COUNT(*) AS n
  FROM comp_a JOIN comp_b USING (record_id) GROUP BY 1, 2
),
ma AS (SELECT cluster_a, SUM(n) AS a_i FROM cells GROUP BY 1),
mb AS (SELECT cluster_b, SUM(n) AS b_j FROM cells GROUP BY 1),
tot AS (SELECT SUM(n) AS n_tot FROM cells),
en AS (
  SELECT c.cluster_a, c.cluster_b, c.n, ma.a_i, mb.b_j, tot.n_tot
  FROM cells c JOIN ma USING (cluster_a) JOIN mb USING (cluster_b) CROSS JOIN tot
),
sums AS (
  SELECT MAX(n_tot) AS n_tot,
         SUM(n * (n - 1) / 2.0) AS tp,
         SUM((n::DOUBLE / n_tot) * ln(n::DOUBLE * n_tot / (a_i * b_j))) AS mi
  FROM en
),
marga AS (
  SELECT SUM(a_i * (a_i - 1) / 2.0) AS pp,
         SUM(-(a_i::DOUBLE / n_tot) * ln(a_i::DOUBLE / n_tot)) AS h_a
  FROM (SELECT DISTINCT cluster_a, a_i, n_tot FROM en)
),
margb AS (
  SELECT SUM(b_j * (b_j - 1) / 2.0) AS ap,
         SUM(-(b_j::DOUBLE / n_tot) * ln(b_j::DOUBLE / n_tot)) AS h_b
  FROM (SELECT DISTINCT cluster_b, b_j, n_tot FROM en)
)
SELECT CAST({ta} AS BIGINT) AS threshold_a,
  CAST({tb} AS BIGINT) AS threshold_b,
  CAST(round(CASE WHEN pp > 0 THEN tp / pp ELSE 0 END, 6) AS DOUBLE) AS precision,
  CAST(round(CASE WHEN ap > 0 THEN tp / ap ELSE 0 END, 6) AS DOUBLE) AS recall,
  CAST(round(CASE WHEN pp > 0 AND ap > 0 AND tp > 0
       THEN 2 * (tp / pp) * (tp / ap) / (tp / pp + tp / ap) ELSE 0 END, 6) AS DOUBLE) AS f1,
  CAST(round((tp - pp * ap / (n_tot * (n_tot - 1) / 2.0))
       / ((pp + ap) / 2.0 - pp * ap / (n_tot * (n_tot - 1) / 2.0)), 6) AS DOUBLE) AS ari,
  CAST(round(CASE WHEN h_a + h_b > 0 THEN 2 * mi / (h_a + h_b) ELSE 1 END, 6) AS DOUBLE) AS nmi
FROM sums CROSS JOIN marga CROSS JOIN margb
"""


_PAIR_SWEEP_ORACLE = " UNION ALL ".join(
    f"SELECT * FROM ({_pair_sweep_oracle_one(ta, tb)})"
    for ta in PAIR_GRID_A
    for tb in PAIR_GRID_B
)


# ---------------------------------------------------------------------------
# flagship entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-rule record-linkage pipeline on sf0.001
    events-as-transcripts — collapse, block (signature + LSH), score,
    cluster — returning the cluster summary."""
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

    from pyspark.sql.window import Window

    e = _load(spark, "/root/testdata/sf0.001", "events")
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
    pairs = build_candidate_pairs(collapsed, max_block_size=64)
    scored = score_pairs(attach_pair_texts(pairs, collapsed))
    clusters = full_partition(collapsed, cluster_edges(scored, 0.5))
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_conversations"))
        .orderBy("cluster_id")
    )
