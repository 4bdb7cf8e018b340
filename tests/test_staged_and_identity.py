"""Round-3 surface: staged resolution (C5), membership predicates
(P5), attr-identity assimilation, frame-store attrs round-trip,
duplicate-row auto keys, and the simhash hot-band cap."""

from __future__ import annotations

from pyspark.sql import functions as F


# -- C5 staged resolution ---------------------------------------------------


def test_staged_resolution_composes_partitions(spark):
    from entityframe_spark.operators.staged import (
        link_entities_exact,
        staged_collection,
    )

    # two sources: records 0-2 (source A, two entities {0,1} and {2}),
    # records 10-12 (source B, entities {10,11} and {12})
    mem = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (10, 10), (11, 10), (12, 12)],
        "record_id long, cluster_id long",
    )
    keys = spark.createDataFrame(
        [(0, "acme"), (2, "zeta"), (10, "acme"), (12, "zeta")],
        "record_id long, link_key string",
    )
    cross = link_entities_exact(mem, keys, weight=0.7)
    coll = staged_collection(mem, cross)

    def parts(t):
        rows = coll.at(t).collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r["cluster_id"], set()).add(r["record_id"])
        return {frozenset(v) for v in out.values()}

    # above the cross weight: stage-1 entities intact
    assert parts(1.0) == {
        frozenset({0, 1}),
        frozenset({2}),
        frozenset({10, 11}),
        frozenset({12}),
    }
    # at the cross weight: entities link across sources
    assert parts(0.7) == {frozenset({0, 1, 10, 11}), frozenset({2, 12})}


def test_staged_star_equals_reference_pair_expansion(spark):
    """The O(n) star expansion must produce the same partition as the
    reference's O(n^2) all-pairs expansion (algorithms.md:188-210)."""
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.staged import staged_collection

    mem = spark.createDataFrame(
        [(3, 3), (7, 3), (5, 3), (9, 9)], "record_id long, cluster_id long"
    )
    empty_cross = spark.createDataFrame(
        [], "src_cluster long, dst_cluster long, weight double"
    )
    star = staged_collection(mem, empty_cross)
    # all-pairs expansion of entity {3,5,7} at weight 1.0
    pairs = Collection.from_edges(
        spark, [("3", "5", 1.0), ("3", "7", 1.0), ("5", "7", 1.0)]
    )
    star_parts = {
        frozenset(x["record_id"] for x in star.at(1.0).collect() if x["cluster_id"] == c)
        for c in {r["cluster_id"] for r in star.at(1.0).collect()}
    }
    assert frozenset({3, 5, 7}) in star_parts
    assert frozenset({9}) in star_parts
    pair_sets = {
        frozenset(r["members"]) for r in pairs.entities(1.0).collect()
    }
    assert pair_sets == {frozenset({"3", "5", "7"})}


# -- P5 membership predicates ----------------------------------------------


def test_membership_predicates(spark):
    from entityframe_spark.operators.collection import Collection

    coll = Collection.from_edges(spark, [("a", "b", 0.9), ("c", "d", 0.6)])
    rid = {r["key"]: r["record_id"] for r in coll.records.collect()}
    assert coll.contains_record(rid["a"], 0.8)
    assert not coll.contains_record(10_000, 0.8)
    assert coll.find_entity_for_record(rid["a"], 0.8) == coll.find_entity_for_record(
        rid["b"], 0.8
    )
    assert coll.find_entity_for_record(rid["a"], 0.8) != coll.find_entity_for_record(
        rid["c"], 0.8
    )
    assert coll.find_entity_for_record(10_000, 0.8) is None


# -- attr-identity assimilation (S2 invariant under J2) ---------------------


def test_assimilate_preserves_attr_identity(spark):
    """Two records sharing (source, key) but differing in attrs are
    DIFFERENT records; assimilation must not conflate them nor drop
    the attrs columns (reference data_context.rs:47-78)."""
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame.from_records(
        "crm",
        [
            {"k": "1", "city": "paris"},
            {"k": "1", "city": "tokyo"},  # same key, different attrs
            {"k": "2", "city": "oslo"},
        ],
        key_column="k",
        attr_columns=["city"],
        spark=spark,
    )
    n_before = ef.records.count()
    assert n_before == 3  # attr identity keeps both k=1 records
    # assimilate an attr-less collection with an overlapping key: it
    # must NOT fan out onto both k=1 records (identity includes
    # attr_sig; attr-less records normalise to '{}')
    ef.add_collection(
        "links", Collection.from_edges(spark, [("1", "2", 0.9)], source="crm")
    )
    assert "attr_sig" in ef.records.columns
    # the frame gained exactly the two attr-less records ('{}' sig)
    assert ef.records.count() == 5
    sigs = {r["attr_sig"] for r in ef.records.collect()}
    assert "{}" in sigs and any(s != "{}" for s in sigs)
    # merge edges reference exactly 2 records (no fan-out duplication)
    me = ef.collections["links"].merge_edges.collect()
    assert len(me) == 1


# -- frame store: attrs round-trip ------------------------------------------


def test_frame_store_attrs_round_trip(spark, tmp_path):
    from entityframe_spark.io.frame_store import load_frame, save_frame
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame.from_records(
        "s",
        [{"k": "1", "a": "x"}, {"k": "1", "a": "y"}, {"k": "2", "a": "z"}],
        key_column="k",
        attr_columns=["a"],
        spark=spark,
    )
    # one real merge (all records in one cluster) so merge tables are
    # non-empty parquet
    mem = ef.records.select("record_id", F.lit(0).cast("long").alias("cluster_id"))
    ef.collections["ids"] = Collection.from_memberships(mem, ef.records)
    path = str(tmp_path / "frame")
    save_frame(ef, path)
    back = load_frame(spark, path)
    orig = {
        (r["source"], r["key"], r["attr_sig"]) for r in ef.records.collect()
    }
    got = {(r["source"], r["key"], r["attr_sig"]) for r in back.records.collect()}
    assert orig == got
    assert "attrs" in back.records.columns


# -- from_records auto keys keep duplicate rows distinct --------------------


def test_from_records_duplicate_rows_stay_distinct(spark):
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame.from_records(
        "dup", [{"name": "alice"}, {"name": "alice"}, {"name": "bob"}], spark=spark
    )
    assert ef.records.count() == 3


# -- simhash hot-band cap ---------------------------------------------------


def test_simhash_degenerate_corpus_bounded(spark):
    """500 identical docs share every band; without the hot-band cap
    the self-join emits ~125k pairs. With the cap (256) the bands are
    dropped and the query completes with zero candidates — same
    contract as minhash_lsh_candidates."""
    from entityframe_spark.pipeline.dedup import simhash_candidates

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate header lorem ipsum dolor sit amet").alias("text"),
    )
    assert simhash_candidates(docs).count() == 0
    # a small corpus below the cap still yields its candidates
    small = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate header lorem ipsum dolor sit amet").alias("text"),
    )
    assert simhash_candidates(small).count() == 190  # C(20,2): all pairs collide


def test_merges_affecting_record(spark):
    """P5 affects_record parity (merge_event.rs:36-40): every merge
    whose merging clusters contain the record, walked down the
    dendrogram chain."""
    from entityframe_spark.operators.collection import Collection

    # a-b at .9 ; (ab)-c at .8 ; d-e at .7 ; (abc)-(de) at .5
    coll = Collection.from_edges(
        spark,
        [("a", "b", 0.9), ("a", "c", 0.8), ("d", "e", 0.7), ("b", "d", 0.5)],
    )
    rid = {r["key"]: r["record_id"] for r in coll.records.collect()}
    # record e: absorbed into d's cluster at .7, then rides along into
    # the .5 mega-merge
    ev_e = coll.merges_affecting_record(rid["e"])
    assert [round(e["threshold"], 6) for e in ev_e] == [0.7, 0.5]
    assert ev_e[0]["absorbed"] is True  # e's own cluster was the child at .7
    # record a: rep survives a-b and a-c merges, then the .5 merge
    ev_a = coll.merges_affecting_record(rid["a"])
    assert [round(e["threshold"], 6) for e in ev_a] == [0.9, 0.8, 0.5]
    assert all(not e["absorbed"] for e in ev_a)
    # isolate-free record d: .7 merge + .5 merge
    ev_d = coll.merges_affecting_record(rid["d"])
    assert [round(e["threshold"], 6) for e in ev_d] == [0.7, 0.5]


def test_merges_affecting_record_nway(spark):
    """Equal-threshold n-way merges at the absorption threshold are
    all reported (one simultaneous event in reference semantics)."""
    from entityframe_spark.operators.collection import Collection

    coll = Collection.from_edges(
        spark, [("1", "2", 0.8), ("2", "3", 0.8), ("3", "4", 0.8)]
    )
    rid = {r["key"]: r["record_id"] for r in coll.records.collect()}
    for k in ("1", "2", "3", "4"):
        ev = coll.merges_affecting_record(rid[k])
        # every record sees all three merges of the single 0.8 event
        assert len(ev) == 3, (k, ev)
        assert {round(e["threshold"], 6) for e in ev} == {0.8}


def test_simhash_dedup_groups_end_to_end_low_entropy(spark):
    """VERDICT r3 item 8: dedup_groups over simhash_candidates on a
    low-entropy corpus of near-identical docs. 50 clusters x 10
    variants each: within a cluster the docs differ by one trailing
    token, so bands collide inside (10 <= cap) but the cross-cluster
    texts are distinct. Candidate count must stay bounded by the
    within-cluster pairs (no quadratic blow-up across 500 docs) and
    the folded groups must never span two source clusters."""
    from entityframe_spark.pipeline.dedup import dedup_groups, simhash_candidates

    docs = (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") / 10).cast("long").alias("cluster"),
            (F.col("id") % 10).alias("variant"),
        )
        .select(
            "doc_id",
            "cluster",
            F.concat(
                F.lit("shared boilerplate preamble common to every document "),
                F.lit("cluster token "),
                # cluster-distinct body repeated so it dominates the signature
                F.repeat(
                    F.concat(
                        F.lit("body"), F.col("cluster").cast("string"), F.lit(" ")
                    ),
                    12,
                ),
                F.lit("variant "),
                F.col("variant").cast("string"),
            ).alias("text"),
        )
    )
    cands = simhash_candidates(docs).localCheckpoint(eager=False)
    n_cands = cands.count()
    # within-cluster all-pairs is 50 * C(10,2) = 2250; allow a little
    # cross-cluster band noise but nothing near the 124750 all-pairs
    assert 0 < n_cands <= 4000, n_cands
    groups = dedup_groups(cands)
    joined = groups.join(docs.select("doc_id", "cluster"), "doc_id")
    spans = (
        joined.groupBy("group_id")
        .agg(F.countDistinct("cluster").alias("n_clusters"))
        .where(F.col("n_clusters") > 1)
        .count()
    )
    assert spans == 0
    # every group is within one cluster, so there are >= 50 docs' worth
    # of grouping only if bands actually collided; sanity: some folding
    assert groups.count() == joined.count()


def test_stage_runner_table_naming_round_trip():
    """Parquet-mode honesty check for the Iceberg seam (VERDICT r3
    item 7): _table() naming is deterministic and collision-free for
    distinct workdirs, so the writeTo path would address distinct
    tables when a catalog exists. No SparkSession needed — catalog
    probe short-circuits to parquet mode."""
    from entityframe_spark.pipeline.checkpoint import StageRunner

    r1 = StageRunner(None, "/tmp/ckpt/run_a", iceberg_catalog="cat")
    r2 = StageRunner(None, "/tmp/ckpt/run_b", iceberg_catalog="cat")
    assert r1.use_iceberg is False  # probe fails without a live catalog
    assert r1._table("collapse") == "cat.tmp_ckpt_run_a.collapse"
    assert r2._table("collapse") == "cat.tmp_ckpt_run_b.collapse"
    assert r1._table("collapse") != r2._table("collapse")
    assert r1._table("score") != r1._table("collapse")
