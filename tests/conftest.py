"""Shared SparkSession fixture for the test suite."""

from __future__ import annotations

import os

import pytest

from entityframe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="entityframe_spark_tests",
        cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def grid_sets(coll, thresholds, by_key=True):
    """{threshold: set of frozenset(cluster members)} in ~2 Spark actions
    — keeps the parity suite fast despite per-job overhead."""
    from entityframe_spark.core.quantize import threshold_to_fp

    keys = (
        {r["record_id"]: r["key"] for r in coll.records.collect()} if by_key else None
    )
    rows = coll.memberships_for_grid(list(thresholds)).collect()
    by_t: dict = {}
    for r in rows:
        m = keys[r["record_id"]] if by_key else r["record_id"]
        by_t.setdefault(r["threshold_fp"], {}).setdefault(r["cluster_id"], set()).add(m)
    return {
        t: {frozenset(v) for v in by_t.get(threshold_to_fp(t), {}).values()}
        for t in thresholds
    }


def clusters_as_sets(partition_df, records_df=None):
    """Partition DataFrame -> set of frozensets of keys (or record ids)."""
    rows = partition_df.collect()
    by_cluster: dict = {}
    if records_df is not None:
        keys = {r["record_id"]: r["key"] for r in records_df.collect()}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(keys[r["record_id"]])
    else:
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["record_id"])
    return {frozenset(v) for v in by_cluster.values()}
