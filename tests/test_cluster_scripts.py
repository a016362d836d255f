"""Cluster bring-up samples (scripts/): config parse + env plumbing.

No SLURM in this sandbox, so the sbatch itself cannot run — these pin
what CAN be checked: the shell scripts are syntactically valid bash,
the sample YAML interpolates through core.config.load_config into the
session_from_config shape, and get_session's $SPARK_MASTER fallback
(what the tracked master-url file feeds) actually reaches the builder.
Parity target: reference src/scripts/spark-utils/slurm/*.
"""

from __future__ import annotations

import os
import subprocess

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")


@pytest.mark.parametrize(
    "script",
    [
        "slurm/spark-cluster.sbatch",
        "slurm/spark-cluster-start.sh",
        "slurm/spark-cluster-stop.sh",
    ],
)
def test_shell_scripts_are_valid_bash(script):
    path = os.path.join(SCRIPTS, script)
    subprocess.run(["bash", "-n", path], check=True)


def test_cluster_config_interpolates_to_session_shape():
    from knetminer_etl_spark.core.config import load_config

    cfg = load_config(
        os.path.join(SCRIPTS, "cluster-config.yaml"),
        env={"SPARK_MASTER": "spark://head-node:7077"},
    )
    assert cfg["master"] == "spark://head-node:7077"
    assert cfg["app_name"] == "knetminer-etl-spark"
    # defaults applied for everything the environment didn't set
    assert cfg["conf"]["spark.executor.cores"] == 4
    assert cfg["conf"]["spark.knetminer.stagingDir"] == "/tmp/knetminer-staging"
    # the dict is exactly what session_from_config consumes
    assert set(cfg) == {"app_name", "master", "conf"}


def test_unset_master_without_default_raises():
    from knetminer_etl_spark.core.config import load_config

    with pytest.raises(KeyError, match="SPARK_MASTER"):
        load_config(os.path.join(SCRIPTS, "cluster-config.yaml"), env={})


def test_staging_dir_is_stable_per_app_and_cleaned_at_exit(spark, monkeypatch):
    """runtime.checkpoint.staging_dir: same (app, keys) → same path
    (repeat invocations overwrite, no per-call mkdtemp leak); local
    roots registered for interpreter-exit removal exactly once; a
    configured shared root is returned verbatim and never registered
    for local cleanup."""
    from knetminer_etl_spark.runtime import checkpoint as CK

    a = CK.staging_dir(spark, "stage-x", "k1")
    b = CK.staging_dir(spark, "stage-x", "k1")
    assert a == b and os.path.isdir(a)
    assert spark.sparkContext.applicationId in a
    root = a[: a.index(spark.sparkContext.applicationId)] + \
        spark.sparkContext.applicationId
    assert root in CK._STAGING_CLEANUP
    n_before = len(CK._STAGING_CLEANUP)
    CK.staging_dir(spark, "stage-y")
    assert len(CK._STAGING_CLEANUP) == n_before  # one hook per root

    spark.conf.set("spark.knetminer.stagingDir", "/shared/warehouse/tmp")
    try:
        shared = CK.staging_dir(spark, "stage-x", "k1")
        assert shared.startswith("/shared/warehouse/tmp")
        assert not any(r.startswith("/shared") for r in CK._STAGING_CLEANUP)
        assert not os.path.exists(shared)  # remote path: never mkdir'd locally
    finally:
        spark.conf.unset("spark.knetminer.stagingDir")


def test_spark_master_env_reaches_builder(monkeypatch):
    """Master resolution must pick up $SPARK_MASTER when no explicit
    master is passed — the contract the tracked master-url file relies
    on — and explicit values must win over the environment."""
    from knetminer_etl_spark.runtime.session import _resolve_master

    monkeypatch.setenv("SPARK_MASTER", "spark://head-node:7077")
    assert _resolve_master(None) == "spark://head-node:7077"
    assert _resolve_master("local[4]") == "local[4]"
    monkeypatch.delenv("SPARK_MASTER")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert _resolve_master(None) == "local[8]"
