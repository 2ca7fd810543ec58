"""SparkSession factory.

The reference opens one SQLite connection per script
(`DatabaseCreation.R:11`, `Openness_Data_Frame_Prep.R:5`) and relies on
a single R/Python process for execution. Here a single SparkSession is
the engine: AQE re-plans at runtime (replacing the reference's manual
50k-row chunking, `radius_model.R:216`), Arrow feeds the pandas-UDF
kernels, and UTC session time keeps timestamp semantics engine-neutral.

Scale notes (local[32] test rig → 1000-executor target):
- shuffle partitions default to cpu count locally; at cluster scale AQE
  coalesces from a high initial number, so we set the initial number
  generously and let AQE shrink it.
- autoBroadcastJoinThreshold raised to 64 MB: every dimension table in
  both the BDB star schema (plays 16k rows, players 1.7k —
  `DefCoverage.ipynb` cell 0) and the synthetic TPC-H-ish schema is far
  below this, so fact⋈dim never shuffles the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "bigdatabowl2024_25_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    conf = {
        # local mode: driver == all 32 executor threads in ONE JVM.
        # Spark's 1g default heap is sized for a driver that only
        # coordinates; here it also holds every task + cached
        # boundary of a composed pipeline, and 32 concurrent tasks
        # in 1g GC-thrash into OOM (observed on pipelines/corpus at
        # sf0.1). Applies only when this factory launches the JVM —
        # a cluster deployment sizes executors via spark-submit.
        "spark.driver.memory": os.environ.get("BDB_DRIVER_MEM", "8g"),
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.ui.enabled": os.environ.get("BDB_SPARK_UI", "false"),
    }
    if extra_conf:
        conf.update(extra_conf)
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
