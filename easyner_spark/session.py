"""SparkSession factory for the engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~ cores (not 200), AQE on (runtime coalesce + skew-join),
Arrow on for the pandas-UDF hot paths, UTC session timezone so results
compare cleanly against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "easyner_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    all cores). On a real cluster the caller passes master/conf via
    spark-submit and this function only layers the SQL configs.
    """
    if master is None:
        # under spark-submit the JVM gateway already exists and exports
        # PYSPARK_GATEWAY_PORT to the python driver — respect the
        # submit-provided master (never override the cluster manager
        # from library code). NOTE: SparkConf().contains("spark.master")
        # is NOT a usable signal here — before the first SparkContext
        # the python-side conf is an empty dict. Standalone library use
        # falls back to local mode.
        if "PYSPARK_GATEWAY_PORT" not in os.environ:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size ~= the reference's sentence_batch_size=500
        # (reference: scripts/ner_spacy.py:140-141) but larger because our
        # UDFs are vectorized over the whole batch, not per-sentence.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
