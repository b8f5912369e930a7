"""SparkSession factory with the engine's physical-execution defaults.

Every knob here is a scale decision (SURVEY.md §4):
  - AQE on: runtime coalesce + skew-join split back up the explicit salting;
  - shuffle partitions ~ cores locally (2-4x total cores on a real cluster);
  - Arrow enabled and batch-capped so the HTML parser's peak memory stays
    bounded on pathological pages (the reference's MemoryError analogue,
    TorSpider.py:399-404);
  - UTC session timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _pydaemon_conf() -> dict:
    """Pre-warmed Python worker daemon (torspider_spark.pydaemon): forked
    workers inherit the daemon's imported pandas/pyarrow/numpy modules
    copy-on-write, so the first Arrow-boundary query of a session stops
    paying 32-64 concurrent cold imports (~10-15 s of serialized wall,
    measured — see OPTIMIZATION_r07.md §media). The daemon is launched
    with ``python -m``, which resolves imports from the worker's cwd plus
    PYTHONPATH — the repo root is appended explicitly so the module
    resolves regardless of the driver's cwd."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.pathsep.join(
        p for p in (os.environ.get("PYTHONPATH"), repo) if p)
    return {
        "spark.python.daemon.module": "torspider_spark.pydaemon",
        "spark.executorEnv.PYTHONPATH": pypath,
    }


def get_spark(
    app_name: str = "torspider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra_conf: dict | None = None,
    warm: bool = True,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions or int(os.environ.get(
        "SPARK_SHUFFLE_PARTITIONS", cores if cores.isdigit() else "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # zstd trades (scalable) CPU for (serial) disk bandwidth on the
        # per-epoch scan_results/frontier snapshot writes
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Commit algorithm v2: tasks move their outputs directly; the v1
        # job-commit's DRIVER-SIDE sequential rename of every output file
        # (64+ per bucketed write) is pure serial wall at any parallelism.
        # Safe here by construction: every warehouse write lands in a
        # private snap dir that only the atomic manifest swap publishes,
        # so v2's partial-visibility-on-failure caveat cannot surface.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm"
                ".version", "2")
    )
    for key, val in _pydaemon_conf().items():
        builder = builder.config(key, val)
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if warm:
        _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """One-time JIT/codegen warm-up of the execution paths every engine
    job uses: parquet write+scan, broadcast hash join, window, explode,
    hash aggregate, regexp, and the noop sink. Costs ~1 s at session
    creation and removes the 2-3 s of first-query-only JVM warm-up that
    otherwise lands on whichever query happens to run first (measured:
    an identical dim-join query runs 3.6 s cold, 0.85 s warm — guide §1's
    steady-state measurement discipline). No engine data is touched or
    cached: the warm-up computes over a throwaway 1k-row range table."""
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="spark_warm_")
    try:
        path = os.path.join(out, "w.parquet")
        (spark.range(1000)
         .select("id", F.concat(F.lit("w "), F.col("id").cast("string"))
                 .alias("s"))
         .write.mode("overwrite").parquet(path))
        df = spark.read.parquet(path)
        dim = df.limit(64).select(F.col("id").alias("k"))
        (df.join(F.broadcast(dim), df.id == dim.k, "left")
         .withColumn("rn", F.row_number().over(
             Window.partitionBy(F.pmod("id", F.lit(8))).orderBy("id")))
         .withColumn("t", F.explode(F.split("s", r"\s+")))
         .withColumn("r", F.regexp_replace("t", r"\d", "#"))
         .groupBy("r").agg(F.count("*").alias("n"), F.sum("id").alias("v"))
         .write.mode("overwrite").format("noop").save())
    except Exception:
        pass  # warm-up must never break session creation
    finally:
        shutil.rmtree(out, ignore_errors=True)
