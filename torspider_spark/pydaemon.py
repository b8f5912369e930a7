"""Pre-warmed PySpark worker daemon (``spark.python.daemon.module``).

PySpark forks every Python worker from a long-lived daemon process
(``pyspark.daemon``); forked children inherit the daemon's imported
modules copy-on-write. The stock daemon imports almost nothing, so every
*fresh* worker pays the full ``pandas`` + ``pyarrow`` + ``numpy`` import
chain (~1 s of CPU each) before its first Arrow batch — with a 32-slot
local master and chained mapInPandas stages that is up to 64 cold
imports racing for the same cores the first time a query crosses the
Python boundary (measured: the first Arrow-UDF query after a run of
JVM-only queries costs 10-15 s extra wall for spawn+imports alone).

Importing the heavy modules HERE, once, in the daemon turns each worker
fork into a copy-on-write no-op: children see the warm module cache.
This is the documented extension point (SPARK-?"spark.python.daemon.module"
config in python/pyspark/daemon-related docs) — the daemon's protocol
behaviour is unchanged; we only pre-populate ``sys.modules`` before
handing control to the stock ``pyspark.daemon`` manager loop.

Every import is best-effort: a missing optional module must never take
down the worker factory (worker creation failure is fatal to the job).
"""

from __future__ import annotations


def _prewarm() -> None:
    try:  # the Arrow-UDF serialization stack (every mapInPandas worker)
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyspark.sql.pandas.serializers  # noqa: F401
        import pyspark.worker  # noqa: F401
    except Exception:
        pass
    try:  # engine kernels used inside Arrow batches (cheap, numpy-based)
        import torspider_spark.weblib.gifcodec  # noqa: F401
        import torspider_spark.weblib.jpegcodec  # noqa: F401
        import torspider_spark.weblib.mediagen  # noqa: F401
        import torspider_spark.weblib.pngcodec  # noqa: F401
        import torspider_spark.weblib.wavcodec  # noqa: F401
    except Exception:
        pass


_prewarm()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
