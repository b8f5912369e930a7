"""torspider_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch, Spark-first re-expression of the data-processing semantics of
the TorSpider reference crawler (see /root/reference, BSD-3). The reference is
a single-host multiprocessing crawler; this engine is an epoch-based BSP loop
of DataFrame jobs over snapshot-versioned tables of Common-Crawl-style pages:

    frontier scan -> politeness top-k per host -> "fetch" (join pages)
    -> status taxonomy -> change gate -> Arrow-UDF extraction
    -> link canonicalization -> URL-seen dedup -> frontier merge + metrics

Layout:
    weblib/     pure-Python exactness core (no Spark imports; byte-identical
                extraction semantics vs the reference, verified in tests)
    functions/  Spark column expressions + vectorized pandas/Arrow UDFs
    operators/  frontier, candidate selection, fetch-join, dedup, text ops
    sources/    synthetic corpus generator, snapshot warehouse, testdata
    plans/      the crawl epoch loop, stats queries, reference simulator
    streaming/  Structured Streaming variant of the epoch pipeline
"""

__version__ = "0.1.0"
