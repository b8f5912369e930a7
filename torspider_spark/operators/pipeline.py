"""The per-epoch scan pipeline: fetch-join, taxonomy, change gate, extract.

One epoch re-expresses the reference's per-URL crawl iteration
(/root/reference/TorSpider.py:105-417) as a columnar dataflow:

    candidates ⋈ pages_meta            (HEAD, TorSpider.py:179)
      -> status taxonomy (B1) + content gate (B2)
      -> good slice ⋈ pages            (GET, TorSpider.py:252 — body columns
                                        touched ONLY for the good slice:
                                        the HEAD-before-GET projection
                                        discipline, SURVEY.md §4)
      -> sha1 change gate (B4, JVM-side F.sha1)
      -> one-pass Arrow extraction (C1/C3/C4) on changed rows
      -> redirect resolution (C2) / scheme fan-out (C7) on the other slices

Join strategy is left to Catalyst+AQE: per-epoch candidate sets are usually
far smaller than the pages corpus, so AQE converts the fetch join to a
broadcast join at runtime; at larger candidate volumes it falls back to a
shuffle join that bucketed storage would co-locate on a real deployment.

Output is the *internal* result frame — scan_results columns plus the
frontier bookkeeping (url_hash, depth, tries, silent, posted) that the
state merge (E3) needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.functions import taxonomy as tax
from torspider_spark.functions.udfs import (
    extract_page,
    merge_redirect,
    onion_url_filter,
    scheme_fanout_udf,
)

def _empty_str_array():
    return F.array().cast("array<string>")

# Internal result projection shared by both branches.
_RESULT_COLS = [
    "url", "url_hash", "host", "depth", "tries",
    "online", "fault", "title", "new_hash", "new_urls", "form_dicts",
    "redirect", "silent", "posted",
]


def classify(candidates: DataFrame, pages_meta: DataFrame) -> DataFrame:
    """Header fetch + status taxonomy: candidates left-joined to fetch
    metadata (a missing row IS a connection error) and classified."""
    meta = pages_meta.select(
        "url", "status", "content_type", "redirect_location", "error_kind")
    fetched = candidates.join(meta, "url", "left")
    return (
        fetched
        .withColumn("status_class",
                    tax.status_class(F.col("status"), F.col("error_kind")))
        .withColumn("ctype_class", tax.content_class(F.col("content_type")))
    )


def _good_text_predicate():
    # Online + plaintext (or unknown type, which the reference re-checks on
    # the GET and then proceeds when still unknown — TorSpider.py:242-266;
    # in the corpus the GET sees the same header, so unknown => proceed).
    return (F.col("status_class") == tax.CLS_GOOD) & (
        F.col("ctype_class").isNull() | (F.col("ctype_class") == "text")
    )


def scan_good_pages(classified: DataFrame, pages: DataFrame,
                    broadcast_candidates: bool = True) -> DataFrame:
    """Body path: fetch bodies for the good/text slice, hash-gate, extract.

    Join shape matters enormously here: the page store is the 100 TB table,
    so it must be STREAMED, never shuffled and never sorted. The epoch's
    good slice (bounded by host_budget x hosts) is broadcast as the build
    side of an inner join against the pages scan — each pages partition
    filters itself map-side. A left join from candidates would instead make
    Catalyst shuffle+sort the whole page store every epoch (observed: 60 s
    per epoch on a 4.6 GB corpus — catastrophic at real scale).

    Candidates whose body row is missing surface via a key-only anti-join
    (reads just pages.url — column-pruned) and post the reference's
    GET-connection-error result: online was already set True at HEAD time
    (TorSpider.py:236-237), the handler posts the record as-is
    (TorSpider.py:362-373). With ``broadcast_candidates=False`` both joins
    fall back to AQE (bucketed-storage co-location on a real deployment).

    r7 note: a "single pages pass" variant that lazily checkpointed the
    fetch join's output (bodies included) and anti-joined against its
    urls was tried and REVERTED: at scaling volume (~380k candidates ×
    page bytes per epoch) the cached body slice is 1-2 GB of storage
    pressure per epoch and the local[4] crawl wall regressed ~1.8×,
    while the pass it saves is a cheap column-pruned scan of pages.url.
    """
    good = classified.filter(_good_text_predicate())
    build = F.broadcast(good) if broadcast_candidates else good
    keyed = pages.select("url", "html", "text")
    body = keyed.join(build, "url", "inner")
    bodyless = good.join(keyed.select("url"), "url", "left_anti")
    body = body.withColumn("page_hash", F.sha1(F.col("html")))
    # B4 change gate — computed JVM-side BEFORE the Arrow UDF so unchanged
    # pages skip link/form work (the reference's single biggest CPU saver,
    # TorSpider.py:287-301). Initial last_hash is '' (TorSpider.py:133-134).
    body = body.withColumn(
        "changed",
        F.col("html").isNotNull()
        & (F.coalesce(F.col("last_hash"), F.lit("")) != F.col("page_hash")),
    )
    body = body.withColumn(
        "ext", extract_page(F.col("text"), F.col("url"), F.col("changed")))
    scanned = body.select(
        "url", "url_hash", "host", "depth", "tries",
        F.lit(True).alias("online"),  # TorSpider.py:236-237
        F.lit(None).cast("string").alias("fault"),
        F.when(F.col("html").isNotNull(), F.col("ext.title")).alias("title"),
        F.when(F.col("changed"), F.col("page_hash")).alias("new_hash"),
        # Crawl-loop whole-string onion gate over canonical links
        # (TorSpider.py:311-314) — JVM-side array filter.
        F.when(F.col("changed"),
               F.filter(F.col("ext.links"), onion_url_filter))
        .otherwise(_empty_str_array()).alias("new_urls"),
        F.when(F.col("changed"), F.col("ext.forms"))
        .otherwise(_empty_str_array()).alias("form_dicts"),
        F.lit(None).cast("string").alias("redirect"),
        F.lit(False).alias("silent"),
        # A parse crash posts nothing (reference worker dies mid-page,
        # TorSpider.py:410-413) — row excluded from results AND stays
        # retryable in the frontier.
        (~F.coalesce(F.col("ext.crashed"), F.lit(False))).alias("posted"),
    )
    no_body = bodyless.select(
        "url", "url_hash", "host", "depth", "tries",
        F.lit(True).alias("online"),
        F.lit(None).cast("string").alias("fault"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("new_hash"),
        _empty_str_array().alias("new_urls"),
        _empty_str_array().alias("form_dicts"),
        F.lit(None).cast("string").alias("redirect"),
        F.lit(False).alias("silent"),
        F.lit(True).alias("posted"),
    )
    return scanned.unionByName(no_body)


def scan_rest(classified: DataFrame) -> DataFrame:
    """Header-only path: redirects, faults, no-faults, unknowns, non-text
    types, transport errors. No body columns are ever read here."""
    rest = classified.filter(~_good_text_predicate())
    cls = F.col("status_class")
    is_redirect = cls == tax.CLS_REDIRECT

    merged = F.when(
        is_redirect & F.col("redirect_location").isNotNull(),
        merge_redirect(F.col("redirect_location"), F.col("url")),
    )
    fault = F.when(
        (cls == tax.CLS_GOOD)
        & F.col("ctype_class").isNotNull()
        & (F.col("ctype_class") != "text"),
        F.concat(F.lit("type: "), F.col("ctype_class")),  # TorSpider.py:247
    ).otherwise(
        tax.status_fault(cls, F.col("status"), F.col("error_kind")))

    new_urls = (
        F.when(is_redirect & merged.isNotNull() & onion_url_filter(merged),
               F.array(merged))  # TorSpider.py:193-196
        .when(cls == tax.CLS_ERROR_PREFIX + "invalid_schema",
              scheme_fanout_udf(F.col("url")))  # TorSpider.py:341-353
        .otherwise(_empty_str_array())
    )

    return rest.select(
        "url", "url_hash", "host", "depth", "tries",
        (cls == tax.CLS_GOOD).alias("online"),  # good-but-nontext: online
        fault.alias("fault"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("new_hash"),
        new_urls.alias("new_urls"),
        _empty_str_array().alias("form_dicts"),
        merged.alias("redirect"),  # set even for non-onion targets
        tax.is_silent(cls).alias("silent"),
        (~tax.is_silent(cls)).alias("posted"),
    )


def run_scan(candidates: DataFrame, pages_meta: DataFrame, pages: DataFrame,
             cfg: CrawlConfig) -> DataFrame:
    """Full scan of one epoch's candidates -> internal result frame."""
    classified = classify(candidates, pages_meta)
    return scan_good_pages(classified, pages).unionByName(scan_rest(classified))


def to_scan_results(internal: DataFrame, epoch: int,
                    cfg: CrawlConfig) -> DataFrame:
    """Project the internal frame onto the SpiderURL record (SCAN_RESULTS
    schema): only posted rows; scan_date is config-injected (the reference's
    date.today() at classes.py:10 is nondeterministic); last_node is the
    epoch tag (worker names don't exist in a BSP engine — D5)."""
    return (
        internal.filter(F.col("posted"))
        .select(
            "url",
            F.lit(cfg.scan_date).alias("scan_date"),
            F.concat(F.lit("epoch-"), F.lit(epoch)).alias("last_node"),
            "new_urls",
            "fault",
            "online",
            "title",
            "form_dicts",
            F.col("new_hash").alias("hash"),
            "redirect",
            F.lit(epoch).alias("epoch"),
            "host",
        )
    )
