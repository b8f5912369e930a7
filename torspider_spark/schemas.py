"""Fixed StructTypes for every engine table — no schema inference anywhere.

Data model mapping (SURVEY.md §1):
  pages         — the simulated web, exactly the BASELINE.json input_hint
                  shape (url, warc_ts, html binary, text, lang)
  pages_meta    — fetch-outcome simulation (status / content_type /
                  redirect_location / error_kind), FK url -> pages
  seeds         — the seed list (north_rule input)
  frontier      — engine-owned crawl state, keyed by url_hash
  scan_results  — the SpiderURL record (/root/reference/libs/classes.py:5-18)
                  as a typed row, one per scanned URL per epoch
  metrics       — per-epoch, per-partition lineage + crawl metrics
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

PAGES_META = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("redirect_location", T.StringType(), True),
        T.StructField("error_kind", T.StringType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

# Engine-owned frontier state (SURVEY.md §1.2; FIXTURES.md §4).
# states: pending | done | fault | dead | robots_blocked
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("last_hash", T.StringType(), False),
        T.StructField("tries", T.IntegerType(), False),
        T.StructField("added_epoch", T.IntegerType(), False),
        T.StructField("last_scan_epoch", T.IntegerType(), False),
        T.StructField("next_eligible_epoch", T.IntegerType(), False),
    ]
)

# The SpiderURL write-side record (classes.py:5-18 + the dynamic `redirect`
# attribute, TorSpider.py:149). `form_dicts` elements are the reference's
# exact JSON serialization of each form dict (see weblib.htmlparse); `epoch`
# and `host` are engine-side partitioning additions.
SCAN_RESULTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("scan_date", T.StringType(), False),
        T.StructField("last_node", T.StringType(), False),
        T.StructField("new_urls", T.ArrayType(T.StringType(), False), False),
        T.StructField("fault", T.StringType(), True),
        T.StructField("online", T.BooleanType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("form_dicts", T.ArrayType(T.StringType(), False), False),
        T.StructField("hash", T.StringType(), True),
        T.StructField("redirect", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# Structured log events — the reference's rotating per-process logger
# (/root/reference/libs/logging.py:16-64) re-expressed as a queryable
# warehouse table: (component, level, message) per epoch, committed with
# the metrics sink. `component` plays the role of the reference's
# current_process().name prefix.
EVENTS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("component", T.StringType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

def metrics_arrow():
    """pyarrow mirror of METRICS for driver-local commits
    (Warehouse.commit_local) — physical types match Spark's parquet
    output (INT32/INT64/UTF8) so mixed-writer tables read uniformly."""
    import pyarrow as pa

    return pa.schema([
        pa.field("epoch", pa.int32(), nullable=False),
        pa.field("partition_id", pa.int32(), nullable=False),
        pa.field("metric", pa.string(), nullable=False),
        pa.field("value", pa.int64(), nullable=False),
    ])


def events_arrow():
    """pyarrow mirror of EVENTS (see metrics_arrow)."""
    import pyarrow as pa

    return pa.schema([
        pa.field("epoch", pa.int32(), nullable=False),
        pa.field("component", pa.string(), nullable=False),
        pa.field("level", pa.string(), nullable=False),
        pa.field("message", pa.string(), nullable=False),
    ])


# Typed view of one parsed form (derived from the JSON strings on demand via
# F.from_json; map keys can't be null in Spark so unnamed fields surface as
# the JSON key "null" — the string form remains the exactness carrier).
FORM = T.StructType(
    [
        T.StructField("action", T.StringType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("target", T.StringType(), True),
        T.StructField("text_fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("radio_buttons", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("checkboxes", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("dropdowns", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("text_areas", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("dates", T.ArrayType(T.StringType()), True),
        T.StructField("datetimes", T.ArrayType(T.StringType()), True),
        T.StructField("months", T.ArrayType(T.StringType()), True),
        T.StructField("numbers", T.ArrayType(T.StringType()), True),
        T.StructField("ranges", T.ArrayType(T.StringType()), True),
        T.StructField("times", T.ArrayType(T.StringType()), True),
        T.StructField("weeks", T.ArrayType(T.StringType()), True),
    ]
)

# Output of the one-pass page-extraction UDF (functions/udfs.py).
EXTRACTED = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType(), False), True),
        T.StructField("forms", T.ArrayType(T.StringType(), False), True),
    ]
)
