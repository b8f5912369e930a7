"""HTTP status / transport-error taxonomy as Catalyst column expressions.

The reference's per-row if/elif ladder (/root/reference/TorSpider.py:156-234)
and exception handlers (TorSpider.py:334-413) become ONE whole-stage-codegen
`F.when` cascade over the joined fetch metadata — no Python in the hot path.
Fault strings are part of result equality (SURVEY.md §2.I) and are produced
byte-identically here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Status-code sets (TorSpider.py:156-172). Frozen; same literals.
REDIRECT_CODES = [301, 302, 303, 307, 308]
FAULT_CODES = [400, 401, 403, 404, 405, 406, 410, 413, 414, 444, 451, 495,
               496, 500, 501, 502, 505, 508, 511]
NO_FAULT_CODES = [408, 421, 423, 429, 503, 504]
GOOD_CODES = [200, 201]

# Transport-error -> fault-string map (TorSpider.py:334-404).
ERROR_FAULTS = {
    "invalid_url": "invalid url",        # TorSpider.py:334-339
    "invalid_schema": "invalid schema",  # TorSpider.py:341-353
    "ssl": "Bad SSL",                    # TorSpider.py:355-360
    "too_many_redirects": "redirect",    # TorSpider.py:387-391
    "memory": "memory error",            # TorSpider.py:399-404
}
# Result posted with fault=None, online=False (TorSpider.py:362-385).
RETRY_ERRORS = ("conn", "timeout")
# No result posted at all; URL stays pending (TorSpider.py:393-397,406-408).
SILENT_ERRORS = ("chunked", "notimpl")

# status_class values.
CLS_REDIRECT = "redirect"
CLS_FAULT = "fault"
CLS_NOFAULT = "nofault"
CLS_GOOD = "good"
CLS_UNKNOWN = "unknown"
CLS_ERROR_PREFIX = "error:"


def status_class(status: Column, error_kind: Column) -> Column:
    """Classify one fetch outcome.

    A transport error preempts the status ladder (in the reference the
    exception fires at HEAD time, before any status handling); a missing
    meta row (null status, no error) is a connection error — the simulated
    web has no such server (SURVEY.md §1.2 'absent row <=> connection
    error')."""
    return (
        F.when(error_kind.isNotNull(), F.concat(F.lit(CLS_ERROR_PREFIX), error_kind))
        .when(status.isNull(), F.lit(CLS_ERROR_PREFIX + "conn"))
        .when(status.isin(REDIRECT_CODES), F.lit(CLS_REDIRECT))
        .when(status.isin(FAULT_CODES), F.lit(CLS_FAULT))
        .when(status.isin(NO_FAULT_CODES), F.lit(CLS_NOFAULT))
        .when(status.isin(GOOD_CODES), F.lit(CLS_GOOD))
        .otherwise(F.lit(CLS_UNKNOWN))
    )


def content_class(content_type: Column) -> Column:
    """Main media type: part before '/' (get_type, functions.py:87-92)."""
    return F.when(content_type.isNotNull(),
                  F.split(content_type, "/").getItem(0))


def is_silent(cls: Column) -> Column:
    """Rows that post no result and silently stay pending."""
    return cls.isin([CLS_ERROR_PREFIX + e for e in SILENT_ERRORS])


def status_fault(cls: Column, status: Column, error_kind: Column) -> Column:
    """The fault string for non-body outcomes (body-path faults — the
    content-type gate — are added in the pipeline where ctype is known).

    Parity: fault = str(status) for redirect/fault/unknown
    (TorSpider.py:186,211,231); the error map above for transport errors;
    null for nofault/good/conn/timeout."""
    err = error_kind
    col = F.when(cls.isin([CLS_REDIRECT, CLS_FAULT, CLS_UNKNOWN]),
                 status.cast("string"))
    for kind, fault in ERROR_FAULTS.items():
        col = col.when(err == kind, F.lit(fault))
    return col  # otherwise null
