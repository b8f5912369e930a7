"""Deterministic sampling, shard routing, sequence packing, and
token-budget selection.

The last mile of a training-data pipeline after curation (quality gate ->
dedup -> language mix, see the curation_pipeline driver query): choose a
reproducible subset (global and per-stratum rates), route every kept doc to
a stable output shard, lay docs end-to-end into fixed-length token
sequences (the concat-and-chunk packing step before tokenizer sharding),
and cap the mix at a token budget by quality (select_token_budget).

Every decision here is a pure function of ``md5(key || ':' || salt)`` —
no RNG state, no ``rand()``:

- **Reproducible across runs, partitionings, and cluster sizes.** The
  sample/shard decision is a row-local projection, so the N- and
  4N-executor runs of the scaling criterion keep byte-identical subsets.
- **Zero shuffle for the decision itself.** Sampling is a pushable filter,
  sharding a projected column; only downstream aggregation shuffles.
- **Exactly replayable in ANSI SQL.** Both engines lowercase-hex md5, and
  equal-length hex strings compare lexicographically == numerically, so the
  DuckDB oracle reproduces the subset bit-for-bit (no float thresholds).

Packing uses the scalable two-phase prefix sum: per-bucket window cumsum
(bucket = leading hex digits of the order hash, so bucket order == global
hash order) plus a broadcast of the tiny per-bucket offset table — never a
single-partition global window over the corpus.

Reference scope note: TorSpider itself stops at dedup'd URL/page tables;
these operators cover the downstream export a 100-TB corpus consumer runs
on the crawl output (SURVEY.md §2 training-data addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from torspider_spark.operators.quality import tokens_col

_HEX15 = 16 ** 15  # 15 hex digits < 2^63: threshold math stays in int64


def threshold_hex(fraction: float) -> str:
    """fraction in [0, 1] -> 15-character keep threshold. Shared by the
    Spark operators and the DuckDB oracle strings so the two sides can
    never drift. fraction >= 1.0 returns 'g'*15 — lexicographically after
    every hex string, so `hash < threshold` keeps ALL rows, matching
    keep_col's lit(True) shortcut (a capped 'f'*15 would drop the
    16^-15-probability all-f prefix on the oracle side only)."""
    if fraction >= 1.0:
        return "g" * 15
    f = max(fraction, 0.0)
    return format(int(f * _HEX15), "015x")


def _token_count_col(text_col: str):
    """Whitespace token count — quality.tokens_col, the one tokenization
    convention shared with token_count and every oracle."""
    return F.size(tokens_col(F.col(text_col)))


def _bucket_offsets(d: DataFrame):
    """Phase 2 of the two-phase prefix sum: per-bucket token totals ->
    exclusive running offsets, ordered by _bucket. The unpartitioned
    window here is over the tiny bucket-totals frame (one row per
    bucket), never the corpus."""
    totals = d.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btot"))
    prior = Window.orderBy("_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(
        "_bucket",
        F.coalesce(F.sum("_btot").over(prior), F.lit(0)).alias("_boff"))


def hash_hex_col(key_col, salt: str = ""):
    """The decision hash: md5 of the stringified key + ':' + salt.
    Distinct salts give independent subsets off the same key."""
    return F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))


def keep_col(key_col, fraction: float, salt: str = ""):
    """Boolean keep-decision column: first 15 hex digits of the decision
    hash below the fraction threshold. Uniform because md5 is; exact
    string comparison, so Spark and any SQL engine agree bitwise."""
    if fraction <= 0.0:
        return F.lit(False)
    if fraction >= 1.0:
        return F.lit(True)
    return (F.substring(hash_hex_col(key_col, salt), 1, 15)
            < F.lit(threshold_hex(fraction)))


def hash_sample(docs: DataFrame, fraction: float, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep ~fraction of rows, chosen by
    key hash. Unlike df.sample(), membership is a property of the ROW, so
    it is stable under repartitioning, resume, and cluster resize, and a
    doc's fate can be audited after the fact."""
    return docs.filter(keep_col(F.col(key_col), fraction, salt))


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang",
                      default_fraction: float = 0.0,
                      key_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling — the language/source mix
    rebalancing step of a pretraining pipeline. ``fractions`` maps stratum
    value -> keep rate; unlisted strata get ``default_fraction``. One
    when-cascade over row-local hashes: still a pushable filter."""
    key = F.col(key_col)
    decision = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        kept = keep_col(key, frac, salt)
        decision = (F.when(cond, kept) if decision is None
                    else decision.when(cond, kept))
    if decision is None:
        return hash_sample(docs, default_fraction, key_col, salt)
    return docs.filter(
        decision.otherwise(keep_col(key, default_fraction, salt)))


def assign_shards(docs: DataFrame, n_shards: int = 1024,
                  key_col: str = "doc_id", salt: str = "",
                  shard_col: str = "shard_id") -> DataFrame:
    """Stable output-shard routing: shard = int(first 8 hex digits of the
    decision hash) mod n_shards. 8 hex digits < 2^32, so the conv result
    is a non-negative long on both engines and ``%`` agrees. Rows for one
    shard can then be written with partitionBy(shard_col) — a doc lands in
    the same shard no matter when or where it is (re)processed."""
    bucket = F.conv(F.substring(hash_hex_col(F.col(key_col), salt), 1, 8),
                    16, 10).cast("long")
    return docs.withColumn(shard_col, bucket % F.lit(n_shards))


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   text_col: str = "text", key_col: str = "doc_id",
                   bucket_hex_digits: int = 2, salt: str = "",
                   materialize: bool = True) -> DataFrame:
    """Concat-and-chunk sequence packing: order the corpus by decision
    hash (a deterministic global shuffle), lay token counts end to end,
    and report where each doc lands in the fixed-``seq_len`` chunk grid.

    Output columns: key, n_tokens (whitespace tokens, same convention as
    quality.token_count), seq_start (global token offset, exclusive prefix
    sum), first_chunk / n_chunks (the chunk span the doc occupies).

    100-TB shape: a naive ``Window.orderBy(hash)`` cumsum is a single
    ordered partition over the whole corpus — the classic driver-shaped
    bottleneck. Instead, phase 1 does the cumsum *within* hash-prefix
    buckets (``bucket_hex_digits`` leading hex chars — 256 buckets by
    default — each a normal shuffled window partition), and phase 2
    prefix-sums the 256-row per-bucket totals (trivial single-partition
    window over a tiny frame) and broadcast-joins the offsets back. The
    bucket is a PREFIX of the order hash, so (bucket, hash) order ==
    global hash order and the two-phase sum equals the global cumsum
    exactly.

    Both phases consume the same narrow (key, hash, bucket, n_tokens)
    projection; with ``materialize`` (default, the graphdedup pattern)
    that frame is localCheckpointed so the text column is scanned and
    tokenized ONCE — without it Catalyst plans two full reads of the
    corpus, one per branch (visible in BENCH/PLANS.md)."""
    h = hash_hex_col(F.col(key_col), salt)
    d = (docs.select(key_col,
                     h.alias("_h"),
                     F.substring(h, 1, bucket_hex_digits).alias("_bucket"),
                     _token_count_col(text_col).cast("long")
                     .alias("n_tokens")))
    if materialize:
        d = d.localCheckpoint(eager=False)

    intra = Window.partitionBy("_bucket").orderBy("_h", key_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    d = d.withColumn("_intra", F.coalesce(F.sum("n_tokens").over(intra),
                                          F.lit(0)))

    offsets = _bucket_offsets(d)

    seq_start = (F.col("_boff") + F.col("_intra")).alias("seq_start")
    first_chunk = F.floor(F.col("seq_start") / seq_len).cast("long")
    last_chunk = F.floor(
        (F.col("seq_start") + F.col("n_tokens") - 1) / seq_len).cast("long")
    return (d.join(F.broadcast(offsets), "_bucket")
            .select(key_col, "n_tokens", seq_start)
            .withColumn("first_chunk", first_chunk)
            .withColumn("n_chunks", last_chunk - F.col("first_chunk") + 1))


def select_token_budget(docs: DataFrame, token_budget: int,
                        score_col: str = "quality_score",
                        text_col: str = "text", key_col: str = "doc_id",
                        score_buckets: int = 1024) -> DataFrame:
    """Best-first selection under a token budget: order the corpus by
    quality (descending) and keep documents until ``token_budget`` tokens
    are filled — the data-mixing step that turns "score everything" into
    "this is the training set".

    Ordering is by the e6-INTEGERIZED score (floor(score*1e6 + 0.5), the
    same discipline the curation oracles use) with the key as tie-break,
    so it is total and engine-independent — no float comparison decides a
    row's fate. A row is kept iff the tokens strictly before it are under
    budget (exclusive prefix), so the boundary document is included:
    output token mass is the smallest prefix >= budget.

    Scale shape: same two-phase prefix sum as pack_sequences, but bucketed
    by inverted score band (monotone in the order key, so (bucket asc,
    score desc, key) == global score-desc order), with one extra trick the
    packing case can't use — per-bucket totals are known BEFORE any
    row-level work, so every bucket whose global offset already exceeds
    the budget is pruned before the window: the row-level sort only ever
    touches roughly budget-many tokens of rows, however large the scored
    corpus is. Output: key, score_e6, n_tokens, cum_before (kept rows
    only)."""
    score_e6 = F.floor(F.col(score_col) * 1000000 + F.lit(0.5)).cast("long")
    band = F.floor(score_e6 * score_buckets / 1000001).cast("int")
    d = docs.select(key_col,
                    score_e6.alias("score_e6"),
                    (F.lit(score_buckets - 1) - band).alias("_bucket"),
                    _token_count_col(text_col).cast("long")
                    .alias("n_tokens"))
    d = d.localCheckpoint(eager=False)

    offsets = _bucket_offsets(d) \
        .filter(F.col("_boff") < token_budget)    # bucket-level pruning

    intra = Window.partitionBy("_bucket") \
        .orderBy(F.col("score_e6").desc(), key_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (d.join(F.broadcast(offsets), "_bucket")
            .withColumn("cum_before",
                        F.col("_boff") + F.coalesce(
                            F.sum("n_tokens").over(intra), F.lit(0)))
            .filter(F.col("cum_before") < token_budget)
            .select(key_col, "score_e6", "n_tokens", "cum_before"))


def write_training_shards(docs: DataFrame, path: str, n_shards: int = 1024,
                          key_col: str = "doc_id", salt: str = "",
                          fmt: str = "parquet") -> None:
    """Deterministic sharded export: route every row with assign_shards,
    co-locate each shard with one repartition on the shard key, and write
    ``partitionBy(shard_id)`` — one directory and (normally) one file per
    shard, so a training loader can address shard K directly and a
    re-export of any doc subset lands in the same directories.

    The repartition is the operator's ONE shuffle and exists so each
    shard is a single task's output (without it every task appends a
    file to every shard directory — n_tasks x n_shards small files, the
    classic partitionBy explosion). Size n_shards so a shard's rows fit
    one task comfortably at the target corpus scale."""
    sharded = assign_shards(docs, n_shards, key_col, salt)
    (sharded.repartition(n_shards, "shard_id")
     .write.mode("overwrite").partitionBy("shard_id")
     .format(fmt).save(path))
