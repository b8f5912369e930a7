"""Document deduplication suite for training-data pipelines.

All hot paths are Spark-native (codegen'd xxhash64 / array ops) — no Python
per row. Designed for the `documents(doc_id, text, lang, source, n_chars)`
table but parameterized on columns.

  exact        — md5 grouping (portable to the DuckDB oracle)
  minhash LSH  — word-shingle -> xxhash64 minhash signature -> banded
                 bucket join -> candidate pairs -> exact signature-overlap
                 estimate. The shuffle story at 100 TB: shingle explosion is
                 map-side (explode + partial min aggregation combines before
                 the shuffle); the band join shuffles only (band, band_hash)
                 keys, never text.
  simhash      — token hashing folded into a 64-bit majority vector via
                 map-side explode + bit-bucket aggregation, all JVM-side;
                 near-dup = identical 16-bit chunk (banding) + hamming check.
  n-gram jaccard — exact pairwise similarity via shingle co-occurrence
                 counts (used standalone or to verify LSH candidates).
  embedding cosine — see operators/similarity.py (near_duplicates_by_cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: md5(text) -> group size + keeper id."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document of each exact-duplicate group."""
    keepers = exact_duplicates(docs, text_col, id_col).select(
        F.col("keeper_id").alias(id_col))
    return docs.join(keepers, id_col, "left_semi")


def word_shingles(text_col: str, n: int = 3):
    """Array of word n-gram shingles (JVM-side: split + transform/slice)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) minhash signature per document.

    Permutation h_i(s) = xxhash64(i, shingle): seeding xxhash64 with the
    permutation index gives independent hash families, entirely codegen'd.
    The per-document min over shingles happens inside a single projection
    (transform + array_min over the shingle array) — zero explode, zero
    shuffle for the signature stage.

    NB the hash-family closure is built by a helper, NOT ``lambda s, i=i``:
    F.transform treats a two-parameter lambda as (element, index) and would
    overwrite the family seed with the shingle's array index, collapsing
    all ``num_hashes`` families into one (caught by the pure-Python xxh64
    oracle in plans/expected.py).
    """

    def _family(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    from torspider_spark.partitioning import ensure_min_partitions

    shingles = word_shingles(text_col, shingle_n)
    sig = F.array(*[
        F.array_min(F.transform(shingles, _family(i)))
        for i in range(num_hashes)
    ])
    # num_hashes hash families over every shingle is the heavy map work —
    # give a narrower-than-cluster input the parallelism floor first.
    return ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"), sig.alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4,
                        num_hashes: int | None = None,
                        max_bucket: int = 256,
                        pair_salt_buckets: int = 16) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair.

    Shuffles only (band_id, band_hash, doc_id); the self-join happens inside
    buckets, so no full cross join ever forms. Two expansion regimes:

    * buckets with <= ``max_bucket`` members: in-row pairwise expansion of
      the collected bucket (one task, bounded memory);
    * mega-buckets (boilerplate/empty docs that share a band hash by the
      millions at 100-TB scale): a salted pairwise self-join — the left side
      carries salt = xxhash64(doc_id) mod S, the right side is replicated
      across all S salt lanes, and the join key is (band_id, band_hash,
      salt). Each bucket's O(n^2) pair space is split across S tasks instead
      of one O(n^2) straggler row / collect_list OOM.

    ``num_hashes`` should be passed by callers that know it
    (minhash_near_duplicates does); the ``first()``-based inference is a
    guarded fallback only — it costs an extra Spark job and cannot see an
    empty input.
    """
    if num_hashes is None:
        row = signatures.select("sig").first()
        if row is None:  # empty input: no pairs, preserve the schema
            return (signatures.select(F.col("doc_id").alias("a"))
                    .withColumn("b", F.col("a")).filter(F.lit(False)))
        num_hashes = len(row["sig"])
    rows_per_band = num_hashes // bands
    banded = signatures.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    # Bucket sizes first (cheap count agg) so mega-buckets never reach
    # collect_list. One shuffle on (band_id, band_hash) shared by both paths.
    sized = banded.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band_id", "band_hash")))
    small = sized.filter(F.col("_n") <= max_bucket).drop("_n")
    big = sized.filter(F.col("_n") > max_bucket).drop("_n")

    grouped = small.groupBy("band_id", "band_hash").agg(
        F.sort_array(F.collect_list("doc_id")).alias("bucket"))
    small_pairs = grouped.filter(F.size("bucket") > 1).select(
        F.explode(
            F.flatten(F.transform(
                F.col("bucket"),
                lambda a, i: F.transform(
                    F.slice(F.col("bucket"), i + 2,
                            F.greatest(F.size("bucket") - i - 1, F.lit(0))),
                    lambda b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ))
        ).alias("p")
    ).select("p.a", "p.b")

    s = pair_salt_buckets
    left = big.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(s)))
    right = big.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(s)])))
    big_pairs = (
        left.alias("x")
        .join(right.alias("y"), ["band_id", "band_hash", "_salt"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    return small_pairs.unionByName(big_pairs).distinct()


def minhash_near_duplicates(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_hashes: int = 16,
                            bands: int = 4, shingle_n: int = 3,
                            threshold: float = 0.7) -> DataFrame:
    """Near-duplicate pairs with estimated jaccard >= threshold."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sigs, bands, num_hashes=num_hashes)
    a = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(a, "a").join(b, "b")
    est = (
        F.size(F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq))
        / F.lit(float(num_hashes))
    )
    return (joined.select("a", "b", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold))


def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    Token hashes contribute a +/-1 vote per bit; the 64 votes are 64
    aggregate columns over one explode of tokens (no per-bit row blowup),
    partially aggregated map-side before the single shuffle on doc_id;
    bits re-assemble with literal shifts.
    """
    from torspider_spark.partitioning import ensure_min_partitions

    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (ensure_min_partitions(docs)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(64)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    simhash = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)) \
            .otherwise(F.lit(0).cast("long"))
        simhash = bit if simhash is None else simhash + bit
    return per_doc.select("doc_id", simhash.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4 x 16-bit chunks
    (any pair within hamming<=3 of 64 bits shares at least one chunk),
    join on chunk equality, then exact popcount check."""
    hashed = simhash64(docs, text_col, id_col)
    chunks = hashed.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            ) for c in range(4)
        ])).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    left = chunks.select(F.col("doc_id").alias("a"),
                         F.col("simhash").alias("sh_a"), "chunk_id", "chunk")
    right = chunks.select(F.col("doc_id").alias("b"),
                          F.col("simhash").alias("sh_b"), "chunk_id", "chunk")
    cand = (left.join(right, ["chunk_id", "chunk"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None,
                        materialize: bool = True) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing any shingle.

    |A ∩ B| via co-occurrence counts on exploded distinct shingles; set
    sizes joined back broadcast-style. Quadratic only within shingle
    buckets — suitable standalone at moderate scale or as the verifier
    behind LSH candidates at full scale.

    ``max_shingle_df`` is the 100-TB skew guard: a boilerplate shingle
    (header/footer text) shared by millions of documents makes the
    co-occurrence self-join emit O(df^2) rows for that one key — a
    straggler no salt can fully amortize because every pair is a real
    output candidate. Setting a document-frequency cutoff drops such
    stop-shingles from the UNIVERSE (both the intersection counts and the
    per-doc set sizes, so jaccard stays a true set similarity over the
    filtered shingle space — the standard stop-shingle construction).
    None (default) preserves exact full-universe semantics, which is what
    the `ngram_jaccard` driver oracle checks.

    ``materialize`` (default) lazily localCheckpoints the narrow
    (doc_id, sh) shingle frame: it feeds the df-count branch, the size
    aggregate AND both self-join sides, so without a cut Catalyst plans
    up to four full re-derivations of the shingle explosion (scan +
    split + transform per reference — measured 15.4 s -> ~6 s on the
    planted-boilerplate bench line). Values are unchanged; pass False
    when the input is itself a cheap scan of pre-shingled storage.
    """
    from torspider_spark.partitioning import ensure_min_partitions

    shingled = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n)))
        .alias("sh"),
    )
    if materialize:
        shingled = shingled.localCheckpoint(eager=False)
    if max_shingle_df is not None:
        # One count-agg shuffle on the shingle key; the surviving rows
        # re-shuffle on the same key for the self-join, so AQE can reuse
        # the exchange. Rows are (doc_id, sh) only — no payload columns.
        df_counts = shingled.groupBy("sh").agg(F.count("*").alias("_df"))
        shingled = (shingled.join(
            df_counts.filter(F.col("_df") <= max_shingle_df), "sh")
            .drop("_df"))
        if materialize:
            # The filtered frame feeds the size aggregate and both join
            # sides — cut it too so the df-join itself runs once.
            shingled = shingled.localCheckpoint(eager=False)
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    co = (
        shingled.alias("x")
        .join(shingled.alias("y"), "sh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        co.join(sa, "a").join(sb, "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def word_span_array(text_col: str, span_words: int = 10):
    """Array of NON-overlapping ``span_words``-word spans (the final span
    may be shorter) — the unit of C4-style span-level dedup. Single-space
    split on purpose: it is the exact inverse of the joiner below AND
    byte-identical to the SQL oracle's string_split, so the reassembled
    text round-trips."""
    words = F.split(F.col(text_col), " ")
    n_spans = F.greatest(
        F.ceil(F.size(words) / F.lit(span_words)), F.lit(1)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(
            F.slice(words, i * span_words + 1, span_words), " "),
    )


def span_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               span_words: int = 10,
               materialize: bool = True) -> DataFrame:
    """Corpus-wide span-level dedup (C4-style): any span whose exact text
    already occurred EARLIER in the corpus — a lower doc id, or an earlier
    position in the same document — is removed, and each document's
    surviving spans are rejoined in order.

    Output: (doc_id, clean_text, n_spans, n_kept) for every input doc
    (clean_text == '' when nothing survives, e.g. a wholesale copy of an
    earlier document).

    Scale shape: first-occurrence per span is a groupBy(span).min(struct)
    — partial aggregation collapses each map partition to one row per
    span BEFORE the shuffle, so a boilerplate span repeated across a
    billion pages costs its duplicates only map-side (this is why it is
    an aggregate and not a row_number window, which would sort the whole
    hot key in one task). The flag join is on the same span key (exchange
    reuse + AQE skew split), and because every document yields at least
    one span, totals + survivors + reassembly all come from ONE
    groupBy(doc_id) over the flagged rows (collect_list drops the
    null'd-out losers). Two aggregations + one join, no row wider than
    one span.
    """
    from torspider_spark.partitioning import ensure_min_partitions

    spans = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_span_array(text_col, span_words))
        .alias("span_idx", "span"))
    if materialize:
        # The span frame feeds BOTH the first-occurrence aggregate and
        # the flag join's probe side; without a cut Catalyst re-derives
        # the split+posexplode from the scan for each. Lazy
        # localCheckpoint halves the explode work; disable for inputs
        # where a second scan is cheaper than caching corpus-sized spans.
        spans = spans.localCheckpoint(eager=False)
    firsts = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("first"))
    kept = (F.col("doc_id") == F.col("first.doc_id")) & \
        (F.col("span_idx") == F.col("first.span_idx"))
    flagged = (spans.join(firsts, "span")
               .select("doc_id", "span_idx", "span", kept.alias("kept")))
    return (flagged.groupBy("doc_id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("kept"),
                                    F.struct("span_idx", "span")))),
                         lambda s: s["span"]),
                     " ").alias("clean_text"),
                 F.count("*").cast("long").alias("n_spans"),
                 F.sum(F.col("kept").cast("long")).alias("n_kept")))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 13) -> DataFrame:
    """Benchmark decontamination: flag every corpus document that shares
    at least one exact ``shingle_n``-gram (13 words is the conventional
    window) with any document in ``benchmark`` — the standard guard
    against eval material leaking into a pretraining corpus.

    Output: the input rows plus ``n_contaminated`` (count of DISTINCT
    benchmark shingles the doc contains) and a ``contaminated`` flag; a
    clean pipeline then filters ``~contaminated`` (or audits the counts
    first — that is why this returns counts rather than a bare semi-join).

    Scale shape: benchmark suites are tiny next to a 100-TB corpus, so
    the benchmark shingle set (distinct'd first — suite-internal
    repetition costs nothing) broadcasts into the corpus-side shingle
    stream: the corpus is never shuffled, only its matching (doc_id,
    shingle) rows reach the count aggregate, and the final flag join is
    hits-sized — left to AQE, which broadcasts it in the normal case of
    sparse contamination and falls back to a key join if a pathological
    corpus matches everywhere. Docs shorter than
    shingle_n words fall back to one whole-text shingle (word_shingles'
    end-clamp), so a verbatim short benchmark doc still matches; a
    shingle can never false-positive across that boundary because the
    clamped shingle IS the full word sequence.
    """
    from torspider_spark.partitioning import ensure_min_partitions

    doc_sh = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n)))
        .alias("sh"))
    bench_sh = (benchmark.select(
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n)))
        .alias("sh")).distinct())
    hits = (doc_sh.join(F.broadcast(bench_sh), "sh")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_contaminated")))
    return (docs.join(
        hits.withColumnRenamed("doc_id", id_col), id_col, "left")
        .withColumn("n_contaminated",
                    F.coalesce(F.col("n_contaminated"), F.lit(0)))
        .withColumn("contaminated", F.col("n_contaminated") > 0))
