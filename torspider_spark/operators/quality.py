"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All Spark-native column expressions (codegen'd) — no UDFs. Runs over
`documents(doc_id, text, lang, source, n_chars)` or any text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für",
           "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "ru": ["и", "в", "не", "на", "что", "это", "с", "как", "по", "его"],
}


def tokens_col(text_col):
    """Whitespace tokens (lowercased)."""
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (chars/4 is the
    classic rough BPE token proxy; the regex count tracks word+punct
    boundaries the way byte-level BPE pretokenizers split)."""
    toks = tokens_col(F.col(text_col))
    bpe_ish = F.size(F.split(F.col(text_col),
                             r"(?=[\s\p{Punct}])|(?<=[\s\p{Punct}])"))
    return docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_bpe_est",
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long"),
    ).withColumn("n_segments", bpe_ish)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, punctuation ratio, stopword ratio, uppercase ratio,
    mean word length. Everything is a codegen'd expression."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))

    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))

    length_ok = F.when((n_chars >= 50) & (n_chars <= 50_000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5)
    upper_ok = F.when(upper_ratio <= 0.3, 1.0).otherwise(0.5)
    word_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0) \
        .otherwise(0.4)
    score = (length_ok + punct_ok + upper_ok + word_ok) / F.lit(4.0)

    return docs.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: the language whose profile hits the
    most tokens wins; 'und' (undetermined) when nothing hits. Deterministic
    tie-break by language code."""
    toks = tokens_col(F.col(text_col))

    def profile_hits(profile):
        return F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))

    best = None
    # Reverse-sorted fold with >=: a later (alphabetically smaller) language
    # replaces the incumbent on equal hits, so ties resolve to the
    # alphabetically first language — on the FULL code, not just its first
    # character.
    for lang in sorted(STOPWORDS, reverse=True):
        hits = profile_hits(F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        entry = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        best = entry if best is None else (
            F.when(hits >= best["hits"], entry).otherwise(best))
    detected = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return docs.withColumn("detected_lang", detected)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints:
    content_md5 — md5 of whitespace-normalized lowercase text (portable to
    the DuckDB oracle); rolling_min64 — min xxhash64 over word 4-grams (a
    1-perm minhash; shift-resistant rolling-window fingerprint)."""
    # NB deliberately NO ensure_min_partitions here: consumers of this
    # operator overwhelmingly prune down to content_md5 (dedup keys),
    # and Catalyst then never evaluates the 4-gram rolling_min64 at all —
    # an unconditional spread only adds an exchange (measured: the
    # fingerprint driver query regressed 0.65 -> 1.08 s in the r6-vs-r7
    # interleaved A/B with a spread here; reverted). Callers that DO
    # consume rolling_min64 over a narrow input should spread upstream.
    normalized = F.concat_ws(" ", tokens_col(F.col(text_col)))
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    count = F.greatest(F.size(words) - F.lit(3), F.lit(1))
    grams = F.transform(F.sequence(F.lit(0), count - 1),
                        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 4)))
    return docs.select(
        "*",
        F.md5(normalized).alias("content_md5"),
        F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))
        .alias("rolling_min64"),
    )


def repetition_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher/RefinedWeb-style repetition signals per document: the
    fraction of word n-grams that are duplicates of an earlier n-gram in
    the SAME document, and the share claimed by the single most frequent
    n-gram. High values flag boilerplate / spam / degenerate generation —
    the standard repetition filters a curation pipeline applies alongside
    quality_score.

    Output: (doc_id, n_grams, n_distinct, top_count, dup_frac_e6,
    top_frac_e6). Fractions are integerized (floor(x*1e6 + 0.5)) so
    cross-engine comparison never rides float formatting.

    Scale shape: explode to (doc_id, gram) — never wider — then two
    hash aggregations, both with map-side partial combine: count per
    (doc_id, gram), then sum/count/max per doc_id. The repeated-gram hot
    key a skew-prone window would choke on is collapsed by the combiner
    (same argument as span_dedup's first-occurrence aggregate). Uses the
    same word_shingles construction as the MinHash path (textdedup), so
    a doc shorter than n words yields one short gram, not zero rows."""
    from torspider_spark.operators.textdedup import word_shingles
    from torspider_spark.partitioning import ensure_min_partitions

    grams = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"))
    e6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)).cast("long")
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top_count").cast("long").alias("top_count"),
        e6(F.lit(1.0) - F.col("n_distinct") / F.col("n_grams"))
        .alias("dup_frac_e6"),
        e6(F.col("top_count") / F.col("n_grams")).alias("top_frac_e6"))


# PII redaction — ordered so no category ever sees another's leftovers:
# emails first (they contain digits), then dotted IPv4 quads, then digit
# runs (phones). Patterns are deliberately restricted to the regex subset
# Java (Spark) and RE2 (DuckDB/the oracle) evaluate identically: no
# lookarounds (RE2 has none), no alternation between variable-length
# branches, ASCII classes only, greedy quantifiers.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # Optional '+' then 8-14 digits (1 + {7,13}) separated by single
    # spaces/dashes.
    # '\+?\b' (not '\b\+?'): there is no word boundary before '+' after
    # whitespace, but there IS one between '+' and the first digit.
    ("phone", r"\+?\b\d(?:[ -]?\d){7,13}\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-number digit runs from
    ``text_col`` into ``clean_text``, with a per-category match count
    (n_email, n_ipv4, n_phone) — the scrubbing pass a training-data
    pipeline runs before export. Pure codegen'd column expressions
    (regexp_extract_all + regexp_replace chains): zero shuffle, zero
    Python, linear in bytes scanned — the 100-TB shape is a map-only
    stage. Counts are taken on the text AS THAT CATEGORY SEES IT
    (after earlier categories redacted), mirroring the sequential
    replace, so count and replacement semantics can never drift."""
    cur = F.col(text_col)
    counts = {}
    for name, pat, _repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, _repl)
    return docs.withColumns({**counts, "clean_text": cur})
