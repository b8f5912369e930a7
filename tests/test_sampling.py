"""Deterministic sampling / sharding / sequence packing invariants."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from torspider_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_threshold_hex_envelope():
    assert sampling.threshold_hex(0.0) == "0" * 15
    # 'g' sorts after every hex digit: fraction 1.0 keeps ALL rows on
    # both engines, including a (16^-15) all-f md5 prefix
    assert sampling.threshold_hex(1.0) == "g" * 15
    assert "f" * 15 < sampling.threshold_hex(1.0)
    assert sampling.threshold_hex(-3.0) == "0" * 15
    # 0.5 is exactly 8 followed by zeros in hex fixed-point
    assert sampling.threshold_hex(0.5) == "8" + "0" * 14


def test_hash_sample_stable_under_repartition(docs):
    a = {r.doc_id for r in
         sampling.hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in
         sampling.hash_sample(docs.repartition(17, "lang"), 0.3)
         .select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_matches_hashlib(docs):
    """Row membership is exactly the md5-threshold definition."""
    kept = {r.doc_id for r in
            sampling.hash_sample(docs, 0.25).select("doc_id").collect()}
    thr = sampling.threshold_hex(0.25)
    for r in docs.select("doc_id").collect():
        h = hashlib.md5(f"{r.doc_id}:".encode()).hexdigest()[:15]
        assert (h < thr) == (r.doc_id in kept)


def test_hash_sample_salt_decorrelates(docs):
    a = {r.doc_id for r in
         sampling.hash_sample(docs, 0.5, salt="a").select("doc_id").collect()}
    b = {r.doc_id for r in
         sampling.hash_sample(docs, 0.5, salt="b").select("doc_id").collect()}
    assert a != b


def test_stratified_rates(docs):
    kept = sampling.stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, default_fraction=0.5)
    by_lang = {r.lang: r.n for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == totals["en"]      # fraction 1.0 keeps all
    assert "de" not in by_lang                    # fraction 0.0 drops all
    for lang, n in by_lang.items():
        if lang not in ("en", "de"):              # default 0.5 is Bernoulli
            assert 0 < n < totals[lang]


def test_shards_partition_the_corpus(docs):
    sharded = sampling.assign_shards(docs, n_shards=4)
    counts = sharded.groupBy("shard_id").count().collect()
    assert sorted(r.shard_id for r in counts) == [0, 1, 2, 3]
    assert sum(r['count'] for r in counts) == docs.count()
    # same key -> same shard regardless of input order/partitioning
    again = sampling.assign_shards(docs.repartition(13), n_shards=4)
    assert ({(r.doc_id, r.shard_id) for r in
             sharded.select("doc_id", "shard_id").collect()}
            == {(r.doc_id, r.shard_id) for r in
                again.select("doc_id", "shard_id").collect()})


def test_pack_sequences_two_phase_equals_global_window(docs, spark):
    """The bucketed prefix sum must equal the naive global-window cumsum
    (the exact decomposition claim in the docstring)."""
    seq_len = 64
    packed = sampling.pack_sequences(
        docs.select("doc_id", "text"), seq_len=seq_len).collect()

    h = sampling.hash_hex_col(F.col("doc_id"))
    toks = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    naive = (docs.select("doc_id", h.alias("h"),
                         toks.cast("long").alias("n_tokens"))
             .withColumn("seq_start", F.coalesce(F.sum("n_tokens").over(
                 Window.orderBy("h", "doc_id")
                 .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))))
    expect = {r.doc_id: (r.n_tokens, r.seq_start) for r in naive.collect()}
    assert len(packed) == len(expect)
    for r in packed:
        n_tokens, seq_start = expect[r.doc_id]
        assert (r.n_tokens, r.seq_start) == (n_tokens, seq_start)
        assert r.first_chunk == seq_start // seq_len
        last = (seq_start + n_tokens - 1) // seq_len
        assert r.n_chunks == last - r.first_chunk + 1


def test_pack_sequences_is_gapless(docs):
    """Hash order lays docs end to end: each start = previous start+len,
    and the chunk grid covers ceil(total/seq_len) chunks."""
    seq_len = 128
    rows = sorted(sampling.pack_sequences(
        docs.select("doc_id", "text"), seq_len=seq_len).collect(),
        key=lambda r: r.seq_start)
    pos = 0
    for r in rows:
        assert r.seq_start == pos
        pos += r.n_tokens
    total = pos
    assert rows[-1].first_chunk + rows[-1].n_chunks - 1 \
        == (total - 1) // seq_len
    assert math.ceil(total / seq_len) == (total - 1) // seq_len + 1


def test_select_token_budget_semantics(docs, spark):
    """Kept set is exactly the minimal score-ordered prefix whose token
    mass reaches the budget, and the bucket-pruned two-phase cum_before
    equals the naive global definition."""
    from torspider_spark.operators import quality

    budget = 700
    scored = quality.quality_score(docs)
    kept = sampling.select_token_budget(scored, budget).collect()

    score_e6 = F.floor(F.col("quality_score") * 1000000 + 0.5).cast("long")
    toks = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    all_rows = (scored.select("doc_id", score_e6.alias("score_e6"),
                              toks.cast("long").alias("n_tokens"))
                .collect())
    order = sorted(all_rows, key=lambda r: (-r.score_e6, r.doc_id))

    # naive exclusive prefix sums
    expect = {}
    pos = 0
    for r in order:
        if pos < budget:
            expect[r.doc_id] = (r.score_e6, r.n_tokens, pos)
        pos += r.n_tokens

    assert {r.doc_id: (r.score_e6, r.n_tokens, r.cum_before)
            for r in kept} == expect
    total_kept = sum(v[1] for v in expect.values())
    assert total_kept >= min(budget, pos)          # budget filled
    # minimality: dropping the LAST kept doc goes under budget
    last = max(kept, key=lambda r: r.cum_before)
    assert total_kept - last.n_tokens < budget


def test_select_token_budget_zero_and_huge(docs, spark):
    from torspider_spark.operators import quality

    scored = quality.quality_score(docs)
    assert sampling.select_token_budget(scored, 0).count() == 0
    assert sampling.select_token_budget(scored, 10**12).count() \
        == docs.count()


def test_threshold_hex_monotone_hypothesis():
    from hypothesis import given, strategies as st

    @given(st.floats(min_value=0.0, max_value=1.0),
           st.floats(min_value=0.0, max_value=1.0))
    def check(f1, f2):
        t1, t2 = sampling.threshold_hex(f1), sampling.threshold_hex(f2)
        if f1 <= f2:
            assert t1 <= t2
        assert len(t1) == 15 and set(t1) <= set("0123456789abcdefg")

    check()


def test_samples_are_nested_across_fractions(docs):
    """md5-threshold sampling gives NESTED subsets: raising the fraction
    only adds rows — the property that makes staged scale-ups (train on
    10%, grow to 30%) reuse every already-processed doc."""
    small = {r.doc_id for r in
             sampling.hash_sample(docs, 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in
           sampling.hash_sample(docs, 0.5).select("doc_id").collect()}
    assert small < big


def test_pack_sequences_invariant_to_bucket_granularity(docs):
    """1, 2, or 3 hash-prefix digits (16/256/4096 buckets) must all
    yield the identical global layout — the decomposition is exact at
    any granularity, so bucket count is purely a tuning knob."""
    frames = [sampling.pack_sequences(docs.select("doc_id", "text"),
                                      seq_len=96, bucket_hex_digits=k)
              for k in (1, 2, 3)]
    a, b, c = [{r.doc_id: (r.n_tokens, r.seq_start, r.first_chunk,
                           r.n_chunks) for r in f.collect()}
               for f in frames]
    assert a == b == c


def test_write_training_shards_roundtrip(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    sampling.write_training_shards(docs, out, n_shards=4)
    back = spark.read.parquet(out)
    expect = {(r.doc_id, r.shard_id) for r in
              sampling.assign_shards(docs, 4)
              .select("doc_id", "shard_id").collect()}
    assert {(r.doc_id, r.shard_id) for r in
            back.select("doc_id", "shard_id").collect()} == expect
    # one directory per shard, each with exactly one data file
    import glob
    for k in range(4):
        files = [f for f in glob.glob(f"{out}/shard_id={k}/*")
                 if not f.endswith(("_SUCCESS", ".crc"))]
        assert len(files) == 1, files
