"""Connected-components duplicate clustering + C4-style span dedup vs
independent pure-Python references (union-find; dict-based first-occurrence
scan). The graph cases include path graphs — the adversarial shape for
naive min-label propagation — so the large-star/small-star round bound is
actually exercised."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from torspider_spark.operators import graphdedup, textdedup


# ------------------------------------------------ references ------------

class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _cc_reference(pairs):
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.parent}


def _span_dedup_reference(docs, span_words):
    """docs: [(doc_id, text)] -> {doc_id: (clean, n_spans, n_kept)};
    first occurrence ordered by (doc_id, span_idx) wins."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        words = text.split(" ")
        spans = [" ".join(words[i:i + span_words])
                 for i in range(0, max(len(words), 1), span_words)]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        out[doc_id] = (" ".join(kept), len(spans), len(kept))
    return out


def _run_cc(spark, pairs):
    df = spark.createDataFrame(pairs, "a: long, b: long")
    got = graphdedup.connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


# ------------------------------------------------ connected components --

def test_cc_chain_is_one_cluster(spark):
    """Path graph: diameter = n-1, the worst case for plain label
    propagation; star contraction must still converge within bounds."""
    pairs = [(i, i + 1) for i in range(40)]
    got = _run_cc(spark, pairs)
    assert got == {i: 0 for i in range(41)}


def test_cc_mixed_graphs_match_union_find(spark):
    rng = random.Random(7)
    pairs = [(i, i + 1) for i in range(100, 110)]          # chain
    pairs += [(a, b) for a in range(200, 206)
              for b in range(a + 1, 206)]                  # clique
    pairs += [(300, x) for x in range(301, 310)]           # star
    pairs += [(400, 401), (402, 403), (401, 402)]          # merged pairs
    pairs += [(500, 500)]                                  # self loop
    for _ in range(120):                                   # random graph
        pairs.append((rng.randrange(600, 660), rng.randrange(600, 660)))
    expected = _cc_reference([(a, b) for a, b in pairs if a != b])
    assert _run_cc(spark, pairs) == expected


def test_cc_deterministic_and_pair_order_invariant(spark):
    pairs = [(i, i + 3) for i in range(0, 30)]
    a = _run_cc(spark, pairs)
    b = _run_cc(spark, list(reversed(pairs)))
    assert a == b


def test_duplicate_clusters_sizes_and_keepers(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a: long, b: long")
    rows = {r["doc_id"]: r for r in
            graphdedup.duplicate_clusters(pairs).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_keeper"]
    assert rows[3]["cluster_id"] == 1 and not rows[3]["is_keeper"]
    assert rows[3]["cluster_size"] == 3
    assert rows[11]["cluster_size"] == 2 and rows[10]["is_keeper"]


def test_drop_near_duplicates_keeps_min_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "a: long, b: long")
    kept = sorted(r["doc_id"] for r in
                  graphdedup.drop_near_duplicates(docs, pairs).collect())
    # cluster {1,2,5} -> keep 1; {6,7} -> keep 6; 0,3,4 untouched
    assert kept == [0, 1, 3, 4, 6]


def test_cc_raises_instead_of_partial_result(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(20)],
                                  "a: long, b: long")
    with pytest.raises(RuntimeError):
        graphdedup.connected_components(pairs, max_rounds=1)


def test_cc_round_stats_reports_contraction(spark):
    """round_stats must record one entry per contraction round with
    monotone round ids and the final round's edge count equal to the
    star forest size (n_nodes - n_components)."""
    # one 64-deep chain + one triangle: 63 + 3 edges, 67 nodes, 2 comps
    pairs = [(i, i + 1) for i in range(63)] + [
        (100, 101), (101, 102), (100, 102)]
    df = spark.createDataFrame(pairs, "a: long, b: long")
    stats: list[dict] = []
    comps = graphdedup.connected_components(df, round_stats=stats)
    n_nodes = comps.count()
    n_comps = comps.select("component").distinct().count()
    assert [s["round"] for s in stats] == list(range(1, len(stats) + 1))
    assert len(stats) >= 2  # depth-64 chain cannot converge in one round
    assert stats[-1]["edges"] == n_nodes - n_comps
    assert all(s["seconds"] >= 0 for s in stats)


def test_cc_rejects_non_numeric_ids_loudly(spark):
    """A string doc id would cast to NULL and silently corrupt the graph;
    the guarded cast must raise instead (ADVICE r5)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC")], "a: string, b: string")
    with pytest.raises(SparkRuntimeException, match="castable to long"):
        graphdedup.connected_components(pairs).collect()
    # numeric strings cast losslessly and stay accepted
    ok = spark.createDataFrame([("1", "2"), ("2", "3")],
                               "a: string, b: string")
    comps = {r.node: r.component
             for r in graphdedup.connected_components(ok).collect()}
    assert comps == {1: 1, 2: 1, 3: 1}


def test_cc_rejects_lossy_fractional_ids_loudly(spark):
    """ADVICE r6: try_cast silently TRUNCATES fractional ids (1.2 and 1.7
    both cast to 1 — the edge collapses to a self-loop and vanishes), so
    fractional input that does not round-trip must raise, while whole
    doubles stay accepted."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    lossy = spark.createDataFrame(
        [(1.2, 1.7)], "a: double, b: double")
    with pytest.raises(SparkRuntimeException, match="castable to long"):
        graphdedup.connected_components(lossy).collect()
    # whole-valued doubles round-trip exactly and stay accepted
    ok = spark.createDataFrame([(1.0, 2.0), (2.0, 3.0)],
                               "a: double, b: double")
    comps = {r.node: r.component
             for r in graphdedup.connected_components(ok).collect()}
    assert comps == {1: 1, 2: 1, 3: 1}


# ------------------------------------------------ span dedup ------------

SPAN_DOCS = [
    (0, "a b c d e f g h"),                        # 2 spans of 4
    (1, "a b c d x y z w"),                        # first span dup of doc 0
    (2, "a b c d e f g h"),                        # wholesale copy -> empty
    (3, "p q r s p q r s p q r s"),                # within-doc repeat
    (4, "tail only"),                              # short single span
    (5, "x y z w tail only"),                      # spans seen separately
]


def test_span_dedup_matches_reference(spark):
    docs = spark.createDataFrame(SPAN_DOCS, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_kept"])
           for r in textdedup.span_dedup(docs, span_words=4).collect()}
    assert got == _span_dedup_reference(SPAN_DOCS, 4)
    assert got[2] == ("", 2, 0)                    # copy fully removed
    assert got[3] == ("p q r s", 3, 1)             # self-repeat collapsed


def test_span_dedup_matches_reference_on_fixture_slice(spark):
    base = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").collect()]
    docs = base + [(d + 100000, t) for d, t in base if d % 5 == 0]
    sdf = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_kept"])
           for r in textdedup.span_dedup(sdf, span_words=10).collect()}
    assert got == _span_dedup_reference(docs, 10)
    # every injected copy lost at least its duplicated spans
    for d, _ in docs:
        if d >= 100000:
            assert got[d][2] < got[d][1]


def test_cc_larger_graph_matches_union_find(spark):
    """~30k nodes / ~33k edges with 600-node path components (deep
    chains force the O(log^2) contraction through many rounds) plus
    random cross links — labels must equal union-find exactly."""
    rng = random.Random(11)
    pairs = []
    for base in range(0, 30000, 600):                  # 50 chains of 600
        pairs += [(i, i + 1) for i in range(base, base + 599)]
    pairs += [(rng.randrange(30000), rng.randrange(30000))
              for _ in range(3000)]                    # random bridges
    expected = _cc_reference([(a, b) for a, b in pairs if a != b])
    assert _run_cc(spark, pairs) == expected
