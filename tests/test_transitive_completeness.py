"""Exact-tier (transitive-equality) pair-completeness in the cascade.

Regression tests for the round-2 defect: exact dedup emits m-1 star edges
per m-clique (operators/exact.py — deliberate, O(m) not O(m^2)), but the
BelowThreshold gate requires ALL C(m,2) pairs covered. Hash equality is
transitive, so the star PROVES the missing pairs; without that accounting a
>clade_size cluster of identical docs fell through to TrueCoinfection and
every copy was kept — silent failure of dedup itself under tiers=("exact",).
Reference analog: the all-pairs distance matrix always covers C(m,2)
(/root/reference/lasvdedup/utils/distance_matrix.py:35-43), so its cascade
never sees an under-counted clique.
"""

import pytest
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.operators.classify import classify
from lasvdedup_spark.pipeline import dedup


def _identical_pages(spark, n=10, text="the same boilerplate page body here"):
    return spark.createDataFrame(
        [(f"u{i:02d}", text) for i in range(n)], ["url", "text"]
    )


@pytest.mark.parametrize("tiers", [("exact",), ("exact", "minhash")])
def test_identical_cluster_larger_than_clade_is_below_threshold(spark, tiers):
    """>clade_size identical docs must classify BelowThreshold (one rep
    good, the rest bad) — under the exact tier alone AND combined with
    minhash (which re-verifies some of the same pairs at jaccard 1.0: the
    union must not double-count them past C(n,2))."""
    cfg = DedupConfig(clade_size=8)
    pages = _identical_pages(spark, n=10)
    out = dedup(spark, pages, cfg, tiers=tiers).collect()
    assert len(out) == 10
    assert {r["decision_category"] for r in out} == {"BelowThreshold"}
    good = [r["url"] for r in out if r["classification"] == "good"]
    bad = [r["url"] for r in out if r["classification"] == "bad"]
    assert len(good) == 1 and len(bad) == 9
    assert all(r["rep_id"] == good[0] for r in out)


def test_exact_tier_small_identical_cluster_still_below_threshold(spark):
    """<=clade_size identical docs: BelowThreshold fires before SmallClade
    (cascade order, sequence_grouping.py:209-254)."""
    cfg = DedupConfig(clade_size=8)
    out = dedup(spark, _identical_pages(spark, n=4), cfg, tiers=("exact",)).collect()
    assert {r["decision_category"] for r in out} == {"BelowThreshold"}
    assert sum(r["classification"] == "good" for r in out) == 1


def test_exact_plus_minhash_chain_unchanged(spark):
    """Adding the exact tier (empty here: no identical texts) must not
    change minhash-chain semantics: a transitive A~B~C chain whose A-C pair
    never verified stays pairwise-INcomplete and falls to SmallClade."""
    texts = [
        ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
        ("b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 x11 x12"),
        ("c", "w1 w2 w3 w4 w5 w6 w7 w8 y9 y10 x11 x12"),
    ]
    pages = spark.createDataFrame(texts, ["url", "text"])
    cfg = DedupConfig(strong_threshold=0.95)
    base = {
        r["url"]: (r["decision_category"], r["classification"])
        for r in dedup(spark, pages, cfg, tiers=("minhash",)).collect()
    }
    both = {
        r["url"]: (r["decision_category"], r["classification"])
        for r in dedup(spark, pages, cfg, tiers=("exact", "minhash")).collect()
    }
    assert base == both


def test_within_cluster_verified_pairs_not_double_counted(spark):
    """classify()-level: exact cluster {A,B,C,D} (stars from A) + a
    redundant verified B-C pair + E verified against A,B,C but NOT D.
    Covered pairs = C(4,2) implied + 3 cross-cluster = 9 < C(5,2) = 10 —
    the component is NOT complete. An implementation that counted the
    redundant within-cluster B-C pair as a 10th pair would falsely fire
    BelowThreshold."""
    cfg = DedupConfig(clade_size=8, strong_threshold=0.8)
    assignments = spark.createDataFrame(
        [(u, "A") for u in "ABCDE"], ["id", "component"]
    )
    stats = spark.createDataFrame(
        [(u, 100) for u in "ABCDE"], ["id", "n_chars"]
    )
    edges = spark.createDataFrame(
        [
            ("A", "B", 1.0, True),
            ("A", "C", 1.0, True),
            ("A", "D", 1.0, True),
            ("B", "C", 1.0, False),  # redundant: same exact cluster
            ("A", "E", 0.9, False),
            ("B", "E", 0.9, False),
            ("C", "E", 0.9, False),  # D-E missing
        ],
        ["id_a", "id_b", "jaccard", "transitive"],
    )
    out = classify(assignments, edges, stats, cfg).collect()
    assert {r["decision_category"] for r in out} == {"SmallClade"}
    # adding the missing D-E pair completes the component -> BelowThreshold
    edges2 = edges.unionByName(
        spark.createDataFrame(
            [("D", "E", 0.9, False)], ["id_a", "id_b", "jaccard", "transitive"]
        )
    )
    out2 = classify(assignments, edges2, stats, cfg).collect()
    assert {r["decision_category"] for r in out2} == {"BelowThreshold"}


def test_malformed_multi_rep_star_degrades_predictably(spark):
    """classify() is public: a caller passing NON-star transitive edges (a
    member under two reps) must not multiply verified rows through the
    rep-map joins (round-3 advice: dedupe rep_map on member). With the
    guard, the duplicated-rep row is dropped; the verified D-E pair counts
    exactly once per rep-map state and classification completes without
    row inflation."""
    cfg = DedupConfig(clade_size=2, strong_threshold=0.8)
    assignments = spark.createDataFrame(
        [(u, "A") for u in "ABCDE"], ["id", "component"]
    )
    stats = spark.createDataFrame(
        [(u, 100) for u in "ABCDE"], ["id", "n_chars"]
    )
    edges = spark.createDataFrame(
        [
            ("A", "C", 1.0, True),
            ("B", "C", 1.0, True),  # malformed: C now has reps A and B
            ("C", "D", 0.9, False),
            ("D", "E", 0.9, False),
        ],
        ["id_a", "id_b", "jaccard", "transitive"],
    )
    out = classify(assignments, edges, stats, cfg).collect()
    # no row multiplication: exactly one classification per member
    assert sorted(r["id"] for r in out) == list("ABCDE")
    # and the cross-cluster (C,D) verified edge was not double-counted via
    # C's duplicate rep rows: component is incomplete (far from C(5,2)=10
    # pairs), so it must land in the big-cluster branches, never
    # BelowThreshold
    assert all(r["decision_category"] != "BelowThreshold" for r in out)


def test_classify_without_transitive_column_unchanged(spark):
    """API compat: edges without the transitive column keep verified-only
    counting (the default minhash path and every oracle query)."""
    cfg = DedupConfig(clade_size=8)
    assignments = spark.createDataFrame(
        [(u, "A") for u in "ABC"], ["id", "component"]
    )
    stats = spark.createDataFrame([(u, 100) for u in "ABC"], ["id", "n_chars"])
    edges = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 1.0)], ["id_a", "id_b", "jaccard"]
    )
    out = classify(assignments, edges, stats, cfg).collect()
    # 2 of 3 pairs covered -> incomplete -> SmallClade, not BelowThreshold
    assert {r["decision_category"] for r in out} == {"SmallClade"}
