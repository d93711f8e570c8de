"""Cascade + representative-selection parity.

Ports the semantics pinned by the reference suite:
  * arg-min-rank representative incl. tie behavior
    (/root/reference/tests/utils/test_sequence_grouping.py:123-173)
  * median + z*MAD outliers incl. MAD=0 fallback
    (/root/reference/tests/utils/test_distance_matrix.py:73-140)
  * the 5 decision branches (test_sequence_grouping.py:527-821)
"""

import pytest
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.operators.classify import classify, rank_members

CFG = DedupConfig(
    strong_threshold=0.8, clade_size=3, z_threshold=2.0, target_length=100
)


def run_classify(spark, assignments, edges, stats, cfg=CFG, **kw):
    a = spark.createDataFrame(assignments, ["id", "component"])
    e = (
        spark.createDataFrame(edges, ["id_a", "id_b", "jaccard"])
        if edges
        else spark.createDataFrame([], "id_a string, id_b string, jaccard double")
    )
    s = spark.createDataFrame(stats, ["id", "n_chars"])
    rows = classify(a, e, s, cfg, **kw).collect()
    return {r["id"]: r for r in rows}


def test_single_sequence(spark):
    # Case 1 (sequence_grouping.py:210-221): singleton -> good
    out = run_classify(spark, [("A", "A")], [], [("A", 100)])
    assert out["A"]["classification"] == "good"
    assert out["A"]["decision_category"] == "SingleSequence"


def test_below_threshold_picks_best_rank(spark):
    # Case 2 (sequence_grouping.py:227-252): all pairs strong -> arg-min-rank
    # good, rest bad. n_chars closest to target (100) wins.
    out = run_classify(
        spark,
        [("A", "A"), ("B", "A"), ("C", "A")],
        [("A", "B", 0.9), ("A", "C", 0.95), ("B", "C", 0.9)],
        [("A", 150), ("B", 100), ("C", 400)],
    )
    assert out["B"]["classification"] == "good"
    assert out["A"]["classification"] == "bad"
    assert out["C"]["classification"] == "bad"
    assert all(r["decision_category"] == "BelowThreshold" for r in out.values())
    assert all(r["rep_id"] == "B" for r in out.values())


def test_chain_with_missing_pair_is_not_below_threshold(spark):
    # Reference case 2 requires ALL C(n,2) pairwise distances below
    # threshold (sequence_grouping.py:227, :51-53). A transitive chain
    # A~B~C whose A–C pair never verified has only 2 of 3 pairs — it must
    # fall through to SmallClade, not BelowThreshold, even though every
    # EXISTING edge is strong.
    out = run_classify(
        spark,
        [("A", "A"), ("B", "A"), ("C", "A")],
        [("A", "B", 0.9), ("B", "C", 0.9)],  # A–C missing
        [("A", 100), ("B", 150), ("C", 200)],
    )
    assert all(r["decision_category"] == "SmallClade" for r in out.values())
    assert out["A"]["classification"] == "good"
    assert out["B"]["classification"] == "bad"
    assert out["C"]["classification"] == "bad"


def test_big_chain_with_missing_pairs_reaches_outlier_branch(spark):
    # Same incomplete-pair rule on a component larger than clade_size:
    # a 5-link strong chain (4 of 10 pairs present) must reach the
    # outlier/coinfection logic, never BelowThreshold.
    chain = ["A", "B", "C", "D", "E"]
    edges = [(chain[i], chain[i + 1], 0.9) for i in range(4)]
    out = run_classify(
        spark,
        [(x, "A") for x in chain],
        edges,
        [(x, 100 + i) for i, x in enumerate(chain)],
    )
    assert all(
        r["decision_category"] in ("OutliersDetected", "TrueCoinfection")
        for r in out.values()
    )


def test_rank_tie_broken_by_id(spark):
    # reference tie rule: stable first-encountered (io_utils.py:48-55);
    # distributed equivalent: explicit id tiebreak (SURVEY §2.5)
    out = run_classify(
        spark,
        [("X", "X"), ("Y", "X")],
        [("X", "Y", 1.0)],
        [("X", 100), ("Y", 100)],  # identical stats -> tie
    )
    assert out["X"]["classification"] == "good"
    assert out["Y"]["classification"] == "bad"


def test_small_clade(spark):
    # Case 3 (sequence_grouping.py:257-286): some pair below strong
    # threshold, component small -> best good, rest bad, SmallClade
    out = run_classify(
        spark,
        [("A", "A"), ("B", "A"), ("C", "A")],
        [("A", "B", 0.9), ("B", "C", 0.6)],  # 0.6 < strong 0.8
        [("A", 100), ("B", 150), ("C", 200)],
    )
    assert out["A"]["classification"] == "good"
    assert out["B"]["classification"] == "bad"
    assert out["C"]["classification"] == "bad"
    assert all(r["decision_category"] == "SmallClade" for r in out.values())


def test_outliers_detected_reference_mode(spark):
    # Case 4 (sequence_grouping.py:288-337): big component, one member much
    # farther than the rest -> OutliersDetected; outlier BAD (reference
    # mode), best non-outlier GOOD.
    # Component of 5 (clade_size=3 so "big"); E is far from everyone.
    edges = [
        ("A", "B", 0.7), ("A", "C", 0.7), ("A", "D", 0.7),
        ("B", "C", 0.7), ("B", "D", 0.7), ("C", "D", 0.7),
        ("A", "E", 0.1), ("B", "E", 0.1), ("C", "E", 0.1), ("D", "E", 0.1),
    ]
    assigns = [(x, "A") for x in "ABCDE"]
    stats = [("A", 100), ("B", 110), ("C", 120), ("D", 130), ("E", 140)]
    out = run_classify(spark, assigns, edges, stats)
    assert all(r["decision_category"] == "OutliersDetected" for r in out.values())
    assert out["A"]["classification"] == "good"  # best non-outlier (rank 1)
    assert out["E"]["classification"] == "bad"   # the outlier, reference mode
    for x in "BCD":
        assert out[x]["classification"] == "bad"


def test_outliers_detach_mode(spark):
    cfg = CFG.with_overrides(detach_outliers=True)
    edges = [
        ("A", "B", 0.7), ("A", "C", 0.7), ("A", "D", 0.7),
        ("B", "C", 0.7), ("B", "D", 0.7), ("C", "D", 0.7),
        ("A", "E", 0.1), ("B", "E", 0.1), ("C", "E", 0.1), ("D", "E", 0.1),
    ]
    out = run_classify(
        spark, [(x, "A") for x in "ABCDE"], edges,
        [("A", 100), ("B", 110), ("C", 120), ("D", 130), ("E", 140)], cfg=cfg
    )
    assert out["E"]["classification"] == "good"  # detached, kept


def test_true_coinfection(spark):
    # Case 5 (sequence_grouping.py:339-353): big component, uniform mid
    # similarity, no outliers -> everyone coinfection (kept)
    edges = [
        (a, b, 0.5)
        for i, a in enumerate("ABCDE")
        for b in "ABCDE"[i + 1:]
    ]
    out = run_classify(
        spark, [(x, "A") for x in "ABCDE"], edges,
        [(x, 100 + i) for i, x in enumerate("ABCDE")]
    )
    assert all(r["decision_category"] == "TrueCoinfection" for r in out.values())
    assert all(r["classification"] == "coinfection" for r in out.values())


def test_mad_zero_fallback(spark):
    # test_distance_matrix.py:106-140: uniform distances (MAD=0) with one
    # member slightly above median + evolution_threshold -> still an outlier.
    # evolution_threshold = (1-strong)/z = 0.2/2 = 0.1.
    # A,B,C,D mutually 0.75 (dist 0.25); E at 0.3 (dist 0.7).
    # member mean_dist: A..D = (3*0.25+0.7)/4 = 0.3625; E = 0.7
    # median = 0.3625, MAD = 0 -> cutoff = 0.4625 -> E outlier.
    edges = [
        ("A", "B", 0.75), ("A", "C", 0.75), ("A", "D", 0.75),
        ("B", "C", 0.75), ("B", "D", 0.75), ("C", "D", 0.75),
        ("A", "E", 0.3), ("B", "E", 0.3), ("C", "E", 0.3), ("D", "E", 0.3),
    ]
    out = run_classify(
        spark, [(x, "A") for x in "ABCDE"], edges,
        [(x, 100) for x in "ABCDE"]
    )
    assert out["A"]["decision_category"] == "OutliersDetected"
    assert out["E"]["classification"] == "bad"
    assert out["A"]["classification"] == "good"


def test_rank_members_global_order(spark):
    # io_utils.py:48-55 global multi-key sort parity
    cfg = DedupConfig(target_length=100)
    df = spark.createDataFrame(
        [("a", 90, 5.0), ("b", 110, 9.0), ("c", 100, 1.0), ("d", 110, 9.0)],
        ["id", "n_chars", "q"],
    )
    ranked = rank_members(
        df, cfg, quality_cols=("q",), partition_by=None
    ).orderBy("rank").collect()
    # dist: c=0, a=10, b=10, d=10; among dist=10: q desc -> b,d (tie->id), a
    assert [r["id"] for r in ranked] == ["c", "b", "d", "a"]
