"""Cross-family composition + kernel property tests.

1. Embedding-cosine edges feed the SAME connected-components +
   classification cascade as the text tiers (the docstring promise in
   operators/ann.py, proven here): near-dup vectors cluster and get one
   representative, outliers/categories behave identically to text edges.
2. The rolling-hash LCS kernel is property-tested against a naive O(n*m)
   dynamic-programming oracle on random token sequences.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lasvdedup_spark.config import DedupConfig
from lasvdedup_spark.operators.ann import cosine_dup_pairs, plane_tables
from lasvdedup_spark.operators.classify import classify
from lasvdedup_spark.operators.components import assign_components

DIM = 16


def test_embedding_tier_composes_through_dedup(spark):
    """tiers=("minhash", "embedding") as ONE dedup() call: a planted
    cross-modal cluster — A~B by text, B~C by embedding ONLY — must land
    in one component, with stage_plan listing the embedding stage."""
    import pytest

    from lasvdedup_spark.pipeline import dedup, stage_plan

    text_a = "the quick brown fox jumps over the lazy dog again and again every day"
    rows = [
        ("u/a", text_a),
        ("u/b", text_a + " extra"),            # near-dup of A by text
        ("u/c", "completely different words about catalyst and tungsten engines"),
        ("u/d", "an unrelated singleton page mentioning nothing shared at all"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    rng = np.random.default_rng(11)
    base = rng.standard_normal(DIM)
    noise = rng.standard_normal(DIM)
    noise *= 0.05 * np.linalg.norm(base) / np.linalg.norm(noise)
    far1, far2 = rng.standard_normal(DIM) * 3, rng.standard_normal(DIM) * 3
    emb = spark.createDataFrame(
        [
            ("u/a", far1.tolist()),
            ("u/b", base.tolist()),
            ("u/c", (base + noise).tolist()),   # B~C by embedding only
            ("u/d", far2.tolist()),
        ],
        "url string, embedding array<double>",
    )
    cfg = DedupConfig(embedding_threshold=0.95)
    out = dedup(
        spark, pages, cfg, tiers=("minhash", "embedding"), embeddings=emb
    ).collect()
    comp = {r["url"]: r["component"] for r in out}
    assert comp["u/a"] == comp["u/b"] == comp["u/c"]
    assert comp["u/d"] != comp["u/a"]
    # exactly one kept doc in the merged cluster + the singleton
    kept = {r["url"] for r in out if r["classification"] == "good"}
    assert "u/d" in kept and len(kept) == 2

    plan = stage_plan(cfg, tiers=("minhash", "embedding"))
    assert "edges_embedding" in [s["stage"] for s in plan]

    with pytest.raises(ValueError, match="embedding"):
        dedup(spark, pages, cfg, tiers=("embedding",))


def test_embedding_edges_feed_cascade(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, DIM))
    rows = [(f"v{i:02d}", base[i].tolist()) for i in range(30)]
    # vectors v00..v02 get two near-copies each -> three 3-member clusters
    k = 0
    for src in range(3):
        for _ in range(2):
            noise = rng.standard_normal(DIM)
            noise *= 0.1 * np.linalg.norm(base[src]) / np.linalg.norm(noise)
            rows.append((f"w{k:02d}", (base[src] + noise).tolist()))
            k += 1
    vecs = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    edges = cosine_dup_pairs(
        vecs, plane_tables(8, 4, DIM), threshold=0.9, id_col="vec_id"
    ).select("id_a", "id_b", F.col("cosine").alias("jaccard"))
    assigns = assign_components(
        vecs, edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="vec_id",
    )
    # stats: vector norm plays the "length" role for rep selection
    stats = vecs.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "cast(sqrt(aggregate(embedding, cast(0 as double),"
            " (a, x) -> a + x * x)) * 100 as int)"
        ).alias("n_chars"),
    )
    cfg = DedupConfig(target_length=100, strong_threshold=0.9)
    out = {r["id"]: r for r in classify(assigns, edges, stats, cfg).collect()}

    assert len(out) == 36
    comps = {}
    for i, r in out.items():
        comps.setdefault(r["component"], []).append(i)
    sizes = sorted(len(v) for v in comps.values())
    assert sizes[-3:] == [3, 3, 3]  # the three planted clusters
    for members in comps.values():
        if len(members) == 1:
            assert out[members[0]]["decision_category"] == "SingleSequence"
        else:
            reps = {out[m]["rep_id"] for m in members}
            assert len(reps) == 1  # exactly one representative per cluster
            kept = [m for m in members if out[m]["classification"] != "bad"]
            assert len(kept) >= 1


def _lcs_dp(a: list, b: list) -> int:
    """Naive O(n*m) longest-common-substring DP oracle."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


@st.composite
def token_pairs(draw):
    alphabet = st.sampled_from(["a", "b", "c", "d"])
    a = draw(st.lists(alphabet, min_size=0, max_size=40))
    b = draw(st.lists(alphabet, min_size=0, max_size=40))
    # sometimes plant a shared run so long spans are exercised
    if draw(st.booleans()):
        run = draw(st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=15))
        ia = draw(st.integers(0, len(a)))
        ib = draw(st.integers(0, len(b)))
        a = a[:ia] + run + a[ia:]
        b = b[:ib] + run + b[ib:]
    return a, b


@settings(max_examples=200, deadline=None)
@given(token_pairs())
def test_lcs_kernel_matches_dp_oracle(pair):
    from lasvdedup_spark.operators.substring import _lcs_tokens_kernel

    a, b = pair
    assert _lcs_tokens_kernel(a, b) == _lcs_dp(a, b)


def test_all_five_tiers_compose_in_one_dedup_call(spark, tmp_path):
    """tiers=("exact","minhash","simhash","substring","embedding") in ONE
    dedup() call: every edge generator feeds the shared merge (max-jaccard,
    max-transitive) and CC/cascade. Each planted cluster is reachable by a
    DIFFERENT tier only:
      - e1/e2: byte-identical (exact; also minhash)
      - m1/m2: high token-overlap near-dups (minhash)
      - v1/v2: disjoint texts, near-identical embeddings (embedding only)
      - s1/s2: a long shared span inside otherwise disjoint text (substring)
      - solo: singleton
    The checkpointed run must agree with the uncheckpointed one."""
    from lasvdedup_spark.pipeline import dedup

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "under a warm afternoon sun while birds keep singing softly")
    span = " ".join(f"shared{i}" for i in range(20))
    rows = [
        ("e1", base), ("e2", base),
        ("m1", "a second distinct corpus paragraph walking through harbor "
               "streets at dawn carrying baskets of fresh bread and fruit "
               "toward the market square extra words here"),
        ("m2", "a second distinct corpus paragraph walking through harbor "
               "streets at dawn carrying baskets of fresh bread and fruit "
               "toward the market square extra words there"),
        ("v1", "completely unrelated text about catalyst engines"),
        ("v2", "different words entirely concerning tungsten pipelines"),
        ("s1", f"alpha beta {span} gamma delta"),
        ("s2", f"omega psi {span} chi phi"),
        ("solo", "a singleton document sharing nothing with anything else"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    rng = np.random.default_rng(3)
    vbase = rng.standard_normal(DIM)
    noise = rng.standard_normal(DIM)
    noise *= 0.03 * float(np.linalg.norm(vbase) / np.linalg.norm(noise))
    emb_rows = [("v1", vbase.tolist()), ("v2", (vbase + noise).tolist())] + [
        (u, (rng.standard_normal(DIM) * (3 + i)).tolist())
        for i, u in enumerate(["e1", "e2", "m1", "m2", "s1", "s2", "solo"])
    ]
    emb = spark.createDataFrame(emb_rows, "url string, embedding array<double>")

    tiers = ("exact", "minhash", "simhash", "substring", "embedding")
    cfg = DedupConfig(embedding_threshold=0.95, substring_min_tokens=16)
    out = dedup(spark, pages, cfg, tiers=tiers, embeddings=emb).collect()
    comp = {r["url"]: r["component"] for r in out}
    assert comp["e1"] == comp["e2"]
    assert comp["m1"] == comp["m2"]
    assert comp["v1"] == comp["v2"]
    assert comp["s1"] == comp["s2"]
    # the planted clusters stay separate from each other and from solo
    reps = {comp["e1"], comp["m1"], comp["v1"], comp["s1"], comp["solo"]}
    assert len(reps) == 5
    assert len(out) == 9

    cfg_ck = cfg.with_overrides(checkpoint_dir=str(tmp_path))
    ck = dedup(spark, pages, cfg_ck, tiers=tiers, embeddings=emb).collect()
    assert {(r["url"], r["component"]) for r in ck} == {
        (r["url"], r["component"]) for r in out
    }


def test_containment_tier_composes_through_dedup(spark, tmp_path):
    """tiers=("minhash","containment") (VERDICT r4 #2): a planted
    subset-dup — short doc A quoted wholesale inside long doc B, Jaccard
    |A|/|B| ~ 0.3 < threshold but containment_a = 1.0 — must cluster under
    the containment tier and must NOT under minhash alone; stage_plan
    lists the shared signatures/bands plus edges_containment."""
    from lasvdedup_spark.pipeline import dedup, stage_plan

    quoted = " ".join(f"quote{i}" for i in range(24))
    rows = [
        ("u/short", quoted),
        ("u/long", quoted + " " + " ".join(f"fill{i}" for i in range(60))),
        ("u/other", "an unrelated page about entirely different subjects"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    cfg = DedupConfig()

    only_minhash = dedup(spark, pages, cfg, tiers=("minhash",)).collect()
    cm = {r["url"]: r["component"] for r in only_minhash}
    assert cm["u/short"] != cm["u/long"]  # symmetric Jaccard misses it

    both = dedup(spark, pages, cfg, tiers=("minhash", "containment")).collect()
    cb = {r["url"]: r["component"] for r in both}
    assert cb["u/short"] == cb["u/long"]
    assert cb["u/other"] != cb["u/short"]

    plan = stage_plan(cfg, tiers=("minhash", "containment"))
    names = [s["stage"] for s in plan]
    assert "edges_containment" in names
    assert names.count("signatures") == 1 and names.count("bands") == 1

    # checkpointed run agrees (stage addressed like every other tier)
    cfg_ck = cfg.with_overrides(checkpoint_dir=str(tmp_path))
    ck = dedup(
        spark, pages, cfg_ck, tiers=("minhash", "containment")
    ).collect()
    assert {(r["url"], r["component"]) for r in ck} == {
        (r["url"], r["component"]) for r in both
    }
    import os

    from lasvdedup_spark.pipeline import checkpoint_root

    root = checkpoint_root(cfg_ck, ("minhash", "containment"))
    assert os.path.exists(os.path.join(root, "edges_containment", "_SUCCESS"))
