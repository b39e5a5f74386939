"""Blocking, pairwise scoring, and connected-components tests."""

import pytest
from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark import reference_semantics as ref
from ai_bangladesh_address_parser_spark.operators.blocking import (
    block_stats,
    blocking_keys,
    candidate_pairs,
)
from ai_bangladesh_address_parser_spark.operators.cluster import (
    assign_entity_ids,
    connected_components,
)
from ai_bangladesh_address_parser_spark.operators.scoring import (
    attach_pair_components,
    score_pairs,
)

MENTIONS = [
    # (id, normalized, postal, district) — m1/m2 same postal; m3 alone;
    # m4/m5 same district soundex, no postal; m6/m7 unstructured
    # (no postal, no district) → blocked by minhash bands only
    ("m1", "house 12 road 5 mirpur dhaka", "1216", "Dhaka"),
    ("m2", "house 12, road 5, mirpur, dhaka", "1216", "Dhaka"),
    ("m3", "agrabad chattogram", "4100", "Chattogram"),
    ("m4", "banani dhaka", None, "Dhaka"),
    ("m5", "gulshan dhaka", None, "Dhaka"),
    ("m6", "plot 9 sector 4 uttara model town", None, None),
    ("m7", "plot 9, sector 4, uttara, model town", None, None),
]


@pytest.fixture(scope="module")
def keys(spark):
    df = spark.createDataFrame(
        MENTIONS, "mention_id string, normalized string, postal_code string, district string"
    )
    return blocking_keys(df).cache()


def test_blocking_key_families(keys):
    fams = {r["block_key"].split(":")[0] for r in keys.collect()}
    assert fams == {"p", "d", "m"}
    got = {r["block_key"] for r in keys.filter(F.col("block_key").startswith("p:")).collect()}
    assert got == {"p:1216", "p:4100"}


def test_minhash_bands_are_deterministic(spark, keys):
    df = spark.createDataFrame(
        MENTIONS, "mention_id string, normalized string, postal_code string, district string"
    )
    again = {tuple(r) for r in blocking_keys(df).collect()}
    assert {tuple(r) for r in keys.collect()} == again


def test_identical_token_sets_share_all_bands(keys):
    # m6/m7 differ only in commas → same token multiset → same bands.
    # (m1/m2 carry a postal → precisely blocked → NO band keys: LSH is
    # the recall net for unstructured mentions only.)
    k1 = {r["block_key"] for r in keys.filter("mention_id = 'm6'").collect() if r["block_key"].startswith("m:")}
    k2 = {r["block_key"] for r in keys.filter("mention_id = 'm7'").collect() if r["block_key"].startswith("m:")}
    assert k1 == k2 and len(k1) == 4
    assert not [r for r in keys.filter("mention_id = 'm1'").collect()
                if r["block_key"].startswith("m:")]


def test_candidate_pairs_within_blocks(keys):
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(keys).collect()}
    assert ("m1", "m2") in pairs
    assert ("m4", "m5") in pairs  # d:Dhaka soundex block
    assert not any("m3" in p for p in pairs)


def test_salted_hot_block_loses_no_pairs(spark):
    # one hot key shared by 40 ids: expect all C(40,2) pairs
    df = spark.createDataFrame([(f"x{i:02d}", "k") for i in range(40)], "mention_id string, block_key string")
    pairs = candidate_pairs(df, hot_cap=10, salt_buckets=4)
    assert pairs.count() == 40 * 39 // 2


def test_max_block_drops_degenerate_keys(spark):
    df = spark.createDataFrame(
        [(f"x{i:02d}", "huge") for i in range(30)] + [("a", "ok"), ("b", "ok")],
        "mention_id string, block_key string",
    )
    pairs = candidate_pairs(df, hot_cap=100, max_block=20)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {("a", "b")}


def _components(**kw):
    base = {c: "" for c in ref.ALL_COMPONENTS}
    base.update(kw)
    return base


SCORE_CASES = [
    (_components(postal_code="1216", district="Dhaka", house_number="12"),
     _components(postal_code="1216", district="Dhaka", house_number="12")),
    (_components(postal_code="1216", district="Dhaka"),
     _components(postal_code="1217", district="Dhaka")),
    (_components(area="Mirpur", district="Dhaka"),
     _components(area="Mirpur", district="Chattogram")),
    (_components(house_number="12/A"), _components(house_number="12/B")),
    (_components(flat_number="A3"), _components(floor_number="4")),
    (_components(district="Dhaka", area="Uttara", road="13A"),
     _components(district="Dhaka", area="Uttara", road="13")),
]


def test_score_pairs_difflib_matches_reference(spark):
    rows = []
    for i, (c1, c2) in enumerate(SCORE_CASES):
        row = {"id_a": f"a{i}", "id_b": f"b{i}"}
        row.update({k + "_a": v for k, v in c1.items()})
        row.update({k + "_b": v for k, v in c2.items()})
        rows.append(row)
    df = spark.createDataFrame(rows)
    got = {r["id_a"]: r for r in score_pairs(df, scorer="difflib").collect()}
    for i, (c1, c2) in enumerate(SCORE_CASES):
        want = ref.compare_components(c1, c2)
        g = got[f"a{i}"]
        assert g["score"] == pytest.approx(want["score"], abs=1e-9), (i, c1, c2)
        assert g["is_match"] == want["match"], (i, c1, c2)


def test_levenshtein_scorer_close_to_difflib(spark):
    rows = []
    for i, (c1, c2) in enumerate(SCORE_CASES):
        row = {"id_a": f"a{i}", "id_b": f"b{i}"}
        row.update({k + "_a": v for k, v in c1.items()})
        row.update({k + "_b": v for k, v in c2.items()})
        rows.append(row)
    df = spark.createDataFrame(rows)
    dd = {r["id_a"]: r["is_match"] for r in score_pairs(df, scorer="difflib").collect()}
    lv = {r["id_a"]: r["is_match"] for r in score_pairs(df, scorer="levenshtein").collect()}
    agree = sum(dd[k] == lv[k] for k in dd) / len(dd)
    assert agree >= 0.8  # calibration tracked at scale in bench fixtures


def test_connected_components_transitivity(spark):
    # chain a-b-c plus isolated pair d-e; no direct a-c edge
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "src string, dst string"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_connected_components_bigger_graph(spark):
    # two components: ring 0..9, chain 100..104, assorted singletons absent
    ring = [(f"n{i}", f"n{(i + 1) % 10}") for i in range(10)]
    chain = [(f"c{i}", f"c{i + 1}") for i in range(100, 104)]
    edges = spark.createDataFrame(ring + chain, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert all(got[f"n{i}"] == "n0" for i in range(10))
    assert all(got[f"c{i}"] == "c100" for i in range(100, 105))


def test_assign_entity_ids_keeps_singletons(spark):
    mentions = spark.createDataFrame([("a",), ("b",), ("z",)], ["mention_id"])
    edges = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    got = {r["mention_id"]: r["entity_id"] for r in assign_entity_ids(mentions, edges).collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_attach_pair_components(spark):
    wide = spark.createDataFrame(
        [("m1", "Dhaka", "1216"), ("m2", "Dhaka", "1216")],
        "mention_id string, district string, postal_code string",
    )
    pairs = spark.createDataFrame([("m1", "m2")], "id_a string, id_b string")
    out = attach_pair_components(pairs, wide, components=["district", "postal_code"])
    r = out.first()
    assert r["district_a"] == r["district_b"] == "Dhaka"
    scored = score_pairs(out, components=["district", "postal_code"]).first()
    assert scored["is_match"] and scored["score"] == pytest.approx(1.0)


def test_jaro_winkler_scorer_reference_values(spark):
    """JW pandas UDF matches the standard algorithm (pinned against
    DuckDB's jaro_winkler_similarity values)."""
    from ai_bangladesh_address_parser_spark.operators.scoring import score_pairs

    cases = [
        ("martha", "marhta", 0.961111),
        ("dixon", "dicksonx", 0.813333),
        ("jellyfish", "smellyfish", 0.896296),
        ("abc", "abc", 1.0),
        ("dwayne", "duane", 0.84),
        ("al", "aly", 0.911111),
        ("abcdefgh", "abcdefgh12345", 0.923077),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in cases], ["name_a", "name_b"]
    )
    out = score_pairs(df, components=["name"], scorer="jaro_winkler").collect()
    got = {(r.name_a, r.name_b): r.score for r in out}
    for a, b, want in cases:
        assert abs(got[(a, b)] - want) < 1e-5, (a, b, got[(a, b)], want)


def test_connected_components_random_graph_vs_union_find(spark):
    """CC on a deterministic pseudo-random graph vs a pure-Python
    union-find oracle."""
    import random

    from ai_bangladesh_address_parser_spark.operators.cluster import connected_components

    rng = random.Random(42)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical root = min node id per component
    expected = {}
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    for members in groups.values():
        root = min(members)
        for m in members:
            expected[m] = root

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    touched = {n for e in edges for n in e}
    assert got == {n: expected[n] for n in touched}


def test_entity_profiles_golden_record(spark):
    from ai_bangladesh_address_parser_spark.operators.cluster import entity_profiles

    rows = [
        ("e1", "12", "5", "Gulshan", "Dhaka", "Dhaka", "1212", "", "", ""),
        ("e1", "12", "5", "Gulshan", "Dhaka", "Dhaka", "1212", "", "", ""),
        ("e1", "12", "5", "Gulshun", "Dhaka", "Dhaka", "", "", "", ""),  # outlier variant
        ("e2", "7", "", "Banani", "Dhaka", "Dhaka", "1213", "A-3", "", ""),
    ]
    cols = ["entity_id", "house_number", "road", "area", "district",
            "division", "postal_code", "flat_number", "floor_number", "block_number"]
    df = spark.createDataFrame(rows, cols)
    prof = {r.entity_id: r.asDict() for r in entity_profiles(df).collect()}
    assert prof["e1"]["area"] == "Gulshan" and prof["e1"]["postal_code"] == "1212"
    assert prof["e1"]["n_members"] == 3
    assert prof["e2"]["flat_number"] == "A-3" and prof["e2"]["n_members"] == 1


def test_sparse_district_only_mentions_stay_apart(spark):
    """Deliberate divergence from the reference's O(n^2) compare: a rich
    mention (postal+house) and a district-only mention share no block
    key, so the 1.0-on-one-shared-component pair the reference would
    score is never generated — it would transitively weld every entity
    of a district into one (see blocking_keys docstring)."""
    df = spark.createDataFrame(
        [
            ("r1", "house 12, road 5, mirpur, dhaka", "1216", "Dhaka", "12", "Mirpur"),
            ("s1", "somewhere in dhaka", None, "Dhaka", None, None),
        ],
        "mention_id string, normalized string, postal_code string, "
        "district string, house_number string, area string",
    )
    keys = blocking_keys(df, use_minhash=False)
    pairs = candidate_pairs(keys).collect()
    assert pairs == []
    # the sparse mention still has its last-resort bare key
    bare = {r["block_key"] for r in keys.filter(F.col("mention_id") == "s1").collect()}
    assert any(k.startswith("d:") and k.count(":") == 1 for k in bare)


def test_blocking_keys_missing_columns_degrade(spark):
    df = spark.createDataFrame(
        [("m1", "house 5 gulshan"), ("m2", "house 5, gulshan")],
        "mention_id string, normalized string",
    )
    # no postal/district/house/area columns: only band keys remain
    keys = blocking_keys(df)
    fams = {r["block_key"].split(":")[0] for r in keys.collect()}
    assert fams == {"m"}


def test_empty_text_mentions_emit_no_band_keys(spark):
    df = spark.createDataFrame(
        [("m1", ""), ("m2", None), ("m3", "   ,, "), ("m4", "plot 9 uttara")],
        "mention_id string, normalized string",
    )
    keys = blocking_keys(df, postal_col=None, district_col=None)
    ids = {r["mention_id"] for r in keys.collect()}
    assert ids == {"m4"}  # contentless rows form no junk mega-block


def test_band_count_must_divide_seeds(spark):
    from ai_bangladesh_address_parser_spark.operators.blocking import (
        minhash_band_keys,
    )

    df = spark.createDataFrame([("m1", "a b c d")], "mention_id string, normalized string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_band_keys(df, n_seeds=8, n_bands=3)
    with pytest.raises(ValueError, match="must divide"):
        minhash_band_keys(df, n_seeds=8, n_bands=9)


def test_scorer_backend_agreement_bound(spark):
    """The production hot path scores with JVM levenshtein; difflib
    SequenceMatcher is the reference-parity backend. Pin the calibration:
    over labeled candidate pairs at the 0.85 reference threshold the
    match-decision disagreement rate stays < 1% and neither backend
    loses F1 against truth (full-corpus figures ride in BENCH.md via
    `python bench.py --scorer-audit`)."""
    from bench import scorer_audit

    out = scorer_audit(spark, n_pages=1200, n_entities=120)
    assert out["n_pairs"] > 500
    assert out["disagreement_rate"] < 0.01, out
    assert out["levenshtein"]["f1"] >= 0.99, out
    assert out["difflib"]["f1"] >= 0.99, out


def test_blocking_recall_metric(spark):
    """blocking_recall separates "blocking never proposed the pair"
    from scorer/threshold effects: a truth pair sharing a block is
    covered; a truth pair whose nodes share no key is a blocking miss.
    Denominator never materializes truth pairs (Σ n·(n−1)/2)."""
    from ai_bangladesh_address_parser_spark.operators.blocking import (
        blocking_recall,
    )

    keys = spark.createDataFrame(
        [("x1", "p:1000"), ("x2", "p:1000"), ("x3", "p:2000"), ("x4", "p:3000")],
        "mention_id string, block_key string",
    )
    pairs = candidate_pairs(keys)
    truth = spark.createDataFrame(
        [("x1", "e1"), ("x2", "e1"), ("x3", "e2"), ("x4", "e2")],
        "mention_id string, truth_entity_id string",
    )
    out = blocking_recall(pairs, truth)
    # e1's pair shares p:1000 (covered); e2's pair shares nothing (miss)
    assert out == {"truth_pairs": 2, "covered_pairs": 1, "recall": 0.5}

    # reversed / duplicated pair orientation must not double-count
    rev = pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")).unionAll(pairs)
    assert blocking_recall(rev, truth)["covered_pairs"] == 1

    # empty truth → vacuous recall 1.0, no division error
    empty = truth.filter(F.lit(False))
    assert blocking_recall(pairs, empty)["recall"] == 1.0


def test_blocking_recall_full_pipeline(spark):
    """End-to-end: on the separable synthetic corpus the composite
    blocking keys cover EVERY truth pair at the unique-mention level —
    recall 1.0 — and the denominator matches the distinct-node count."""
    from ai_bangladesh_address_parser_spark.operators.blocking import (
        blocking_recall,
    )
    from ai_bangladesh_address_parser_spark.plans.pipeline import LinkagePlan
    from ai_bangladesh_address_parser_spark.sources.pages import synth_pages

    pages, truth = synth_pages(spark, n_pages=480, n_entities=40)
    plan = LinkagePlan(spark)
    wide = plan.extract(pages)
    nodes = plan.unique_mentions(wide)
    pairs = plan.block(nodes, id_col="norm_key")
    node_truth = (
        wide.join(truth, "url")
        .select(F.col("norm_key").alias("mention_id"), "truth_entity_id")
    )
    out = blocking_recall(pairs, node_truth)
    assert out["recall"] == 1.0
    assert out["truth_pairs"] > 0


def test_pr_curve_hand_example(spark):
    """Threshold sweep on a 4-pair hand case — exact cumulative P/R/F1
    per bucket, plus the truth_total override that charges blocking
    misses to recall."""
    from ai_bangladesh_address_parser_spark.operators.scoring import pr_curve

    scored = spark.createDataFrame(
        [("a", "b", 0.95, True), ("c", "d", 0.90, False),
         ("e", "f", 0.60, True), ("g", "h", 0.30, False)],
        "id_a string, id_b string, score double, is_true boolean",
    )
    rows = {r["threshold"]: r for r in pr_curve(scored, n_bins=10).collect()}
    assert set(rows) == {0.9, 0.6, 0.3}
    assert (rows[0.9]["pred_pairs"], rows[0.9]["tp"]) == (2, 1)
    assert rows[0.9]["precision"] == 0.5 and rows[0.9]["recall"] == 0.5
    assert (rows[0.6]["pred_pairs"], rows[0.6]["tp"]) == (3, 2)
    assert abs(rows[0.6]["precision"] - 2 / 3) < 1e-12 and rows[0.6]["recall"] == 1.0
    assert (rows[0.3]["pred_pairs"], rows[0.3]["tp"]) == (4, 2)
    # f1 consistency at 0.6: 2*(2/3)*1/(2/3+1) = 0.8
    assert abs(rows[0.6]["f1"] - 0.8) < 1e-12

    # recall denominator override: 2 of 4 corpus truth pairs were never
    # scored (blocking misses) → recalls halve, precision unchanged
    rows4 = {r["threshold"]: r for r in
             pr_curve(scored, n_bins=10, truth_total=4).collect()}
    assert rows4[0.6]["recall"] == 0.5
    assert rows4[0.6]["precision"] == rows[0.6]["precision"]

    # score exactly 1.0 clamps into the top bucket, no bucket overflow
    one = spark.createDataFrame(
        [("x", "y", 1.0, True)], "id_a string, id_b string, score double, is_true boolean"
    )
    top = pr_curve(one, n_bins=10).collect()
    assert len(top) == 1 and top[0]["threshold"] == 0.9


def test_compare_detail_reference_semantics(spark):
    """compare_detail mirrors the reference compare() lists
    (address_utils.py:131-176): common = both present & sim ≥ 0.9;
    differences = one side present, or both present & sim < 0.9;
    both-absent components appear in neither."""
    from ai_bangladesh_address_parser_spark.operators.scoring import (
        compare_detail,
        score_pairs,
    )

    pairs = spark.createDataFrame(
        [
            ("p1", "12", "12", "road 5", "lane 7"),   # house common, road differs
            ("p2", "12", "", "", ""),                  # house one-sided, road absent
        ],
        "pair_id string, house_number_a string, house_number_b string, "
        "road_a string, road_b string",
    )
    comps = ["house_number", "road"]
    out = {
        r["pair_id"]: r
        for r in compare_detail(
            score_pairs(pairs, components=comps, scorer="levenshtein"),
            components=comps,
        ).collect()
    }
    assert out["p1"]["common"] == "house_number"
    assert out["p1"]["differences"] == "road"
    assert out["p2"]["common"] == ""
    assert out["p2"]["differences"] == "house_number"
