"""Tests for the corpus-pipeline operator families: dedup, similarity
search, text analysis, multimodal plumbing, formatting/validation."""

import pytest
from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.operators import dedup, similarity
from ai_bangladesh_address_parser_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    frame_sample_plan,
)
from ai_bangladesh_address_parser_spark.operators.text_analysis import (
    fingerprint_expr,
    langid_cols,
    quality_cols,
    token_count_cols,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup of 0
        (3, "spark shuffles partitions across the cluster for wide joins"),
        (4, "ঢাকা শহরের রাস্তা এবং এলাকা নিয়ে এই লেখা"),  # bangla
        (5, "completely different content about databases and storage engines"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_dedup(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert sum(g.n_docs for g in groups) == 6
    dup = [g for g in groups if g.n_docs == 2]
    assert len(dup) == 1 and dup[0].keep_id == 0
    kept = dedup.drop_exact_duplicates(docs)
    assert kept.count() == 5
    assert {r.doc_id for r in kept.collect()} == {0, 2, 3, 4, 5}


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert 0.5 <= pairs[(0, 2)] < 1.0    # near dup (one token differs)
    assert (0, 3) not in pairs and (0, 5) not in pairs


def test_minhash_lsh_recall_and_determinism(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_band_pairs(docs).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs          # high-jaccard near dup lands in ≥1 band
    assert (3, 5) not in pairs      # unrelated docs don't
    again = {(r.id_a, r.id_b) for r in dedup.minhash_band_pairs(docs.repartition(7)).collect()}
    assert pairs == again           # partitioning-independent


def test_simhash_near_pairs(spark, docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert all(0 <= v < (1 << 56) for v in sh.values())
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    assert 0 < ham <= 12            # near dup: small but nonzero distance
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_near_pairs(docs, max_hamming=12).collect()}
    assert pairs[(0, 1)] == 0 and (0, 2) in pairs


def test_ann_lsh_recall_vs_brute_force(spark):
    import math

    # deterministic synthetic embeddings: 3 well-separated direction
    # clusters on the unit circle in a 8-dim space + small offsets
    rows = []
    for i in range(90):
        c = i % 3
        theta = c * 2.1 + (i // 3) * 0.01
        vec = [math.cos(theta), math.sin(theta)] + [((i * 7 + d) % 5 - 2) * 0.01 for d in range(6)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").cache()
    q = emb.filter(F.col("vec_id") < 6)
    bf = {(r.query_id, r.neighbor_id) for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    ann = {(r.query_id, r.neighbor_id) for r in similarity.lsh_topk(emb, q, k=5, n_planes=6).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, recall
    nd = similarity.embedding_near_dup_pairs(emb, threshold=0.99)
    assert nd.count() > 0  # same-cluster neighbors are near-dups


def test_text_analysis_cols(spark, docs):
    out = docs.select(
        "doc_id",
        langid_cols("text")["pred_lang"].alias("lang"),
        quality_cols("text")["quality"].alias("q"),
        token_count_cols("text")["ws_tokens"].alias("ws"),
        fingerprint_expr("text").alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].lang == "en" and by_id[4].lang == "bn"
    assert by_id[0].fp == by_id[1].fp and by_id[0].fp != by_id[2].fp
    assert by_id[0].ws == 13
    assert all(0.0 <= r.q <= 1.0 for r in out)


def test_multimodal_plumbing(spark):
    base = spark.range(0, 20).select(
        F.col("id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "UTF-8").alias("blob"),
    )
    media = attach_media_meta(base, "id", "blob", kind="image", content_type="application/octet-stream")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_media_features(media, decoder="fake", dim=16).collect()
    assert len(feats) == 20
    f0 = [r for r in feats if r.media_id == "0"][0]
    assert len(f0.feature) == 16 and abs(sum(f0.feature) - 1.0) < 1e-5
    assert f0.kind == "image" and f0.n_bytes == len(b"payload-0")
    # determinism across partitioning
    feats2 = extract_media_features(media.repartition(5), decoder="fake").collect()
    assert {r.media_id: r.checksum for r in feats} == {r.media_id: r.checksum for r in feats2}
    with pytest.raises(NotImplementedError):
        extract_media_features(media, decoder="real")
    frames = frame_sample_plan(media, every_n_bytes=4, max_frames=3)
    f = frames.filter(F.col("media_id") == "10").collect()
    assert [r.byte_offset for r in f] == [0, 4, 8]


def test_write_banded_sink(spark, tmp_path):
    from ai_bangladesh_address_parser_spark.sources.pages import write_banded

    df = spark.createDataFrame(
        [(1, 0.97), (2, 0.91), (3, 0.55), (4, None)],
        "id bigint, overall_confidence double",
    )
    out = str(tmp_path / "banded")
    write_banded(df, out)
    back = spark.read.parquet(out)
    bands = {r.id: r.band for r in back.collect()}
    assert bands == {1: "band_95_100", 2: "band_90_95", 3: "band_50_60", 4: "band_none"}


def test_band_reprocess_and_merge(spark, tmp_path):
    """D2/D3 verbs: split → reprocess one band → sync back by id."""
    from ai_bangladesh_address_parser_spark.sources.pages import (
        merge_by_id,
        read_band,
        write_banded,
    )

    master = spark.createDataFrame(
        [(1, "a", 0.97), (2, "b", 0.91), (3, "c", 0.55), (4, "d", 0.52)],
        "id bigint, payload string, overall_confidence double",
    )
    out = str(tmp_path / "bands")
    write_banded(master, out)
    band = read_band(spark, out, "band_50_60")
    assert {r.id for r in band.collect()} == {3, 4}
    # "reprocess": fix the low-confidence rows
    fixed = band.select("id", F.upper("payload").alias("payload"),
                        F.lit(0.96).alias("overall_confidence"))
    merged = merge_by_id(master, fixed, "id")
    got = {r.id: (r.payload, r.overall_confidence) for r in merged.collect()}
    assert got[3] == ("C", 0.96) and got[4] == ("D", 0.96)
    assert got[1] == ("a", 0.97) and merged.count() == 4


def test_minhash_bands_divisibility_validated(spark, docs):
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_band_pairs(docs, n_hashes=8, bands=3)


def test_simhash_keeps_tokenless_docs(spark):
    df = spark.createDataFrame(
        [(0, "!!!"), (1, "..."), (2, ""), (3, "real words here")],
        "doc_id bigint, text string",
    )
    sh = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert set(sh) == {0, 1, 2, 3}          # nothing vanishes
    assert sh[0] == sh[1] == sh[2] == 0     # token-less docs: signature 0
    pairs = {(r.id_a, r.id_b) for r in
             dedup.simhash_near_pairs(df, max_hamming=3).collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= pairs  # identical empties ARE near-dups


def test_embedding_neardup_multi_table_recall(spark):
    import math

    # ring of unit vectors: consecutive ids are near-dups (cos ~0.9998)
    rows = []
    for i in range(120):
        theta = i * 0.02
        vec = [math.cos(theta), math.sin(theta)] + [0.0] * 6
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").cache()
    # brute-force truth: all pairs with cosine >= threshold
    a = emb.selectExpr("vec_id as id_a", "embedding as va")
    b = emb.selectExpr("vec_id as id_b", "embedding as vb")
    bf = (a.crossJoin(b).filter("id_a < id_b")
          .withColumn("cos", similarity.cosine_expr(F.col("va"), F.col("vb")))
          .filter("cos >= 0.999"))
    want = {(r.id_a, r.id_b) for r in bf.collect()}
    got1 = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(
        emb, threshold=0.999, n_planes=8, n_tables=1).collect()}
    got4 = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(
        emb, threshold=0.999, n_planes=8, n_tables=4).collect()}
    assert got1 <= want and got4 <= want      # no false positives ever
    r1 = len(got1) / len(want)
    r4 = len(got4) / len(want)
    assert r4 >= r1                           # OR-construction only adds recall
    assert r4 >= 0.8, (r1, r4)                # 4 tables reach useful recall


def test_embedding_dim_mismatch_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.0])]  # a 2-dim stray among 4-dim vectors
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(Exception, match="dim mismatch"):
        similarity.embedding_near_dup_pairs(emb, threshold=0.5, dim=4).collect()
    with pytest.raises(Exception, match="dim mismatch"):
        similarity.lsh_topk(emb, emb.limit(1), k=2, dim=4).collect()


def test_langid_gibberish_is_und(spark):
    from ai_bangladesh_address_parser_spark.operators.text_analysis import (
        langid_cols,
    )

    df = spark.createDataFrame(
        [(0, "asdfgh qwerty zxcvb"),        # Latin gibberish: no stopwords
         (1, "the committee met today"),     # real English
         (2, "12345 67890"),                 # digits only: no letters
         (3, "")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.lang for r in df.select(
        "doc_id", langid_cols("text")["pred_lang"].alias("lang")).collect()}
    assert got == {0: "und", 1: "en", 2: "und", 3: "und"}


def test_frame_sample_zero_byte_payload(spark):
    from ai_bangladesh_address_parser_spark.operators.multimodal import (
        frame_sample_plan,
    )

    media = spark.createDataFrame(
        [("m0", {"n_bytes": 0}), ("m1", {"n_bytes": 600})],
        "media_id string, meta struct<n_bytes:bigint>",
    )
    rows = frame_sample_plan(media, every_n_bytes=256, max_frames=8).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.byte_offset)
    assert "m0" not in by_id                 # no frames for no bytes
    assert by_id["m1"] == [0, 256, 512]


def test_shingles_expr_matches_python_reference(spark):
    """Property check for the zip_with shingle rewrite: on 300 seeded
    random strings (ASCII/Bangla/punctuation soup, length 0-200) the
    Spark expression equals a straightforward Python reference of the
    documented semantics (distinct space-joined k-token shingles;
    whole-text fallback below k tokens)."""
    import random
    import re

    rng = random.Random(20260819)
    alphabet = "abc ঢaকা01 ,.!-\t\n"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
             for _ in range(300)]

    def py_shingles(t, k=3):
        toks = [w for w in re.split(r"[^a-z0-9ঀ-৿]+", t.lower()) if w]
        if len(toks) >= k:
            out = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        else:
            out = [" ".join(toks)]
        seen, dedup_ = set(), []
        for s in out:
            if s not in seen:
                seen.add(s)
                dedup_.append(s)
        return dedup_

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: list(r.s) for r in
           df.select("i", dedup.shingles_expr("t").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_shingles(t), (i, repr(t), got[i], py_shingles(t))


def test_repetition_cols_known_fractions(spark):
    """Hand-checked line-repetition signals: fractions, trailing-space
    robustness (line identity survives spaces around newlines), and
    the empty/no-newline degenerate cases."""
    from ai_bangladesh_address_parser_spark.operators.text_analysis import (
        repetition_cols,
    )

    rows = [
        # 4 lines, "dup me" repeats once: dup_line_frac = 1/4;
        # chars: 6+10+6+10 = 32 total, the repeated "dup me" (6) dup'd
        (0, "dup me\nunique one\ndup me \nunique two"),
        (1, "single line only"),           # 1 line, no newline -> 0.0
        (2, ""),                           # empty -> 0 lines, 0.0
        (3, "a\na\na\na"),                 # all same: 3/4 dup, 3/4 chars
        (4, "  padded \n padded\nother"),  # trim: 'padded' == 'padded'
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = repetition_cols("text")
    got = {r.doc_id: r for r in df.select(
        "doc_id", cols["n_lines"].alias("n"),
        cols["dup_line_frac"].alias("f"),
        cols["dup_line_char_frac"].alias("cf")).collect()}
    assert (got[0].n, got[0].f, got[0].cf) == (4, 0.25, round(6 / 32, 6))
    assert (got[1].n, got[1].f, got[1].cf) == (1, 0.0, 0.0)
    assert (got[2].n, got[2].f, got[2].cf) == (0, 0.0, 0.0)
    assert (got[3].n, got[3].f, got[3].cf) == (4, 0.75, 0.75)
    assert (got[4].n, got[4].f) == (3, round(1 / 3, 6))


def test_top_ngram_matches_brute_force(spark):
    """top_ngram == a Python brute-force count (same tokenization,
    same highest-count / lexicographically-greatest tie-break) on a
    mixed corpus; <n-token docs are absent."""
    import re
    from collections import Counter

    from ai_bangladesh_address_parser_spark.operators.text_analysis import top_ngram

    texts = {
        0: "spark spark spark spark",            # 'spark spark' x3
        1: "a b a b a b c",                       # 'a b' beats 'b a'
        2: "tie one tie two tie one tie two",     # real tie-break case
        3: "solo",                                # 1 token -> absent
        4: "",                                    # 0 tokens -> absent
        5: "ঢাকা শহর ঢাকা শহর ভাল",               # bangla
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    got = {r.doc_id: r for r in top_ngram(df, "doc_id", "text", n=2).collect()}
    assert set(got) == {0, 1, 2, 5}

    for did in sorted(got):
        toks = [w for w in re.split(r"[^a-z0-9ঀ-৿]+", texts[did].lower()) if w]
        counts = Counter(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        r = got[did]
        assert (r.top_gram, r.gram_count) == (best[0], best[1]), (did, r)
        tok_chars = sum(len(t) for t in toks)
        expect_frac = round(best[1] * len(best[0].replace(" ", "")) / tok_chars, 6)
        assert r.top_gram_char_frac == expect_frac, (did, r)


def test_repeated_paragraphs_cross_corpus(spark):
    """Boilerplate lines shared across docs are found with exact doc /
    occurrence counts; within-doc-only repeats respect min_docs."""
    from ai_bangladesh_address_parser_spark.operators.text_analysis import (
        repeated_paragraphs,
    )

    rows = [
        (0, "real content zero\nsubscribe now\nmore zero"),
        (1, "real content one\nsubscribe now"),
        (2, "subscribe now\nreal content two\nsubscribe now"),
        (3, "only here\nonly here"),  # repeats within ONE doc only
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.paragraph: r for r in repeated_paragraphs(df, min_docs=2).collect()}
    assert set(got) == {"subscribe now"}
    assert got["subscribe now"].n_docs == 3
    assert got["subscribe now"].n_occurrences == 4
    # min_docs=1 surfaces the within-doc repeat too
    got1 = {r.paragraph: (r.n_docs, r.n_occurrences)
            for r in repeated_paragraphs(df, min_docs=1).collect()}
    assert got1["only here"] == (1, 2)


def test_ngrams_expr_counts_positions(spark):
    """ngrams_expr is positional (non-distinct) and empty below k —
    the counting contract top_ngram depends on."""
    df = spark.createDataFrame(
        [(0, "x y x y"), (1, "x"), (2, "")], "doc_id bigint, text string")
    got = {r.doc_id: list(r.g) for r in df.select(
        "doc_id", dedup.ngrams_expr("text", 2).alias("g")).collect()}
    assert got[0] == ["x y", "y x", "x y"]
    assert got[1] == [] and got[2] == []


def test_ivf_trained_recall_vs_brute_force(spark, sf_dir):
    """IVF with a k-means-trained quantizer: recall@10 vs the exact
    baseline on the embeddings table must beat the data-independent
    hash-centroid quantizer at equal (n_cells, nprobe) budget — the
    training is what makes the inverted lists track the data — and
    clear an absolute floor. Also pins trainer determinism (two
    trainings bit-equal)."""
    import os

    from ai_bangladesh_address_parser_spark.operators.similarity import (
        brute_force_topk,
        hash_centroids,
        ivf_topk,
        train_centroids,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    q = e.filter(F.col("vec_id") < 20)

    truth = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(e, q, k=10).collect()}

    trained = train_centroids(e, n_centroids=8, n_iters=10, sample_n=256)
    assert trained == train_centroids(e, n_centroids=8, n_iters=10, sample_n=256)

    def recall(cents):
        got = {(r.query_id, r.neighbor_id)
               for r in ivf_topk(e, q, cents, k=10, nprobe=2).collect()}
        return len(got & truth) / len(truth)

    r_trained = recall(trained)
    r_hash = recall(hash_centroids(8, 64))
    assert r_trained >= r_hash, (r_trained, r_hash)
    assert r_trained >= 0.6, r_trained
    # full probe budget == exact: nprobe = n_cells scores everything
    r_full = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(e, q, trained, k=10, nprobe=8).collect()}
    assert r_full == truth
    # nprobe > n_cells clamps to a full probe instead of a runtime
    # slice() error (r04 ADVICE low)
    r_over = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(e, q, trained, k=10, nprobe=99).collect()}
    assert r_over == truth


def test_train_centroids_degenerate_samples(spark):
    """Trainer guards (r04 ADVICE low): an empty corpus raises a clear
    error, and a sample smaller than n_centroids seeds the shortfall
    from the hash-centroid table instead of duplicating rows."""
    import pytest as _pytest

    from ai_bangladesh_address_parser_spark.operators.similarity import (
        train_centroids,
    )

    schema = "vec_id bigint, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    with _pytest.raises(ValueError, match="empty"):
        train_centroids(empty, n_centroids=4)

    two = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])], schema
    )
    cents = train_centroids(two, n_centroids=4, n_iters=2)
    assert len(cents) == 4
    # no two centroids identical (the linspace-duplication failure)
    assert len({tuple(round(x, 9) for x in c) for c in cents}) == 4


def test_contamination_known_overlaps(spark):
    """Hand-checked contamination fractions: benchmark members are
    fully contaminated, partial overlaps count matching shingles only,
    disjoint docs report 0.0, and the broadcast toggle is value-
    neutral."""
    from ai_bangladesh_address_parser_spark.operators.text_analysis import (
        contamination,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),      # benchmark member
            (1, "alpha beta gamma zeta eta"),           # shares 1 of 3 shingles
            (2, "one two three four five"),             # disjoint
            (3, "alpha beta gamma delta epsilon"),      # exact copy of bench
        ],
        "doc_id bigint, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    got = {r.doc_id: r for r in contamination(docs, bench, k=3).collect()}
    assert (got[0].n_shingles, got[0].contamination_frac) == (3, 1.0)
    assert (got[1].n_shingles, got[1].n_contaminated) == (3, 1)
    assert got[1].contamination_frac == round(1 / 3, 6)
    assert got[2].contamination_frac == 0.0
    assert got[3].contamination_frac == 1.0
    got2 = {r.doc_id: (r.n_shingles, r.n_contaminated)
            for r in contamination(docs, bench, k=3,
                                   broadcast_benchmark=False).collect()}
    assert got2 == {d: (r.n_shingles, r.n_contaminated) for d, r in got.items()}


def test_pii_redaction_rules(spark):
    """Category-by-category PII checks: counts on the progressively
    redacted chain (an email's digits never double-count as a phone),
    postal codes and house numbers untouched, all three tokens
    substituted."""
    from ai_bangladesh_address_parser_spark.operators.text_analysis import pii_cols

    rows = [
        (0, "reach me at jane.doe+x@mail.example.org or 01712345678"),
        (1, "server 192.168.0.1 and backup 10.0.255.254"),
        (2, "a01812345678@example.com has a phone-shaped local part"),
        (3, "House 11, Road 4, Dhanmondi, Dhaka 1209"),  # no PII
        (4, "+8801912345678 and 8801512345678 and 01312345678"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = pii_cols("text")
    got = {r.doc_id: r for r in df.select(
        "doc_id", cols["n_emails"].alias("e"), cols["n_ips"].alias("i"),
        cols["n_phones"].alias("p"), cols["redacted"].alias("red")).collect()}
    assert (got[0].e, got[0].p) == (1, 1)
    assert got[0].red == "reach me at <EMAIL> or <PHONE>"
    assert got[1].i == 2 and got[1].red == "server <IP> and backup <IP>"
    # the phone-shaped digits live INSIDE the email: counted once as
    # email, zero times as phone
    assert (got[2].e, got[2].p) == (1, 0)
    assert got[2].red.startswith("<EMAIL> has")
    assert (got[3].e, got[3].i, got[3].p) == (0, 0, 0)
    assert got[3].red == rows[3][1]
    assert got[4].p == 3 and got[4].red == "<PHONE> and <PHONE> and <PHONE>"
