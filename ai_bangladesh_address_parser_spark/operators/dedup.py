"""Corpus deduplication family — exact, MinHash+LSH, SimHash, n-gram
Jaccard.

These are the web-corpus operators a 100 TB training-data pipeline runs
before/alongside entity linkage (the reference dedups implicitly via
its LRU cache key, extractor.py:129-137; at corpus scale dedup is a
first-class job). All variants are pure DataFrame ops:

  * hashing is **md5-derived 56-bit integers** (`conv(substr(md5(x),
    1,14),16,10)`) — portable bit-for-bit to DuckDB/Trino/anything with
    md5, so every operator here is verifiable against an external SQL
    oracle, and deterministic across runs/partitions (north_rule
    determinism discipline);
  * candidate generation is explode → equi-join on content keys — the
    shuffle key is the content hash, so skew only occurs for genuinely
    repeated content (handled by AQE skew-join; degenerate shingles can
    be capped like hot blocks in ``operators.blocking``);
  * nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIMHASH_BITS = 56  # md5-derived hashes are 56-bit (14 hex chars)


def md5_hash64(c: Column | str) -> Column:
    """Portable 56-bit integer hash: first 14 hex chars of md5."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("bigint")


def tokens_expr(c: Column | str) -> Column:
    """Lowercase word tokens (non-empty)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), r"[^a-z0-9ঀ-৿]+"), lambda t: t != "")


def shingles_expr(c: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined)."""
    toks = tokens_expr(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.array_join(toks, " "))))


# --- exact -----------------------------------------------------------------

def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup → one row per content group:
    (content_hash, n_docs, keep_id = min id). Map-side partial
    aggregation makes this one cheap shuffle of (hash, id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("_id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("_id").alias("keep_id"))
    )


def drop_exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative of each exact-content group."""
    w = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    )
    return docs.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")


# --- minhash + LSH ---------------------------------------------------------

def minhash_sig_expr(text_col: str, n_hashes: int = 8, shingle_k: int = 3) -> Column:
    """array<bigint> minhash signature over k-token shingles.

    Built as one SQL-parsed expression with named lambda variables (see
    operators.blocking.minhash_signature_expr for why not Column-API
    lambdas). Seeds are the integers 0..n-1 — fixed, portable.
    """
    sh = (
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {shingle_k - 1}, 1)),"
        f" i -> array_join(slice(_toks, i, {shingle_k}), ' ')))"
    )
    toks = (
        f"filter(split(lower(`{text_col}`), '[^a-z0-9\\\\u0980-\\\\u09ff]+'), t -> t != '')"
    )
    return F.expr(
        f"transform(sequence(0, {n_hashes - 1}), s -> "
        f"array_min(transform({sh.replace('_toks', toks)}, "
        f"w -> cast(conv(substring(md5(concat(cast(s as string), '|', w)), 1, 14), 16, 10) as bigint))))"
    )


def minhash_band_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 minhash band → (id_a, id_b),
    id_a < id_b, distinct. b bands × r = n/b rows; P(candidate) ≈
    1 − (1 − J^r)^b."""
    r = n_hashes // bands
    sig = minhash_sig_expr(text_col, n_hashes, shingle_k)
    d = docs.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
    band_key = F.concat_ws(
        ",",
        F.col("band").cast("string"),
        *[F.element_at("_sig", F.col("band") * r + j + 1).cast("string") for j in range(r)],
    )
    keyed = d.select(
        "_id", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    ).join(d, "_id").select("_id", band_key.alias("band_key"))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


# --- simhash ---------------------------------------------------------------

def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """56-bit SimHash per doc → (id, simhash).

    Long-format plan: explode distinct tokens → token hash → explode bit
    positions → signed vote per (doc, bit) → assemble bits. Two
    map-side-combinable aggregations; scales linearly in corpus token
    count."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    ).withColumn("h", md5_hash64("tok"))
    votes = (
        toks.select(
            "_id",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
            "h",
        )
        .withColumn(
            # SQL-parsed: the PySpark shiftright wrapper only takes a
            # literal int offset, the SQL function takes any expression
            "vote",
            F.when(F.expr("shiftright(h, bit) % 2") == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy("_id", "bit")
        .agg(F.sum("vote").alias("s"))
    )
    return (
        votes.groupBy("_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(F.lit(0))
            ).alias("simhash")
        )
        .select(F.col("_id").alias(id_col), "simhash")
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via the
    pigeonhole block trick: split the 56 bits into ``n_blocks`` bands;
    any pair within distance ≤ n_blocks−1 shares at least one exact
    band → band equi-join, then exact Hamming filter via bit_count."""
    sh = simhash(docs, id_col, text_col)
    width = SIMHASH_BITS // n_blocks
    mask = (1 << width) - 1
    bands = sh.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, blk * {width}) & {mask}"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["blk", "band_val"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- n-gram jaccard --------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 10_000,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold, via the standard
    scalable plan: explode shingles → self-join on shingle (counts
    |A∩B|) → join per-doc set sizes → J = ∩ / (|A|+|B|−∩).

    ``max_shingle_freq`` drops degenerate shingles (boilerplate shared
    by >N docs) before the quadratic join — the dedup analogue of the
    hot-block cap in ``operators.blocking.candidate_pairs``."""
    sh = docs.select(
        F.col(id_col).alias("_id"), F.explode(shingles_expr(text_col, shingle_k)).alias("sh")
    )
    if max_shingle_freq:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n"))
        sh = sh.join(F.broadcast(freq.filter(F.col("n") > max_shingle_freq)), "sh", "left_anti")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
