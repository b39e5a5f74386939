"""Similarity search over embedding columns (`array<float>`).

Three paths, per the scale playbook:

  * **Brute-force cosine top-k** — the exactness baseline: broadcast
    the (small) query set, one narrow pass over the corpus computing
    dot products with JVM higher-order functions (no Python), window
    top-k per query. Linear in |corpus|·|queries| — correct tool when
    queries are few.
  * **LSH-bucketed top-k** — the 100 TB path: deterministic
    random-hyperplane signs derived from md5 (portable, seedless),
    corpus hashed once into 2^n_planes buckets, queries probe their
    bucket (+ optional multi-probe neighbors at Hamming distance 1),
    scoring only within buckets. Sub-linear candidate volume; recall
    tested against the brute-force baseline in pytest.
  * **IVF top-k** — the trained-quantizer 100 TB path: a spherical
    k-means coarse quantizer (bounded driver-side training on a
    deterministic sample; assignment fully distributed) partitions
    the corpus into inverted lists; queries probe their ``nprobe``
    best cells. Candidate volume ≈ nprobe/n_cells per query with
    data-balanced lists where hyperplane buckets skew.

Embedding dims: the bucket fast path embeds the plane signs as literal
arrays, which requires ONE dim per call — passed explicitly or inferred
from the first corpus row. Rows whose ``size(embedding)`` disagrees
fail loudly (``raise_error`` inside the bucket projection, no extra
scan) instead of silently hashing to bucket 0 through null-padded
``zip_with``; a mixed-dim corpus (two encoder versions) must be
partitioned by dim by the caller.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank, cosine): exact top-k neighbors of
    each query among corpus rows (self-hits excluded).

    The query side is broadcast — the join is narrow over the corpus;
    the only shuffle is the per-query top-k window (tiny: k rows per
    query survive the local partial sort under AQE)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def plane_sign(p: int, i: int) -> int:
    """±1 from the parity of md5(f'{p}|{i}') — the deterministic,
    engine-portable plane-weight rule (same value the previous
    expression computed per ROW; see hyperplane_bucket_expr)."""
    return (int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:14], 16) % 2) * 2 - 1


def hyperplane_bucket_expr(
    vec_col: str, n_planes: int = 8, dim: int | None = None, plane_offset: int = 0
) -> Column:
    """Deterministic sign-random-projection bucket id in [0, 2^n).

    Plane p's weight for dimension i is ±1 from the parity of the
    md5-derived hash of ``p|i`` — no RNG, no stored plane matrix,
    identical across runs/partitions/engines.

    ``dim`` REQUIRED for the fast path: the plane signs are
    row-independent, so they are computed ONCE on the driver and
    embedded as literal arrays — the per-row cost is one zip_with
    multiply-add per plane. (The previous form evaluated n_planes × dim
    md5 calls PER ROW — 6,144 md5/row for a 768-dim embedding.)
    ``dim=None`` falls back to the in-expression md5 for callers that
    genuinely cannot know the dimension; identical results, slow.

    ``plane_offset`` shifts the plane-id space — table t of a multi-
    table LSH uses planes ``[t·n, (t+1)·n)`` so its signs are
    independent of every other table's while staying deterministic.
    """
    parts = []
    if dim is not None:
        v = F.col(vec_col).cast("array<double>")
        for p in range(n_planes):
            signs = F.array(*[
                F.lit(float(plane_sign(p + plane_offset, i))) for i in range(dim)
            ])
            dot = F.aggregate(
                F.zip_with(v, signs, lambda x, s: x * s),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            parts.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        return sum(parts[1:], parts[0]).alias("bucket")
    for p in range(n_planes):
        dot = F.expr(
            f"aggregate(zip_with(cast(`{vec_col}` as array<double>), "
            f"sequence(0, size(`{vec_col}`) - 1), (x, i) -> "
            f"x * (cast(conv(substring(md5(concat('{p + plane_offset}', '|', cast(i as string))), 1, 14), 16, 10) as bigint) % 2 * 2 - 1)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        parts.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(parts[1:], parts[0]).alias("bucket")


def _dim_checked(expr: Column, vec_col: str, dim: int) -> Column:
    """Fail loudly on rows whose embedding length disagrees with the
    plane-sign dim: a null-padded ``zip_with`` dot is null, every sign
    bit reads 0, and the row silently lands in bucket 0 with garbage
    neighbors. The guard rides the same projection — no extra scan."""
    return F.when(F.size(F.col(vec_col)) == dim, expr).otherwise(
        F.raise_error(F.concat(
            F.lit(f"embedding dim mismatch: plane signs built for dim={dim}, row has "),
            F.size(F.col(vec_col)).cast("string"),
        ))
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).first()
    return row["d"] if row else None


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's bucket
    (plus, with ``multiprobe``, the n_planes buckets at Hamming
    distance 1 — the standard recall knob). Same output schema as
    :func:`brute_force_topk`. ``dim`` (inferred from one corpus row if
    omitted) enables the literal-signs fast path."""
    dim = dim if dim is not None else _infer_dim(corpus, vec_col)
    bucket = hyperplane_bucket_expr(vec_col, n_planes, dim=dim)
    if dim is not None:
        bucket = _dim_checked(bucket, vec_col, dim).alias("bucket")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), bucket)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), bucket)
    if multiprobe:
        # SQL-parsed (shiftleft with a non-literal offset has no Column
        # API): probe own bucket + all buckets at Hamming distance 1
        probes = F.expr(
            f"concat(array(bucket), transform(sequence(0, {n_planes - 1}), "
            f"p -> bucket ^ shiftleft(1, p)))"
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        c.join(q.hint("shuffle_hash"), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def centroid_weight(c: int, i: int) -> float:
    """Deterministic pseudo-random centroid component in [-1, 1] from
    md5 of ``c|i`` — the data-independent twin of :func:`plane_sign`,
    used where an engine-portable literal quantizer is needed (driver
    queries with SQL oracles). Real deployments train with
    :func:`train_centroids` instead."""
    h = int(hashlib.md5(f"c|{c}|{i}".encode()).hexdigest()[:14], 16)
    return (h % 2001 - 1000) / 1000.0


def hash_centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """Unit-normalized deterministic centroids (no data, no RNG)."""
    out = []
    for c in range(n_centroids):
        v = [centroid_weight(c, i) for i in range(dim)]
        n = sum(x * x for x in v) ** 0.5 or 1.0
        out.append([x / n for x in v])
    return out


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 10,
    sample_n: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer, trained on a deterministic
    driver-side sample — the standard IVF recipe: training cost is
    bounded by ``sample_n`` regardless of corpus size (at 100 TB,
    assignment is the distributed pass; training a 2^14-cell quantizer
    on a 10^5-row sample is driver work). Determinism: the sample is
    the ``sample_n`` smallest ids (one distributed partial top-k, no
    RNG), init is ``n_centroids`` evenly spaced rows of that sorted
    sample, and Lloyd iterations run in numpy with fixed order — the
    same corpus always yields bit-identical centroids, so downstream
    plans (and resumed runs) agree. Empty cells re-seed from the
    hash-centroid table. Returns unit-normalized centroids (cosine
    assignment == dot with unit centroids)."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_centroids: corpus sample is empty — nothing to train on "
            "(check the corpus DataFrame / vec_col)"
        )
    x = np.asarray([list(r._v) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    fallback = np.asarray(hash_centroids(n_centroids, dim))
    if len(x) < n_centroids:
        # fewer sample rows than cells: linspace init would duplicate
        # rows (degenerate identical centroids). Seed the shortfall
        # from the deterministic hash-centroid table instead.
        cent = np.concatenate([x, fallback[len(x):]])
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
        )
    else:
        idx = np.linspace(0, len(x) - 1, n_centroids).astype(int)
        cent = x[idx].copy()
    for _ in range(n_iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = x[assign == c]
            cent[c] = m.mean(axis=0) if len(m) else fallback[c]
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent.tolist()


def _cell_scores_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """array<struct<dot, cell>>: the query/corpus row's dot product
    with every (unit) centroid, as literal-array zip_with folds — the
    same literal-embedding trick as the LSH plane signs; no Python,
    no stored model table, plan-embedded quantizer."""
    v = F.col(vec_col).cast("array<double>")
    return F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(w)) for w in c]),
                           lambda x, w: x * w),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("dot"),
            F.lit(ci).alias("cell"),
        )
        for ci, c in enumerate(centroids)
    ])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the third ANN path next
    to :func:`brute_force_topk` (exact) and :func:`lsh_topk` (hash
    buckets). Corpus rows are assigned to their max-cosine coarse cell
    (one narrow pass; ``argmax`` = ``array_max`` over the literal
    centroid dots — deterministic tie-break to the larger cell id);
    each query probes its ``nprobe`` best cells and scores only those
    inverted lists. Candidate volume ≈ nprobe/n_centroids of the
    corpus per query vs LSH's bucket-occupancy-dependent volume —
    IVF's advantage is that trained cells track the data distribution
    (see :func:`train_centroids`), so list sizes stay balanced where
    hyperplane buckets skew. Same output schema and ranking contract
    as the other two paths; recall is measured against brute force in
    pytest."""
    dim = len(centroids[0])
    # nprobe > n_cells would make the slice start non-positive and
    # throw at runtime; degrade to a full probe instead
    nprobe = min(nprobe, len(centroids))
    scores = _cell_scores_expr(vec_col, centroids)
    cell = _dim_checked(F.array_max(scores)["cell"], vec_col, dim).alias("cell")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), cell
    )
    # top-nprobe cells: lexicographic array_sort on (dot, cell) then
    # take the tail — same (dot desc, cell desc) order the oracle ranks
    probes = F.slice(
        F.array_sort(scores), len(centroids) - nprobe + 1, nprobe
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            _dim_checked(F.transform(probes, lambda s: s["cell"]), vec_col, dim)
        ).alias("cell"),
    )
    scored = (
        c.join(q.hint("shuffle_hash"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("_qv").cast("array<double>"),
                                          F.col("_cv").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table bucket
    self-join → cosine ≥ threshold. The embedding-space member of the
    dedup family in ``operators.dedup``.

    ``n_tables`` independent hash tables (table t uses planes
    ``[t·n_planes, (t+1)·n_planes)``) are the OR-construction — the same
    recall device as ``minhash_band_pairs``'s b bands. A single 8-plane
    table keeps a cosine-0.95 pair with probability only
    (1−θ/π)^8 ≈ 0.43; four tables lift that to 1−(1−0.43)^4 ≈ 0.89.
    Per-row cost is n_tables × n_planes literal-sign dots; join volume
    is one row per (table, bucket) membership, deduped by the final
    ``distinct``. Exact recall on a given corpus is measurable against
    ``brute_force_topk`` (pytest does)."""
    dim = dim if dim is not None else _infer_dim(corpus, vec_col)
    buckets = F.array(*[
        hyperplane_bucket_expr(vec_col, n_planes, dim=dim, plane_offset=t * n_planes)
        for t in range(n_tables)
    ])
    if dim is not None:
        buckets = _dim_checked(buckets, vec_col, dim)
    d = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(buckets).alias("tbl", "bucket"),
    )
    from .blocking import expansion_repartition

    # explicit-count repartition so AQE cannot coalesce the bucket
    # exchange down to the tiny membership-table size and serialize the
    # pair expansion (see blocking.expansion_repartition)
    d = expansion_repartition(d, "tbl", "bucket")
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .withColumn("cosine", cosine_expr(F.col("a._v").cast("array<double>"), F.col("b._v").cast("array<double>")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "cosine")
        .distinct()
    )
