"""Similarity search over embedding columns (array<float>).

Two paths:
* brute_force_topk — exact cosine top-k of every query against the corpus.
  The dot product is a native ``F.aggregate``/``zip_with`` fold (JVM-side,
  no Python); top-k per query via window row_number. Baseline / oracle.
* lsh_topk — random-hyperplane LSH (sign of dot with deterministic
  hyperplanes derived from xxhash64 seeds — no RNG state to ship) buckets
  the corpus; each query only scores its bucket cohort, multiprobe over
  ``n_tables`` tables. The scale path: corpus scan is hash-partitioned by
  bucket and each query touches a small cohort instead of the full corpus.

Both are deterministic. Scores are rounded to 6 dp to make results stable
under float reassociation across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k: [query_id, vec_id, score, rank]. The corpus side is the
    big side; queries are broadcast (typical ANN serving shape)."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "score", F.round(cosine_col(F.col("_qv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def _hyperplane_sketch(vec: Column, n_planes: int, table: int) -> Column:
    """Sign sketch: bit p = (sum_i v_i * h(i, p, table) > 0), with
    pseudo-random +/-1 weights derived from xxhash64 of (index, plane,
    table) — deterministic, shipped as code not data."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda i: F.when(
                        F.xxhash64(i, F.lit(p), F.lit(table)).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda v, w: v * w,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    code = bits[0]
    for b in bits[1:]:
        code = code + b
    return code


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing.

    Recall improves with n_tables (union of cohorts); cost per query is the
    cohort size, not the corpus size.
    """
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv"))

    c_buckets = c.select(
        id_col, "_cv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _hyperplane_sketch(F.col("_cv"), n_planes, t).alias("b"))
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select(id_col, "_cv", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    q_buckets = q.select(
        query_id_col, "_qv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _hyperplane_sketch(F.col("_qv"), n_planes, t).alias("b"))
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select(query_id_col, "_qv", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))

    cohort = c_buckets.join(F.broadcast(q_buckets), ["_t", "_b"]).dropDuplicates(
        [query_id_col, id_col]
    )
    scored = cohort.withColumn(
        "score", F.round(cosine_col(F.col("_qv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_size: int = 500,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the LSH cohort join:
    [id_a, id_b, score] with score >= threshold, id_a < id_b."""
    from payor_mdm_spark.operators.blocking import _pairs_within_blocks

    c = corpus.select(
        F.col(id_col).alias("source_record_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    members = c.select(
        "source_record_id", "_cv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _hyperplane_sketch(F.col("_cv"), n_planes, t).alias("b"))
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select(
        F.col("_tb.t").alias("_band"), F.col("_tb.b").alias("_bucket"),
        "source_record_id",
    )
    cands = (
        _pairs_within_blocks(members, ["_band", "_bucket"], "emb_lsh", max_block_size)
        .select(
            F.col("source_record_id_a").alias("id_a"),
            F.col("source_record_id_b").alias("id_b"),
        )
        .distinct()
    )
    a = c.select(F.col("source_record_id").alias("id_a"), F.col("_cv").alias("_va"))
    b = c.select(F.col("source_record_id").alias("id_b"), F.col("_cv").alias("_vb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("score", F.round(cosine_col(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
