"""Similarity search over embedding columns (array<float>).

Two paths per the task brief:
- brute-force cosine top-k — the correctness baseline, pure JVM array
  expressions (zip_with product + ordered aggregate sum, so the float64
  accumulation order is fixed and matches the DuckDB twin's
  sequential list_inner_product);
- LSH-bucketed variant — the scale path: sign-bucket vectors against a
  fixed set of random hyperplanes (seeded, passed as literals so the
  oracle uses bit-identical planes), prune to the query's bucket, then
  exact cosine inside the bucket.

A vectorized mapInPandas top-k (np matmul per Arrow batch + partial
top-k + global merge) is provided for throughput; the expression path
stays the contract surface because BLAS accumulation order is not
bit-stable across libraries.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _as_double(col: str = "embedding") -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _lit_array(vals: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential float64 dot product (index order, like the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(vals: Sequence[float]) -> float:
    acc = 0.0
    for v in vals:
        acc += float(v) * float(v)
    return math.sqrt(acc)


def cosine_col(vec: Column, qvec: Sequence[float]) -> Column:
    """cos(v, q) with the query norm folded in driver-side (the same
    float64 constant lands in the SQL twin)."""
    q = _lit_array(qvec)
    nq = norm(qvec)
    nv = F.sqrt(dot_expr(vec, vec))
    return dot_expr(vec, q) / (nv * F.lit(nq))


def cosine_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, cos_sim): brute-force baseline, quantized ranking
    contract (round 6, tiebreak vec_id asc)."""
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    scored = df.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_col(_as_double(vec_col), qvec), 6).alias("cos_sim"),
    )
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "cos_sim")
    )


def bucket_col(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bucket string, one char per hyperplane."""
    chars = [
        F.when(dot_expr(vec, _lit_array(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*chars)


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def bucket_of(vec: Sequence[float], planes: Sequence[Sequence[float]]) -> str:
    out = []
    for p in planes:
        acc = 0.0
        for x, y in zip(vec, p):
            acc += float(x) * float(y)
        out.append("1" if acc >= 0 else "0")
    return "".join(out)


def lsh_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: prune to the query's sign bucket (the scan does |corpus| dot
    products against n_planes vectors but shuffles only the bucket),
    then exact cosine top-k inside the bucket."""
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    qb = bucket_of(qvec, planes)
    in_bucket = df.filter(bucket_col(_as_double(vec_col), planes) == qb)
    return cosine_topk(in_bucket, qvec, k, None, id_col, vec_col)


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    planes: Sequence[Sequence[float]],
    bands: int = 4,
    max_vec_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate (vec_a < vec_b, cos_sim >= threshold) pairs via
    banded sign-bucket LSH — the 100 TB shape: candidates come from
    EQUI-JOINS on (band, bucket), never a cross product.

    ``planes`` is split into ``bands`` groups; two vectors are
    candidates when they fall in the same bucket of ANY band (OR over
    bands recovers recall the single-bucket AND would lose). Exact
    cosine is then computed for candidates only. Recall is tunable via
    bands x planes-per-band; the exact all-pairs variant
    (neardup_pairs_exact) remains the test oracle for small subsets.
    """
    df = embeddings
    if max_vec_id is not None:
        df = df.filter(F.col(id_col) < max_vec_id)
    per_band = len(planes) // bands
    sub = df.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"))
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            bucket_col(F.col("v"), planes[bi * per_band : (bi + 1) * per_band]).alias("key"),
        )
        for bi in range(bands)
    ]
    # banding shuffles IDS ONLY (r6): the 64-float vectors used to ride
    # the band explode and both self-join sides (4x payload duplication
    # through the exchange — the guide §8 anti-pattern); candidate ids
    # are decided on a few bytes per row, then the vectors re-attach
    # with two equi-joins against the narrow embedding scan (AQE
    # broadcasts the candidate side when small; the corpus side is
    # scanned, never shuffled).
    banded = sub.select(
        "vid", "v", F.explode(F.array(*band_structs)).alias("b")
    ).select("vid", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = banded.select(F.col("vid").alias("vec_a"), "band", "key")
    b = banded.select(F.col("vid").alias("vec_b"), "band", "key")
    ids = (
        a.join(b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    pairs = ids.join(
        sub.select(F.col("vid").alias("vec_a"), F.col("v").alias("va")), "vec_a"
    ).join(sub.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
    cos = dot_expr(F.col("va"), F.col("vb")) / (
        F.sqrt(dot_expr(F.col("va"), F.col("va"))) * F.sqrt(dot_expr(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def neardup_pairs_exact(
    embeddings: DataFrame,
    threshold: float,
    max_vec_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs variant — a bounded cross product usable ONLY on
    small id subsets (tests/recall measurement); production near-dup
    goes through the banded LSH path above."""
    sub = embeddings.filter(F.col(id_col) < max_vec_id).select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
    )
    a = sub.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    b = sub.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = dot_expr(F.col("va"), F.col("vb")) / (
        F.sqrt(dot_expr(F.col("va"), F.col("va"))) * F.sqrt(dot_expr(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_cell_col(vec: Column, centroids: Sequence[Sequence[float]]) -> Column:
    """IVF coarse-quantizer cell: argmax_j dot(v, c_j), ties resolved
    to the lowest cell index — array_position of the max over the dots
    array (O(K) expressions, survives thousands of centroids; the
    DuckDB twin uses the identical list_position(l, list_max(l)))."""
    dots = F.array(*[dot_expr(vec, _lit_array(c)) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN (nprobe=1): restrict the exact cosine top-k to the
    query's coarse cell, computing the cell on the fly (one pass over
    the embeddings). For the corpus-scale layout where the cell is a
    physical partition key and the scan PRUNES instead of filtering,
    see materialize_ivf_cells / ivf_topk_materialized."""
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    qcell = _argmax_cell(qvec, centroids)
    in_cell = df.filter(ivf_cell_col(_as_double(vec_col), centroids) == qcell)
    return cosine_topk(in_cell, qvec, k, None, id_col, vec_col)


def materialize_ivf_cells(
    embeddings: DataFrame,
    centroids: Sequence[Sequence[float]],
    path: str,
    vec_col: str = "embedding",
) -> str:
    """Physical IVF layout: write the embeddings partitioned by their
    coarse cell (``ivf_cell=<j>/`` dirs). This is the index-build side
    of IVF at corpus scale — one pass assigns cells, and every later
    query reads ONLY its probe cells via partition pruning (the scan's
    PartitionFilters, no per-row filter over the full corpus)."""
    out = embeddings.withColumn("ivf_cell", ivf_cell_col(_as_double(vec_col), centroids))
    out.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)
    return path


def ivf_topk_materialized(
    spark,
    path: str,
    qvec: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN (nprobe=1) over a materialize_ivf_cells layout: the
    ``ivf_cell = qcell`` predicate is a partition filter, so Spark
    lists and reads only the probe cell's files — query cost scales
    with cell size, not corpus size. Results are identical to
    ivf_topk on the same centroids (asserted in tests)."""
    qcell = _argmax_cell(qvec, centroids)
    df = spark.read.parquet(path).filter(F.col("ivf_cell") == qcell).drop("ivf_cell")
    return cosine_topk(df, qvec, k, exclude_id, id_col, vec_col)


def _argmax_cell(vec: Sequence[float], centroids: Sequence[Sequence[float]]) -> int:
    best, best_d = 0, None
    for j, c in enumerate(centroids):
        acc = 0.0
        for x, y in zip(vec, c):
            acc += float(x) * float(y)
        if best_d is None or acc > best_d:
            best, best_d = j, acc
    return best


def cosine_topk_vectorized(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput path: per-Arrow-batch numpy matmul + partial top-k,
    then a tiny global merge. Scores can differ from the expression
    path in the last ulp (BLAS accumulation order); ranking uses the
    same quantized contract."""
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    q = np.asarray(qvec, dtype=np.float64)
    nq = float(np.sqrt((q * q).sum()))
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("cos_sim", T.DoubleType())]
    )

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = V @ q
            nv = np.sqrt((V * V).sum(axis=1))
            cos = np.round(dots / (nv * nq), 6)
            m = min(k, cos.size)
            part = np.argpartition(-cos, m - 1)[:m]
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy()[part], "cos_sim": cos[part]}
            )

    partial = df.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "cos_sim")
    )
