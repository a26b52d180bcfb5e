"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline, pure Catalyst higher-order
  functions (F.zip_with / F.aggregate) — no Python in the hot path.
- LSH (random hyperplanes): the scale path — signature buckets prune the
  candidate set before exact re-scoring; probes multiple buckets for recall.

At 100 TB the brute-force scan is a single map + TakeOrderedAndProject (no
shuffle); LSH turns it into a bucket-pruned scan. IVF (k-means coarse
quantizer) would follow the same candidate-prune shape; hyperplane LSH is the
v1 bucketed variant.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot_with_literal(vec_col, qvec: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(F.zip_with(vec_col, q,
                                  lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def brute_force_topk(emb: DataFrame, query_vec: Sequence[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k — map + TakeOrderedAndProject, zero shuffles.
    → (id, cosine) ordered desc, ties by id asc."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot_with_literal(F.col(vec_col), query_vec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (emb.select(F.col(id_col).cast("long").alias("id"), cos.alias("cosine"))
               .orderBy(F.desc("cosine"), F.asc("id")).limit(k))


def hyperplane_buckets(emb: DataFrame, n_planes: int = 8, seed: int = 42,
                       dim: int = None, vec_col: str = "embedding") -> DataFrame:
    """Add an LSH bucket column: sign bits of dot products with ``n_planes``
    seeded random hyperplanes → int bucket in [0, 2^n_planes)."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for i in range(n_planes):
        bit = (_dot_with_literal(F.col(vec_col), planes[i]) > 0).cast("int")
        bucket = bucket + bit * F.lit(1 << i)
    return emb.withColumn("lsh_bucket", bucket)


def lsh_topk(emb: DataFrame, query_vec: Sequence[float], k: int = 10,
             n_planes: int = 8, n_probes: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH bucket is the
    query's bucket or one of its ``n_probes−1`` nearest (Hamming) neighbors;
    exact cosine re-ranking on the candidates."""
    dim = len(query_vec)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ q > 0).astype(int)
    qbucket = int(sum(b << i for i, b in enumerate(qbits)))
    margins = np.abs(planes @ q)
    # multi-probe: visit buckets in increasing total flipped-margin cost.
    # probing all 2^n_planes buckets degrades gracefully to exact brute force.
    if n_planes <= 12:
        masks = sorted(range(1 << n_planes),
                       key=lambda m: sum(margins[i] for i in range(n_planes)
                                         if m >> i & 1))
        probes: List[int] = [qbucket ^ m for m in masks[:n_probes]]
    else:  # too many buckets to enumerate — single-bit flips by margin
        order = np.argsort(margins)
        probes = [qbucket] + [qbucket ^ (1 << int(b))
                              for b in order[: max(0, n_probes - 1)]]
    bucketed = hyperplane_buckets(emb, n_planes, seed, dim, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
