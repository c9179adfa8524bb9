"""Embedding similarity search (north star: ANN over array<float> columns).

- ``cosine_topk``        — exact brute-force top-k: broadcast the query set,
  JVM-side dot products via zip_with/aggregate, per-partition top-k then a
  tiny global merge. The correctness baseline; linear scan of the corpus.
- ``ivf_topk``           — IVF-style ANN: partition the corpus into nlist
  Voronoi cells (deterministic seed centroids + one Lloyd refinement),
  search only the nprobe closest cells per query. The scale path: at 100 TB
  the corpus is written partitioned by cell id, so a query reads nprobe/nlist
  of the data (partition pruning), and the scan within a cell is the same
  codegen'd dot product.
- ``cosine_pairs_lsh``   — all-pairs near-duplicate detection by random
  hyperplane LSH (sign sketch = SimHash over dimensions): pairs meeting in
  sketch-band buckets get exact cosine verification. Avoids the O(n²)
  cross join entirely.

Everything stays in built-in higher-order array functions — no Python in the
scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "ivf_topk", "cosine_pairs_lsh"]

_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    payload: list[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be small enough to
    broadcast (the usual ANN shape: few queries, huge corpus)."""
    q = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col), *(payload or []), _as_double(vec_col).alias("_v")
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine_sim",
        _dot(F.col("_qv"), F.col("_v")) / (_norm(F.col("_qv")) * _norm(F.col("_v"))),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, F.round("cosine_sim", 4).alias("cosine_sim"), *(payload or []))
    )


def _centroids(corpus: DataFrame, vec_col: str, id_col: str, nlist: int, dim: int) -> DataFrame:
    """Deterministic centroids: seed with the nlist lowest-id vectors, then
    one Lloyd refinement (assign-all + per-cell mean). Deterministic, cheap,
    and good enough to make cells meaningfully tighter than random."""
    seeds = (
        corpus.orderBy(id_col)
        .limit(nlist)
        .select(
            (F.row_number().over(W.orderBy(id_col)) - 1).alias("cell"),
            _as_double(vec_col).alias("cv"),
        )
    )
    assigned = _assign_cells(corpus, seeds, vec_col, id_col)
    refined = (
        assigned.select("cell", F.posexplode(_as_double(vec_col)).alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
        .select("cell", F.transform("pairs", lambda p: p["m"]).alias("cv"))
    )
    return refined


def _assign_cells(df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Nearest-centroid assignment by cosine (centroids broadcast)."""
    scored = df.join(F.broadcast(centroids)).withColumn(
        "_sim",
        _dot(_as_double(vec_col), F.col("cv"))
        / (_norm(_as_double(vec_col)) * _norm(F.col("cv"))),
    )
    w = W.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_sim", "cv")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """IVF ANN: search only the nprobe nearest cells per query.

    At scale the assignment is precomputed and the corpus is stored
    partitioned by cell; here assignment runs inline. Recall vs the exact
    scan is tested in tests/test_similarity.py."""
    cents = _centroids(corpus, vec_col, id_col, nlist, dim).cache()
    assigned = _assign_cells(corpus, cents, vec_col, id_col)

    # nprobe nearest cells per query (tiny: queries × nlist).
    qcells = (
        queries.join(F.broadcast(cents))
        .withColumn(
            "_sim",
            _dot(_as_double(vec_col), F.col("cv"))
            / (_norm(_as_double(vec_col)) * _norm(F.col("cv"))),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "cell", _as_double(vec_col).alias("_qv"))
    )
    scored = assigned.join(F.broadcast(qcells), "cell").withColumn(
        "cosine_sim",
        _dot(F.col("_qv"), _as_double(vec_col))
        / (_norm(F.col("_qv")) * _norm(_as_double(vec_col))),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def cosine_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs via random-hyperplane LSH.

    Sign sketch: bit_i = sign(v · r_i) for n_planes fixed random normals;
    band the sketch, meet candidates per band, verify exact cosine ≥
    threshold. P[bit match] = 1 - angle/π, so high-cosine pairs collide in
    some band with high probability while the cross join never materializes."""
    rng = np.random.RandomState(_SEED)
    planes = rng.randn(n_planes, dim).tolist()
    v = _as_double(vec_col)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
            > 0,
            1,
        )
        .otherwise(0)
        for plane in planes
    ]
    r = n_planes // bands
    sketched = corpus.select(
        F.col(id_col), v.alias("_v"), F.array(*bits).alias("_bits")
    )
    band_arr = F.array(
        *[
            F.concat_ws("", *[F.col("_bits")[b * r + j].cast("string") for j in range(r)])
            for b in range(bands)
        ]
    )
    banded = sketched.select(id_col, "_v", F.posexplode(band_arr).alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a." + id_col) < F.col("b." + id_col)),
        )
        .select(
            F.col("a." + id_col).alias("vec_a"),
            F.col("b." + id_col).alias("vec_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
        .distinct()
        .withColumn(
            "cosine_sim",
            F.round(_dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))), 4),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", "cosine_sim")
    )
