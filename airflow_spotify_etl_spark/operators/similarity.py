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


def _centroid_array(centroids: list[tuple[int, list[float]]]):
    """Literal array<struct<cell,cv>> expression from driver-side centroids.
    nlist × dim doubles (e.g. 16 × 64 = 1k literals) — tiny by design; ships
    with the plan to every executor, no join needed."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cell)).alias("cell"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
            )
            for cell, cv in centroids
        ]
    )


def _seed_centroids(
    corpus: DataFrame, vec_col: str, id_col: str, nlist: int
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random seed vectors: the nlist lowest-xxhash64(id)
    rows. orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-nlist + driver merge) — no full sort, no shuffle — and hash order
    decorrelates the sample from any id-assignment pattern."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("cv"))
        .orderBy(F.xxhash64("_id"), F.col("_id"))
        .limit(nlist)
        .collect()
    )
    return [(i, list(r["cv"])) for i, r in enumerate(rows)]


def _centroids(
    corpus: DataFrame, vec_col: str, id_col: str, nlist: int, dim: int
) -> list[tuple[int, list[float]]]:
    """Deterministic centroids: pseudo-random seeds + one Lloyd refinement
    (assign-all + per-cell mean). Returns a driver-side list — the centroid
    table is nlist rows by construction, so collecting it is the point: it
    then rides into the assignment projection as a broadcast literal instead
    of a join side. The refinement's only shuffle is the (cell, dim) partial
    aggregate — nlist × dim groups, independent of corpus size."""
    seeds = _seed_centroids(corpus, vec_col, id_col, nlist)
    assigned = _assign_cells(corpus, seeds, vec_col, id_col)
    refined = (
        assigned.select("cell", F.posexplode(_as_double(vec_col)).alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
        .select("cell", F.transform("pairs", lambda p: p["m"]).alias("cv"))
        .collect()
    )
    return [(r["cell"], list(r["cv"])) for r in refined]


def _assign_cells(
    df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str, id_col: str
) -> DataFrame:
    """Nearest-centroid assignment as a per-row ARGMAX PROJECTION over the
    literal centroid array: transform → struct(sim, -cell) → array_max.
    Zero joins, zero extra rows, zero shuffle — the narrow-plan replacement
    for the corpus×nlist join+window (which explodes rows nlist× and
    shuffles the whole corpus). Ties break to the lowest cell id.

    Ranking is by dot(v,c)/|c|: |v| is constant across cells, so the argmax
    equals the cosine argmax at half the arithmetic."""
    v = _as_double(vec_col)
    scored = F.transform(
        _centroid_array(centroids),
        lambda c: F.struct(
            (_dot(v, c["cv"]) / _norm(c["cv"])).alias("sim"),
            (-c["cell"]).alias("neg_cell"),
        ),
    )
    return df.withColumn("cell", -F.array_max(scored)["neg_cell"])


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
    partitioned by cell; here assignment runs inline as a narrow argmax
    projection (no join, no row explosion — see _assign_cells). Recall vs
    the exact scan is tested in tests/test_similarity.py."""
    cents = _centroids(corpus, vec_col, id_col, nlist, dim)
    assigned = _assign_cells(corpus, cents, vec_col, id_col)

    # nprobe nearest cells per query — same argmax-projection idea, but keep
    # the top nprobe: sort the per-row (sim, cell) structs, slice the tail.
    # (|q| constant per row → dot/|c| ranks identically to cosine.)
    qv = _as_double(vec_col)
    qscored = F.transform(
        _centroid_array(cents),
        lambda c: F.struct(
            (_dot(qv, c["cv"]) / _norm(c["cv"])).alias("sim"),
            c["cell"].alias("cell"),
        ),
    )
    probes = F.slice(F.reverse(F.array_sort(qscored)), 1, nprobe)
    qcells = queries.select(
        F.col(query_id_col),
        qv.alias("_qv"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell"),
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
