"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the exact baseline — one scan, the dot product
  as a zip_with/aggregate column expression (JVM, no UDF), then
  TakeOrderedAndProject for the top-k merge. At 100 TB this is the
  "verify" path and small-query path.
- IVF (inverted-file) ANN: coarse centroids (deterministically seeded
  k-means via pyspark.ml, or caller-provided), vectors partitioned by
  nearest centroid; a query probes only the closest `n_probe` centroid
  partitions — the scan prunes to n_probe/n_centroids of the data.
- Embedding cosine near-dup pairs: random-hyperplane LSH (sign sketch)
  bucketing + exact cosine verify on candidates.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_scores(
    embs: DataFrame, query_vec: list[float], id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine) for every vector — expression-only kernel."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    v = F.col(vec_col)
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return embs.select(
        F.col(id_col).cast("long").alias("id"), cos.alias("cosine")
    )


def cosine_topk(
    embs: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k (desc cosine, asc id).
    ``orderBy().limit(k)`` is TakeOrderedAndProject (per-partition top-k +
    driver merge); rank is assigned on the collected ≤k rows instead of an
    unpartitioned row_number window."""
    scored = cosine_scores(embs, query_vec, id_col, vec_col)
    rows = (
        scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k).collect()
    )
    data = [(i + 1, r["id"], float(r["cosine"])) for i, r in enumerate(rows)]
    return embs.sparkSession.createDataFrame(
        data, "rank int, id long, cosine double"
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


class IvfIndex:
    """Coarse-quantized ANN: vectors assigned to their nearest centroid at
    build time; a query scans only the top `n_probe` centroid cells.

    At cluster scale `assigned` is persisted partitioned by `cell` so a
    probe is a partition-pruned scan."""

    def __init__(self, assigned: DataFrame, centroids: list[list[float]],
                 id_col: str, vec_col: str):
        self.assigned = assigned
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(
        cls, embs: DataFrame, n_cells: int = 16, seed: int = 11,
        id_col: str = "vec_id", vec_col: str = "embedding",
        max_iter: int = 5,
    ) -> "IvfIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = embs.select(
            F.col(id_col), F.col(vec_col),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
        )
        km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="_features")
        model = km.fit(feat)
        centroids = [list(map(float, c)) for c in model.clusterCenters()]
        assigned = model.transform(feat).select(
            F.col(id_col), F.col(vec_col),
            F.col("prediction").cast("int").alias("cell"),
        )
        return cls(assigned.cache(), centroids, id_col, vec_col)

    def probe_cells(self, query_vec: list[float], n_probe: int) -> list[int]:
        import math

        qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

        def cos(c):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            return sum(a * b for a, b in zip(c, query_vec)) / (cn * qn)

        order = sorted(
            range(len(self.centroids)),
            key=lambda i: -cos(self.centroids[i]),
        )
        return order[:n_probe]

    def search(self, query_vec: list[float], k: int = 10, n_probe: int = 4) -> DataFrame:
        cells = self.probe_cells(query_vec, n_probe)
        subset = self.assigned.where(F.col("cell").isin(cells))
        return cosine_topk(subset, query_vec, k, self.id_col, self.vec_col)


# ---------------------------------------------------------------------------
# cosine near-dup pairs (random hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------


def hyperplane_sketch(
    embs: DataFrame, dim: int, n_bits: int = 16, seed: int = 13,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """sign-sketch: bit i = [v · r_i >= 0] for seeded pseudo-random
    hyperplanes r_i (deterministic, unit-free)."""
    rng = random.Random(f"hyperplane:{seed}")
    planes = [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]
    sketch = F.lit(0).cast("long")
    for i, r in enumerate(planes):
        rcol = F.array(*[F.lit(x) for x in r])
        bit = F.when(_dot(F.col(vec_col), rcol) >= 0, F.lit(1)).otherwise(F.lit(0))
        sketch = sketch + bit.cast("long") * F.lit(1 << i).cast("long")
    return embs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        sketch.alias("sketch"),
    )


def embedding_near_dups(
    embs: DataFrame, dim: int, threshold: float = 0.95,
    n_bits: int = 16, seed: int = 13, bands: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Sign-sketch LSH near-dup pairs: the n_bits sketch is cut into
    ``bands`` equal bands; candidates share ANY band (pigeonhole: a pair
    within hamming distance bands-1 always matches at least one band — a
    near-identical vector can flip a hyperplane whose margin is below the
    perturbation, so full-sketch equality under-recalls); exact cosine
    verifies candidates. Scale shape: ``bands`` equi-joins on a
    (n_bits/bands)-bit key, never all-pairs."""
    from functools import reduce

    sk = hyperplane_sketch(embs, dim, n_bits, seed, id_col, vec_col)
    width = n_bits // bands
    mask = (1 << width) - 1
    for j in range(bands):
        sk = sk.withColumn(
            f"band{j}",
            F.shiftright(F.col("sketch"), j * width).bitwiseAND(F.lit(mask)),
        )
    # cached because the banded self-join scans it 2x bands times; the
    # cache entry lives until the caller's action completes — repeated
    # invocations in one session should sk.unpersist() between calls
    # (lazy return: this function cannot do it itself)
    sk = sk.cache()
    a = sk.alias("a")
    b = sk.alias("b")
    pairs = [
        a.join(
            b,
            (F.col(f"a.band{j}") == F.col(f"b.band{j}"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        for j in range(bands)
    ]
    cand = reduce(DataFrame.unionByName, pairs).dropDuplicates(["id_a", "id_b"])
    cos = _dot(F.col("vec_a"), F.col("vec_b")) / (
        _norm(F.col("vec_a")) * _norm(F.col("vec_b"))
    )
    return cand.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )
