"""Similarity search over an embedding column (``array<float>``).

Two paths:
- ``cosine_topk``          exact brute-force baseline (JVM-side
                           zip_with/aggregate arithmetic; the correctness
                           oracle for any approximate variant);
- ``lsh_bucketed_topk``    the scale path: random-hyperplane LSH keys
                           computed vectorized in one pandas UDF, top-k
                           searched only inside matching buckets (probes
                           the query's bucket +/- multi-probe neighbors).

At 100 TB the bucketed variant turns an all-pairs scan into an equi-join
on bucket keys; bucket population is controlled by ``n_planes`` and the
plan stays one shuffle (group by bucket).
"""

from __future__ import annotations


def _dot(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine_topk(emb_df, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k by cosine similarity against a literal query vector."""
    from pyspark.sql import functions as F

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    e = F.col(vec_col).cast("array<double>")
    sim = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    return (
        emb_df.select(id_col, F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_buckets(emb_df, n_planes: int = 8, seed: int = 42, vec_col: str = "embedding"):
    """Add an LSH ``bucket`` column: sign pattern of dot products with
    ``n_planes`` seeded random hyperplanes (vectorized numpy per Arrow
    batch)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket(vectors):
        import numpy as np
        import pandas as pd

        mat = np.stack(vectors.to_numpy())
        dim = mat.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        signs = (mat @ planes) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(keys.astype("int32"))

    return emb_df.withColumn("bucket", _bucket(F.col(vec_col)))


def lsh_bucketed_topk(
    emb_df,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
):
    """Approximate top-k: search only buckets within ``multiprobe`` bit
    flips of the query's bucket."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    query = np.asarray(query_vec, dtype=np.float64)
    planes = rng.standard_normal((query.shape[0], n_planes))
    qsigns = (query @ planes) > 0
    qkey = int((qsigns * (1 << np.arange(n_planes))).sum())

    probe_keys = {qkey}
    if multiprobe >= 1:
        for bit in range(n_planes):
            probe_keys.add(qkey ^ (1 << bit))

    bucketed = hyperplane_buckets(emb_df, n_planes=n_planes, seed=seed, vec_col=vec_col)
    candidates = bucketed.where(F.col("bucket").isin(sorted(probe_keys)))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)
