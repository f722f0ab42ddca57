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


def train_ivf_centroids(emb_df, n_lists: int = 16, seed: int = 42, train_limit: int = 4096, vec_col: str = "embedding"):
    """Driver-side coarse quantizer: k-means (Lloyd, 10 iters) over a
    bounded sample — the standard IVF recipe where the quantizer trains
    on a sample and the full corpus is only ever *assigned* (one
    vectorized pass).  Returns ``np.ndarray (n_lists, dim)``."""
    import numpy as np

    sample = np.asarray(
        [r[0] for r in emb_df.select(vec_col).limit(train_limit).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
    for _ in range(10):
        # cosine assignment: normalize both sides, argmax dot product
        s = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        assign = (s @ c.T).argmax(axis=1)
        for j in range(len(centroids)):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def ivf_assign(emb_df, centroids, vec_col: str = "embedding"):
    """Add an ``ivf_list`` column: nearest-centroid id, computed as one
    vectorized matmul per Arrow batch (no per-row Python)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @pandas_udf("int")
    def _assign(vectors):
        import pandas as pd

        mat = np.stack(vectors.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ cnorm.T).argmax(axis=1).astype("int32"))

    return emb_df.withColumn("ivf_list", _assign(F.col(vec_col)))


def ivf_topk(
    emb_df,
    query_vec,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
):
    """IVF approximate top-k: assign the corpus to ``n_lists`` inverted
    lists, probe the ``nprobe`` lists nearest the query, exact-score only
    inside them.  At 100 TB the assignment is a narrow map stage and the
    probe is a partition-pruned scan when the table is written
    partitioned/bucketed by ``ivf_list`` — the scored candidate set is
    ~``nprobe/n_lists`` of the corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    if centroids is None:
        centroids = train_ivf_centroids(
            emb_df, n_lists=n_lists, seed=seed, vec_col=vec_col
        )
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    probe = np.argsort(-(cnorm @ q))[:nprobe].tolist()

    assigned = ivf_assign(emb_df, cmat, vec_col=vec_col)
    candidates = assigned.where(F.col("ivf_list").isin(probe))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)
