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


def hash_planes(dim: int, n_planes: int = 8, seed: int = 42):
    """Deterministic pseudo-random hyperplanes derived from md5: weight
    (p, d) = uniform[-1, 1) from the first 8 bytes of
    ``md5("{seed}#{p}#{d}")`` (big-endian / 2^64).

    Hash-derived (instead of an RNG stream) so any engine — the DuckDB
    correctness oracle, a JVM-side rewrite, a different executor — can
    reproduce the exact same planes from the seed alone; sign-LSH only
    needs a symmetric direction distribution, so uniform weights serve.
    Returns ``np.ndarray (dim, n_planes)`` float64."""
    import hashlib

    import numpy as np

    w = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            digest = hashlib.md5(f"{seed}#{p}#{d}".encode()).digest()
            w[d, p] = int.from_bytes(digest[:8], "big") / 2.0**64 * 2.0 - 1.0
    return w


def hyperplane_buckets(emb_df, n_planes: int = 8, seed: int = 42, vec_col: str = "embedding"):
    """Add an LSH ``bucket`` column: sign pattern of dot products with
    ``n_planes`` hash-derived hyperplanes (vectorized numpy per Arrow
    batch; the tiny plane matrix ships in the UDF closure — the
    broadcast-weights pattern)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    cache: dict = {}  # planes built once per python worker, not per batch

    @pandas_udf("int")
    def _bucket(vectors):
        import numpy as np
        import pandas as pd

        mat = np.stack(vectors.to_numpy())
        planes = cache.get("planes")
        if planes is None or planes.shape[0] != mat.shape[1]:
            planes = cache["planes"] = hash_planes(mat.shape[1], n_planes, seed)
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

    query = np.asarray(query_vec, dtype=np.float64)
    planes = hash_planes(query.shape[0], n_planes, seed)
    qsigns = (query @ planes) > 0
    qkey = int((qsigns * (1 << np.arange(n_planes))).sum())

    probe_keys = {qkey}
    from itertools import combinations

    for flips in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), flips):
            key = qkey
            for bit in bits:
                key ^= 1 << bit
            probe_keys.add(key)

    bucketed = hyperplane_buckets(emb_df, n_planes=n_planes, seed=seed, vec_col=vec_col)
    candidates = bucketed.where(F.col("bucket").isin(sorted(probe_keys)))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _safe_norm(mat, axis=1):
    """Row norms with zero-vector guard (zero rows normalize to zero,
    not NaN)."""
    import numpy as np

    norm = np.linalg.norm(mat, axis=axis, keepdims=True)
    return np.where(norm > 0, norm, 1.0)


def auto_n_planes(
    n_rows: int, target_bucket_rows: int = 1024, lo: int = 8, hi: int = 24
) -> int:
    """Plane count scaled to corpus size: enough sign bits that a
    UNIFORM corpus lands ~``target_bucket_rows`` per bucket
    (``2^p >= n / target``), clamped to [lo, hi].  At 10^9 rows with the
    default target this yields 20 planes (~1M buckets, ~1k rows each —
    ~500k scored pairs per bucket) instead of round 2's fixed 8 planes
    (256 buckets -> ~4M rows and ~10^13 pairs per bucket).  Uniformity
    is an assumption, not a guarantee — the ``max_bucket_rows`` cap in
    :func:`lsh_neardup_pairs` is the hard guard for skewed corpora."""
    import math

    if n_rows <= target_bucket_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket_rows))))


def lsh_neardup_pairs(
    emb_df,
    threshold: float = 0.25,
    n_planes: int | None = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_rows: int | None = 10_000,
    target_bucket_rows: int = 1024,
):
    """Embedding near-dup candidate pairs WITHOUT blocking labels: rows
    sharing a sign-LSH bucket are scored exactly, pairs above the
    cosine threshold survive.

    The all-pairs problem becomes one self-equi-join on the bucket key:
    with b buckets over n rows the scored pair count is ~n^2/b instead
    of n^2, and the persisted (id, bucket, vector) table is the only
    shuffled input — the label-blocked variant (queries.q_embedding_neardup)
    is the within-block analog, this is the scale path.  Hash-derived
    planes keep the whole operator replicable in the DuckDB oracle.

    Two skew guards (a fixed plane count has a quadratic cliff: any
    bucket with m rows scores m^2/2 pairs regardless of corpus size):

    - ``n_planes=None`` derives the plane count from the corpus size
      via :func:`auto_n_planes` (one ``count()`` action — at table
      scale that is metadata-cheap);
    - ``max_bucket_rows`` HARD-CAPS bucket population: buckets above
      the cap are excluded from the pair join entirely and the drop is
      logged (bucket keys, row count) — no silent caps.  A degenerate
      corpus (e.g. millions of zero/identical embeddings in one bucket)
      then costs one aggregation instead of a ~m^2 self-join.  Dropped
      buckets mean missed pairs BY CHOICE: near-dup groups that large
      are better handled by exact dedup upstream (identical vectors)
      or a recursive split; the log tells the operator which buckets
      to follow up.  ``None`` disables the guard.

    The returned frame owns the persisted bucket table — release it
    with ``plans.cache.release(result)`` after the terminal action.
    """
    from pyspark.sql import functions as F

    from ..plans.cache import adopt

    if n_planes is None:
        n_planes = auto_n_planes(emb_df.count(), target_bucket_rows)

    persisted = hyperplane_buckets(
        emb_df.select(id_col, vec_col), n_planes=n_planes, seed=seed, vec_col=vec_col
    ).persist()
    bucketed = persisted

    if max_bucket_rows is not None:
        # bucket census: tiny frame (<= 2^n_planes rows), one pass over
        # the (now materialized) persisted table
        oversized = (
            bucketed.groupBy("bucket")
            .count()
            .where(F.col("count") > max_bucket_rows)
            .collect()
        )
        if oversized:
            import logging

            dropped_rows = sum(r["count"] for r in oversized)
            logging.getLogger(__name__).warning(
                "lsh_neardup_pairs: dropping %d oversized bucket(s) "
                "(%d rows > max_bucket_rows=%d each is capped at): %s",
                len(oversized),
                dropped_rows,
                max_bucket_rows,
                sorted(r["bucket"] for r in oversized)[:32],
            )
            bucketed = bucketed.where(
                ~F.col("bucket").isin([r["bucket"] for r in oversized])
            )

    a, b = bucketed.alias("a"), bucketed.alias("b")
    e_a = F.col(f"a.{vec_col}").cast("array<double>")
    e_b = F.col(f"b.{vec_col}").cast("array<double>")
    cos = _dot(e_a, e_b) / (F.sqrt(_dot(e_a, e_a)) * F.sqrt(_dot(e_b, e_b)))
    result = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") > threshold)
    )
    return adopt(result, persisted)


def batch_topk(
    emb_df,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    slack: int = 8,
):
    """Top-k by cosine for a BATCH of query vectors in one corpus pass —
    the training-data retrieval shape (q probe queries against 10^9
    docs) where per-query scans would read the corpus q times.

    Scale plan:
    - the (small) query matrix ships in the UDF closure (broadcast-
      weights pattern), one vectorized (batch x dim) @ (dim x q) matmul
      per Arrow batch — no crossJoin row explosion, no shuffle of
      n x q scored rows;
    - each batch emits only its top (k + slack) candidates per query
      (partial top-k == map-side combine), so the final global window
      shuffles ~(k + slack) * n_batches * q tiny rows instead of n * q;
    - the global window orders by JVM-rounded cosine then id —
      identical semantics to ``cosine_topk``; the ``slack`` margin
      makes the partial pruning immune to rounding-boundary ties
      (membership would only diverge with > slack exact 6-dp ties at a
      batch's k-th boundary).

    ``queries``: list of (query_id, vector).  Equality with the exact
    crossJoin+window form is pinned by tests and the ``ann_batch_topk``
    oracle checks that exact form end-to-end.
    """
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf  # noqa: F401 (doc parity)

    qids = [int(qid) for qid, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64).T  # (dim, q)
    qnorm = np.linalg.norm(qmat, axis=0)
    qnorm = np.where(qnorm > 0, qnorm, 1.0)
    keep = k + slack

    def _partial(iterator):
        import pandas as pd

        for pdf in iterator:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms = np.where(norms > 0, norms, 1.0)
            sims = (mat @ qmat) / norms[:, None] / qnorm[None, :]  # (B, q)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_sim = [], [], []
            # half-away-from-zero 6-dp rounding (JVM round semantics)
            r = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            for j, qid in enumerate(qids):
                order = np.lexsort((ids, -r[:, j]))[:keep]
                out_q.extend([qid] * len(order))
                out_id.extend(ids[order].tolist())
                out_sim.extend(sims[order, j].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_id, "cosine_raw": out_sim}
            )

    partial = emb_df.select(id_col, vec_col).mapInPandas(
        _partial, schema=f"query_id long, {id_col} long, cosine_raw double"
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        partial.withColumn("cosine", F.round("cosine_raw", 6))
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def train_ivf_centroids(emb_df, n_lists: int = 16, seed: int = 42, train_limit: int = 4096, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Driver-side coarse quantizer: k-means (Lloyd, 10 iters) over a
    bounded sample — the standard IVF recipe where the quantizer trains
    on a sample and the full corpus is only ever *assigned* (one
    vectorized pass).  Returns ``np.ndarray (n_lists, dim)``.

    The sample is ordered by ``id_col`` before the limit so the
    centroids (hence every downstream probe) are deterministic across
    partitionings and reruns; at scale swap the orderBy for a seeded
    ``TABLESAMPLE``/hash filter — determinism comes from the predicate,
    not a global sort."""
    import numpy as np

    sample = np.asarray(
        [
            r[0]
            for r in emb_df.select(vec_col, id_col)
            .orderBy(id_col)
            .limit(train_limit)
            .collect()
        ],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
    for _ in range(10):
        # cosine assignment: normalize both sides, argmax dot product
        s = sample / _safe_norm(sample)
        c = centroids / _safe_norm(centroids)
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
    cnorm = cmat / _safe_norm(cmat)

    @pandas_udf("int")
    def _assign(vectors):
        import pandas as pd

        mat = np.stack(vectors.to_numpy()).astype(np.float64)
        mat = mat / _safe_norm(mat)
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
    probe = probe_lists(cmat, query_vec, nprobe)

    assigned = ivf_assign(emb_df, cmat, vec_col=vec_col)
    candidates = assigned.where(F.col("ivf_list").isin(probe))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def probe_lists(centroids, query_vec, nprobe: int):
    """The ``nprobe`` inverted-list ids nearest the query (cosine)."""
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = cmat / _safe_norm(cmat)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn > 0 else 1.0)
    return np.argsort(-(cnorm @ q))[:nprobe].tolist()


def normalize_column(df, vec_col: str = "embedding", out_col: str = "_nvec"):
    """Add a unit-normalized (float64) copy of the vector column, one
    numpy pass per Arrow batch; zero vectors pass through unscaled."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _normalize(vectors):
        import numpy as np
        import pandas as pd

        mat = np.stack(vectors.to_numpy()).astype(np.float64)
        mat = mat / _safe_norm(mat)
        return pd.Series(list(mat))

    return df.withColumn(out_col, _normalize(F.col(vec_col)))


def round6_half_away(x):
    """6-dp half-away-from-zero rounding of a numpy array — the JVM
    ``round(x, 6)`` semantics (HALF_UP), NOT numpy's banker's rounding.
    Shared by the semantic-dedup scorer and its verifier so a
    threshold-boundary pair cannot flip between the two passes."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def scored_smaller_id_mask(mat, threshold, block: int = 256):
    """For rows sorted ascending by id with unit vectors ``mat``
    (n, d): boolean array where entry i is True iff some j < i has
    ``round6(mat[i] . mat[j]) > threshold`` — the SemDeDup drop rule,
    computed as blocked matmuls (block x n scores at a time, so memory
    stays bounded for clusters up to ``max_cluster_rows``) instead of
    a quadratic pair join."""
    import numpy as np

    n = mat.shape[0]
    out = np.zeros(n, dtype=bool)
    cols = np.arange(n)
    for s in range(0, n, block):
        e = min(s + block, n)
        scores = round6_half_away(mat[s:e] @ mat.T)
        valid = cols[None, :] < np.arange(s, e)[:, None]
        out[s:e] = ((scores > threshold) & valid).any(axis=1)
    return out


def semantic_dedup(
    emb_df,
    threshold: float = 0.25,
    n_lists: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    max_cluster_rows: int | None = 100_000,
):
    """SemDeDup-style semantic deduplication: cluster embeddings with
    the IVF coarse quantizer, then within each cluster drop every row
    that has a LOWER-id neighbor above the cosine threshold (the
    canonical smaller id survives — same min-id discipline as the
    connected-components dedup groups).

    Returns ``(id, cluster, kept, capped)`` for every input row.
    ``kept`` is deterministic: the quantizer trains on a bounded
    ordered sample (:func:`train_ivf_centroids`), so cluster
    assignment — and hence the drop set — is a pure function of the
    input.  ``capped`` marks rows of clusters excluded from pair
    scoring by ``max_cluster_rows`` (always kept): verifiers must
    mirror the exclusion instead of re-scoring capped clusters (r4
    advice low #2).

    Scale shape (the SemDeDup recipe at 10^9 rows):
    - clustering is a narrow map stage (one matmul per Arrow batch);
    - the pair scoring is ONE shuffle keyed on the cluster id into a
      per-cluster vectorized pass (``applyInPandas`` + blocked numpy
      matmul): each cluster's ~(n/n_lists)^2 scores are computed as
      dense matrix blocks in native code and only the n per-row
      verdicts leave the task — strictly fewer shuffled bytes than the
      previous pair self-join, which shipped both vector copies of
      every candidate pair back through the exchange; ``n_lists``
      scales with the corpus exactly like ``auto_n_planes`` (the paper
      uses ~100k clusters at billion scale);
    - ``max_cluster_rows`` hard-caps degenerate clusters the same way
      ``lsh_neardup_pairs`` caps buckets: oversized clusters are
      excluded from pair scoring (their rows stay kept=true) and the
      drop is logged — no silent quadratic cliff;
    - the persisted cluster table is owned by the returned frame:
      release with ``plans.cache.release(result)`` after the terminal
      action.
    """
    from pyspark.sql import functions as F

    from ..plans.cache import adopt

    if centroids is None:
        centroids = train_ivf_centroids(
            emb_df, n_lists=n_lists, seed=seed, vec_col=vec_col, id_col=id_col
        )
    # pre-normalize ONCE into the persisted cluster table (vectorized
    # pandas UDF — an expression-tree norm would be re-inlined per
    # array element by CollapseProject): the pair score becomes a
    # single dot product instead of dot + two norm aggregates per
    # pair — measured ~3x on the quadratic stage
    assigned = (
        normalize_column(
            ivf_assign(emb_df.select(id_col, vec_col), centroids, vec_col=vec_col),
            vec_col=vec_col,
            out_col="_nvec",
        )
        .withColumnRenamed("ivf_list", "cluster")
        .persist()
    )

    scored = assigned
    capped_ids: list = []
    if max_cluster_rows is not None:
        oversized = (
            assigned.groupBy("cluster")
            .count()
            .where(F.col("count") > max_cluster_rows)
            .collect()
        )
        if oversized:
            import logging

            capped_ids = [r["cluster"] for r in oversized]
            logging.getLogger(__name__).warning(
                "semantic_dedup: excluding %d oversized cluster(s) from "
                "pair scoring (> %d rows; their rows stay kept): %s",
                len(capped_ids),
                max_cluster_rows,
                sorted(capped_ids)[:32],
            )
            scored = assigned.where(~F.col("cluster").isin(capped_ids))

    from pyspark.sql import types as T

    trimmed = scored.select(id_col, "cluster", "_nvec")
    fields = {f.name: f.dataType for f in trimmed.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("id", fields[id_col]),
            T.StructField("cluster", fields["cluster"]),
            T.StructField("kept", T.BooleanType()),
        ]
    )

    def _score_cluster(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = np.stack(pdf["_nvec"].to_numpy())
        dropped = scored_smaller_id_mask(mat, threshold)
        return pd.DataFrame(
            {"id": pdf[id_col], "cluster": pdf["cluster"], "kept": ~dropped}
        )

    result = (
        trimmed.groupBy("cluster")
        .applyInPandas(_score_cluster, schema=out_schema)
        .withColumn("capped", F.lit(False))
    )
    if capped_ids:
        result = result.unionByName(
            assigned.where(F.col("cluster").isin(capped_ids)).select(
                F.col(id_col).alias("id"),
                F.col("cluster"),
                F.lit(True).alias("kept"),
                F.lit(True).alias("capped"),
            )
        )
    return adopt(result, assigned)


def write_ivf_store(emb_df, centroids, path: str, vec_col: str = "embedding"):
    """Materialize the corpus partitioned by inverted list — the
    at-scale layout where a probe becomes a partition-pruned scan: the
    query reads ~nprobe/n_lists of the files and the rest never leave
    storage.  (Iceberg equivalent: ``PARTITIONED BY (ivf_list)`` or a
    bucket transform.)"""
    ivf_assign(emb_df, centroids, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("ivf_list").parquet(path)


def ivf_topk_from_store(spark, path: str, centroids, query_vec, k: int = 10, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF top-k over a partitioned store: the ``ivf_list IN (...)``
    predicate prunes to the probed partitions at the source (visible as
    PartitionFilters in the plan — tests/test_plans.py pins it)."""
    from pyspark.sql import functions as F

    probe = probe_lists(centroids, query_vec, nprobe)
    candidates = spark.read.parquet(path).where(F.col("ivf_list").isin(probe))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)
