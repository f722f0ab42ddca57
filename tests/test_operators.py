"""Dedup / similarity / multimodal operators + streaming extraction."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_simhash_near_dup_detects_clones(spark):
    from ds4sd_docling_tableformer_onnx_spark.operators.dedup import (
        simhash_candidates,
        simhash_column,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup
        (3, "completely different words about spark partitions and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = simhash_column(df)
    sigs = {r["doc_id"]: r["simhash"] for r in hashed.collect()}
    assert sigs[1] != 0
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_candidates(hashed).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 12
    # identical text -> identical signature, hamming 0
    clone = spark.createDataFrame([(9, rows[0][1]), (10, rows[0][1])], "doc_id long, text string")
    cp = simhash_candidates(simhash_column(clone)).collect()
    assert cp and cp[0]["hamming"] == 0


def test_lsh_ann_vs_exact_baseline(spark):
    from ds4sd_docling_tableformer_onnx_spark.operators.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    query = list(emb.where("vec_id = 0").first()["embedding"])
    rest = emb.where("vec_id <> 0")
    exact = [r["vec_id"] for r in cosine_topk(rest, query, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_bucketed_topk(rest, query, k=10).collect()]
    assert len(approx) == 10
    # LSH with multiprobe should recover a reasonable share of true top-k
    assert len(set(exact) & set(approx)) >= 3


def test_media_feature_stub_plumbing(spark):
    from ds4sd_docling_tableformer_onnx_spark.operators.multimodal import (
        extract_media_features,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )
    feats = extract_media_features(docs, "doc_id", "blob").collect()
    assert len(feats) == 20
    assert all(len(r["feature"]) == 16 for r in feats)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-9 for r in feats if r["ok"])
    # deterministic: same input -> same features
    again = extract_media_features(docs, "doc_id", "blob").collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_streaming_extraction_matches_batch(spark, tmp_path):
    from ds4sd_docling_tableformer_onnx_spark.operators.extract import (
        extract_transcripts,
    )
    from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import (
        generate_transcripts,
    )
    from ds4sd_docling_tableformer_onnx_spark.streaming.stream import (
        run_to_completion,
        stream_extract,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = generate_transcripts(spark, n_turns=80, n_convs=4, seed=5)
    df.write.parquet(in_dir)

    run_to_completion(stream_extract(spark, in_dir), out_dir, ckpt)
    streamed = spark.read.parquet(out_dir)
    batch = extract_transcripts(spark.read.parquet(in_dir))

    assert streamed.count() == 80
    s = {(r["conv_id"], r["turn_idx"]): r["html_sha256"] for r in streamed.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["html_sha256"] for r in batch.collect()}
    assert s == b  # identical results batch vs streaming

    # restart with the same checkpoint: no new input -> no duplicates
    run_to_completion(stream_extract(spark, in_dir), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 80


def test_ivf_topk_recall(spark):
    """IVF (coarse k-means + nprobe lists) must recover most of the exact
    cosine top-10 while scoring only a fraction of the corpus."""
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    query = emb.where("vec_id = 0").select("embedding").first()[0]
    rest = emb.where("vec_id > 0")

    exact = [r["vec_id"] for r in cosine_topk(rest, query, k=10).collect()]
    cents = train_ivf_centroids(rest, n_lists=8, seed=7)
    approx = [
        r["vec_id"]
        for r in ivf_topk(rest, query, k=10, n_lists=8, nprobe=4, centroids=cents).collect()
    ]
    assert len(set(exact) & set(approx)) >= 7  # recall@10 >= 0.7

    # the probe prunes: every candidate list is much smaller than the corpus
    sizes = (
        ivf_assign(rest, cents).groupBy("ivf_list").agg(F.count("*").alias("n"))
    ).collect()
    assert len(sizes) >= 4
    assert max(r["n"] for r in sizes) < rest.count()
