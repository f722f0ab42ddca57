"""Focused tests for the r6 second-pass internals: the byte-proportional
scan widening rule (queries._widen) and the cyclic-GC suspension helper
(functions/gcctl.suspended_gc)."""

import gc

from ds4sd_docling_tableformer_onnx_spark.functions.gcctl import suspended_gc
from ds4sd_docling_tableformer_onnx_spark.queries import _read, _widen

SF = "/root/testdata/sf0.01"


def test_widen_is_byte_proportional_and_capped(spark):
    docs = _read(spark, SF, "documents")  # ~65 KB single-row-group file
    parallelism = spark.sparkContext.defaultParallelism

    # default 56 KB/part: a 65 KB scan widens to exactly 2 partitions,
    # not to full parallelism
    assert _widen(docs).rdd.getNumPartitions() == 2

    # a coarser bytes_per_part than the file leaves the scan untouched
    assert _widen(docs, bytes_per_part=1 << 20) is docs

    # a fine-grained rule caps at session parallelism
    assert (
        _widen(docs, bytes_per_part=1024).rdd.getNumPartitions() == parallelism
    )

    # min_bytes gate still vetoes widening below the floor
    assert _widen(docs, min_bytes=1 << 20, bytes_per_part=1024) is docs


def test_widen_noop_when_scan_already_wide(spark):
    docs = _read(spark, SF, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # >= parallelism partitions: returned untouched (the corpus-scale
    # no-op path)
    assert _widen(docs) is docs


def test_suspended_gc_restores_state():
    assert gc.isenabled()
    with suspended_gc():
        assert not gc.isenabled()
    assert gc.isenabled()

    # nested / already-disabled: never force-enables
    gc.disable()
    try:
        with suspended_gc():
            assert not gc.isenabled()
        assert not gc.isenabled()
    finally:
        gc.enable()


def test_suspended_gc_restores_on_generator_close():
    def worker(it):
        with suspended_gc():
            yield from it

    g = worker(iter(range(3)))
    assert next(g) == 0
    assert not gc.isenabled()  # suspended while the task generator runs
    g.close()  # Spark closing the iterator mid-stream
    assert gc.isenabled()
