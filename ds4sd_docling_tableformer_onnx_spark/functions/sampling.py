"""The ONE deterministic mixture-sampling predicate.

Shared by the oracle query (queries.py: ``mixture_sample``) and the
curation job (jobs/curate_job.py) so the sampler's determinism
discipline — md5-hash uniform, INTEGER thresholds, RNG-free and
therefore retry/engine-stable (CLAUDE.md invariant) — has a single
definition that cannot drift.

Rule: source ``srcK`` keeps a document at rate 1 / 2^(K mod 4),
decided by the first 32 bits of md5(doc_id) against an integer
threshold (2^32 >> (K mod 4)).  The DuckDB oracle replicates the same
arithmetic verbatim.

Sources that do NOT match ``src([0-9]+)`` (e.g. ``wiki``) fall back to
K = 0, i.e. keep rate 1 — ``try_cast`` + ``coalesce`` so Spark's ANSI
mode cannot throw on ``CAST('' AS INT)`` and non-ANSI engines cannot
silently drop the row (ADVICE r3 medium).  The oracle mirrors the same
``TRY_CAST``/``COALESCE`` default.
"""

from __future__ import annotations


def u32_md5(col):
    """First 32 bits of md5(CAST(col AS STRING)) as a non-negative
    long — THE hash-uniform integer every deterministic sampler/router
    here derives from (mixture sampling, cluster splits, rendezvous
    ring buckets, the global shuffle, DSIR feature buckets).  ONE
    definition so no site can drift from the DuckDB replication:
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT``."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def mixture_keep(id_col: str = "doc_id", source_col: str = "source"):
    """Boolean Column: does this (id, source) row survive the mixture
    sample?"""
    from pyspark.sql import functions as F

    u32 = u32_md5(id_col)
    threshold = F.expr(
        "shiftright(CAST(4294967296 AS BIGINT), "
        "coalesce(try_cast(regexp_extract("
        f"{source_col}, 'src([0-9]+)', 1) AS INT), 0) % 4)"
    )
    return u32 < threshold
