"""C4/Gopher heuristic rule battery (Raffel et al. 2020; Rae et al.
2021) — ONE definition shared by the oracle query (queries.py:
``c4_filters``) and the curation job (jobs/curate_job.py
``--rule-filter``), so the rule semantics cannot drift from the
DuckDB-checked form.

All rules are whole-stage-codegen expressions (no UDF, no shuffle);
the mean-word-length band cross-multiplies integers (9n <= 2*chars <=
13n, i.e. mean in [4.5, 6.5]) so no float is ever produced.  The
classic terminal-punctuation rule is replaced by the Gopher
consecutive-repetition screen, which discriminates on punctuation-free
corpora like this one.
"""

from __future__ import annotations


def heuristic_rules(text_col: str = "text"):
    """Ordered dict of rule name -> boolean Column over ``text_col``."""
    from pyspark.sql import functions as F

    ws = F.split(text_col, " ", -1)
    n = F.size(ws)
    chars = F.aggregate(
        F.transform(ws, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    # Gopher-style repetition screen: any token repeated 3x in a row
    # (guarded sequence per the gram-builder discipline: n < 3 would
    # step -1)
    triple = F.when(
        n >= 3,
        F.exists(
            F.sequence(F.lit(1), n - 2),
            lambda i: (F.element_at(ws, i) == F.element_at(ws, i + 1))
            & (F.element_at(ws, i) == F.element_at(ws, (i + 2).cast("int"))),
        ),
    ).otherwise(F.lit(False))
    return {
        "r_min_words": n >= 20,
        "r_no_triple_repeat": ~triple,
        "r_max_word_len": F.array_max(F.transform(ws, F.length)) <= 30,
        "r_no_braces": ~F.col(text_col).contains("{"),
        "r_word_len_band": (F.lit(9) * n <= F.lit(2) * chars)
        & (F.lit(2) * chars <= F.lit(13) * n),
    }


def keep_all(rules) -> "object":
    """AND of every rule column (the cascade's keep predicate)."""
    from functools import reduce

    cols = list(rules.values())
    return reduce(lambda a, b: a & b, cols)
