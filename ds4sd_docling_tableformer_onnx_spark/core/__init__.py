"""Pure-Python per-turn extraction algebra.

Everything in this subpackage is deliberately Spark-free: these functions
run *inside* Arrow-batched pandas UDFs (one call per turn, many turns per
batch).  Behavior is parity-tested against the reference repo's golden
fixtures (see ``tests/``).
"""
