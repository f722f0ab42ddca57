"""Execution plans: checkpoint tables, lineage, idempotent resume."""
