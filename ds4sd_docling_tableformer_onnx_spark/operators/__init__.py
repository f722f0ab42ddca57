"""Spark DataFrame operators: extraction, dedup, similarity, text, multimodal."""
