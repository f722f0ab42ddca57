"""Structured Streaming wrapper of the extraction operator."""
