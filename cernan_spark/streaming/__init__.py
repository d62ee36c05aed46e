"""Structured Streaming variants of the pipeline's stateful pieces."""
