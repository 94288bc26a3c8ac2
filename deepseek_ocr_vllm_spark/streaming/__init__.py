"""Structured Streaming surface: micro-batch consumption with idempotent
sinks (the Spark analog of the reference's queue consumers, SURVEY §2.10)."""
