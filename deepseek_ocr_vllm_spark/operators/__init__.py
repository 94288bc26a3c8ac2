"""Spark-side operators: the vectorized extraction transform plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
reconciliation diff, rules-engine cleaning)."""
