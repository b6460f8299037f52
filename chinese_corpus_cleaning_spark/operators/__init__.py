"""Spark-side operators: Arrow-vectorized pandas UDFs and DataFrame-level
transforms (quality eval, extraction, scrub, dedup joins, similarity,
perplexity). All per-row Python is confined to pandas UDF batch loops;
everything relational stays JVM-side for Catalyst/AQE to optimize."""
