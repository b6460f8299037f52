"""Pure-Python per-document decision semantics.

These functions are the single source of truth for the reference-parity
behaviour; the Spark operators in ``..operators`` call them from inside
Arrow-vectorized pandas UDFs, and the test suite calls them directly.
"""
