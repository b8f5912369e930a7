"""Spark column expressions and vectorized pandas/Arrow UDFs."""
