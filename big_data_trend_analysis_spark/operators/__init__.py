"""Operator library: relational core, windows, trend, dedup, similarity,
text stats, sketches, multimodal plumbing.

Every operator is a function ``DataFrame -> DataFrame`` (or takes a few
DataFrames) that builds a *declarative* plan — Catalyst/AQE choose the
physical strategy. No operator collects to the driver.
"""
