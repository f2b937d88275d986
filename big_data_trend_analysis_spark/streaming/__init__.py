"""Structured Streaming skin over the batch operator library.

Design rule (SURVEY.md §7.2 M6): every streaming job is a *re-trigger*
of an already-oracle-verified batch plan. Streams and batch tables
share schemas, so the transformation functions are literally the same
ones — only the source (readStream) and sink (writeStream +
checkpoint) differ. Batch/stream parity is tested in
tests/test_streaming.py.
"""
