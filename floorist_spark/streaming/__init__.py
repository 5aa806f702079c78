"""Structured Streaming operators: streaming variants of the batch
operator families plus custom stateful ops (``applyInPandasWithState``).
"""
