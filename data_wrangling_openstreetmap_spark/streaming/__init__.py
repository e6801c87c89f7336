"""Structured Streaming layer (SURVEY.md §2.9).

`transforms.py` holds the event-stream transformations, written against
plain DataFrames so the SAME function body serves both the graded
batch-equivalent queries (operators/streaming_ops.py) and the
`readStream` demos (`replay.py`, `stateful.py`). That sharing is the
correctness argument: Structured Streaming's incremental execution of a
transformation is defined to converge to its batch result.
"""
