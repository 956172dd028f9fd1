"""Structured Streaming over the events changelog (SURVEY §2.10).

The reference's "streaming" is a synchronous CDC changelog; on Spark
the same feed is a first-class stream: ``readStream`` over the event
directory, watermarked windowed aggregates for late data, and an
``applyInPandasWithState`` stateful operator for custom per-entity
state. Batch/stream parity: every streaming transform here has a batch
twin in :mod:`..audit.changelog`, and the tests assert the availableNow
run of the stream equals the batch result.
"""
