"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §2.9) — its 'streaming' is lazy
generator pipelining, and the north_rule asks for resumable batch checkpoints,
which live in mel_spark.sources.checkpoint. This package provides the genuine
event-time streaming twins of the batch events queries for completeness:
readStream → watermark → window/sessionize → writeStream.
"""

from mel_spark.streaming.events import sessionize_stream, tumbling_counts_stream

__all__ = ["tumbling_counts_stream", "sessionize_stream"]
