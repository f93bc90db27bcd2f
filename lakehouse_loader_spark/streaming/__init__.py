"""Structured Streaming surface over the events table.

The reference has no unbounded sources (SURVEY.md §2b) — this module is the
[EXT] streaming roadmap: file-source streams, watermarked tumbling windows,
and custom stateful processing, mirroring the batch `events_*` declared
queries so batch and streaming share one logical plan shape.
"""
