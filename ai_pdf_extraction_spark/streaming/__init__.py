"""Streaming/incremental semantics.

The reference is NOT a streaming system (SURVEY.md §2.8-2.9): its
incremental behavior is a resumable work queue, which this engine
implements as per-bucket snapshot checkpointing (``plans.pipeline`` +
``sources.snapshot_table``). For deployments where pages arrive
continuously, ``streaming.ingest`` provides a Structured Streaming
file-source path running the same extraction kernels micro-batch.
"""
