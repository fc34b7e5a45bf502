"""Structured Streaming front-ends. The reference is batch-only
(SURVEY.md §2.9 'Streaming: none'); these are the engine's incremental
ingest paths for a continuously-crawled corpus."""
