"""Scans / sources / sinks: web pages (Common-Crawl-style), CoNLL token
streams, the LoReHLT KB, and submission-format output."""
