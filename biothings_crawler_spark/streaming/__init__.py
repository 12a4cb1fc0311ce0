"""Incremental-cursor scans (the reference's resumable crawls) as
watermarked batch rounds, plus a Structured Streaming variant."""
