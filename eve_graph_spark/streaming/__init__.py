"""Structured Streaming surface: windowed aggregations, watermarked dedup,
session windows, and the wormhole-expiry refresh loop as a stream."""
