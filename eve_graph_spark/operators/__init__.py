"""Operator library: relational kernel, graph analytics, dedup, similarity,
text analysis, multimodal plumbing."""
