"""Operator surface: reference-parity pipeline transforms plus the
batch-analytics extension set (relational, dedup, similarity, text,
multimodal)."""
