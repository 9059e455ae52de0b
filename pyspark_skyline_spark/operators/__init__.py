"""Operator modules: skyline (flagship), dedup, similarity, text, topk,
multimodal."""
