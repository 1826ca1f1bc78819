"""Column-level function library: text, dedup, similarity, multimodal."""
