"""Function library: text analysis, doc dedup, similarity, multimodal."""
