"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal plumbing — first-class components alongside the CDC engine
(task brief: large-scale training-data pipeline operations)."""
