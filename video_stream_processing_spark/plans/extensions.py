"""Extensions — large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal). Populated in M4."""
