"""Domain pipelines built from the engine's primitives: the songs star-schema
ETL over nested landing documents (operators.star) and the multimodal
binary-column operators (operators.multimodal)."""
