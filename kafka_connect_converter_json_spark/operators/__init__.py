"""Dataflow + relational operators (SURVEY.md §2.1 O1-O22, §2.2 N1-N8,
and the training-data-pipeline extensions: dedup, similarity, text,
multimodal)."""
