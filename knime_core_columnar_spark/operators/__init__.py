"""Operator library: the relational surface the reference delegates to
consumer nodes (SURVEY.md §2.7) plus write-pipeline statistics (§2.3) and
the LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""
