"""LLM-pipeline operator queries — populated in M6."""
