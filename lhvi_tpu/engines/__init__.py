"""Inference engines (SURVEY.md §2 L3): each consumes the compiled IR."""
