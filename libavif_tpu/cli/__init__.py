"""Command-line tools: avifenc / avifdec equivalents (SURVEY.md §2.3)."""
