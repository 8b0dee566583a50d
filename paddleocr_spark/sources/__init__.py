"""Table and file sources (SURVEY.md §2.1)."""
