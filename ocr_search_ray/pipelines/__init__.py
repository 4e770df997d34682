"""End-to-end pipeline compositions (SURVEY.md §3)."""
