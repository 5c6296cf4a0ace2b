"""Placeholder — filled in as operators land (SURVEY.md §7 phases)."""
