"""Operator library: relational surface (SURVEY.md §2.3) + LLM-data
extensions (SURVEY.md §2.4). Modules register declared queries with
``plans.registry`` at import time."""
