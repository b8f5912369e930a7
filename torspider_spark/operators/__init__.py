"""Relational operators of the crawl engine (SURVEY.md §2)."""
