"""Q1-Q22: the general relational surface (SURVEY.md §2.3). Populated incrementally."""
