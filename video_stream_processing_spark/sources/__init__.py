"""Sources — ingest surface (SURVEY.md §2.1 #1-2, #6-7)."""
