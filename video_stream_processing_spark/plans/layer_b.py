"""Layer B — the relational/analytic query surface (SURVEY.md §2.5):
the operators the reference's Doris fact table implies. Populated in M2."""
