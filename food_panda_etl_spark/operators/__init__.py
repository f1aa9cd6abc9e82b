"""Custom operators Spark lacks as single built-ins (SURVEY.md §2.3 J6/J7,
§2.10) — each expressed as a composition of DataFrame ops so Catalyst still
optimizes the pieces; no RDDs, no Catalyst extensions required."""
