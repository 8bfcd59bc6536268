"""Pipeline plans: medallion (bronze->silver->gold), MV registry,
run-log, dependency-gated execution."""
