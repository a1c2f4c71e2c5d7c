"""ML path: per-band normalization and multiclass classification over
labeled pixel samples (SURVEY.md §2.10)."""
