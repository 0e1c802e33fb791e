"""Export sinks (SURVEY.md A8-A12)."""
