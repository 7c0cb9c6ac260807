"""Training engines and evaluators."""
