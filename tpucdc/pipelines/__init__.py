"""L6 pipelines: train / compress / decompress / evaluate (SURVEY.md C17-C21)."""
