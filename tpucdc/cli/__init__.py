"""L8 CLI: tpucdc train|compress|decompress|eval (SURVEY.md C25)."""
