"""Relational operators of the engine: candidates, verify, clustering, substring."""
