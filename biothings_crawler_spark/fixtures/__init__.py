"""Deterministic synthetic fixtures (FIXTURES.md). Pure functions of
(seed=42, row id) — byte-identical across runs and parallelism levels."""
