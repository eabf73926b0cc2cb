"""Deterministic synthetic data generators (seeded, no external data).

Mirrors the reference's `generate` input + `fake` function
(/root/reference/internal/impl/pure/input_generate.go:29,
internal/impl/lang/bloblang.go:79) as distributed, counter-based
generators: every row is a pure function of its index, so any scale
factor produces a prefix-consistent table.
"""
