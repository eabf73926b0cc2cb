"""Streaming pipeline assembly (the reference's stream.Type graph,
/root/reference/internal/stream/type.go:98-152, as one DataFrame lineage)."""
