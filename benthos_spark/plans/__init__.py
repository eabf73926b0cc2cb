"""Query catalog + plan inspection utilities."""
