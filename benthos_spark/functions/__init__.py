"""Expression-layer helpers (the Bloblang-equivalent surface).

The reference's per-message mapping language (Bloblang,
/root/reference/internal/bloblang/) becomes PySpark Column expressions so
Catalyst codegen executes them; binary payload work (audio codecs) is the
single vectorized pandas-UDF surface.
"""
