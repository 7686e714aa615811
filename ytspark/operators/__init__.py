"""Large-scale pipeline operators beyond the reference's own surface
(BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal column plumbing. Each operator is a composition of
built-in DataFrame ops wherever semantics allow; Pandas-UDF paths are
used only where built-ins genuinely can't express the computation.
"""
