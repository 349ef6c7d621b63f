"""Extended large-scale data-pipeline operators (beyond the Luzzu-analogue
core): deduplication families, similarity search, text analysis,
relational patterns, multimodal plumbing.

Each operator is a Ray-Data-first composition (map_batches partials,
hash-shuffle groupbys, broadcast small sides) registered as a
``queries()`` entry in ``__ray_entry__.py``.
"""
