"""Training-data pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing.

These are first-class engine components designed for the same 100 TB
deployment as the index build: JVM-side expressions where possible,
Arrow-batched pandas UDFs where not, shuffle strategies documented per
function.
"""
