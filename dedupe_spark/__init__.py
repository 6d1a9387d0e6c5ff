"""dedupe_spark — a PySpark-native entity-resolution / record-linkage engine.

A from-scratch reimplementation of the query and data-processing
capabilities of renfeng/dedupe (see SURVEY.md) as idiomatic Spark
DataFrame transforms: blocking → pairwise scoring → transitive
clustering, plus the relational operator surface (filters, facets,
semi/anti joins, window counts, sorts) the reference expresses as Solr
queries, plus the large-scale training-data-pipeline operators
(dedup families, similarity search, text analysis, multimodal
plumbing) a 100 TB corpus needs.

Design stance (SURVEY.md §7.0): every stage is a pure
DataFrame → DataFrame function; no per-row Python (Arrow-batched
pandas UDFs only); no driver-side data loops; explicit partitioning /
skew handling where Catalyst can't infer it.
"""

__version__ = "0.1.0"
