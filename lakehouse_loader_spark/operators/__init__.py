"""Scale-out extension operators (SURVEY.md §2c) — dedup, similarity search,
text analysis, multimodal columns, as-of join.

Design rule for every operator here: express the computation as
joins/aggregations/windows over partitioned data — never a driver-side
collect — so the same code runs at 100 TB on a real cluster.
"""
