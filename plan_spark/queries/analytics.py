"""Analytics operators beyond the reference's surface (windows, set ops,
rollup/cube, as-of / range joins, sessionization, time buckets).

Populated incrementally; see SURVEY.md §2.5/§2.7 — the reference has no
window functions or set operations, so these are strictly-superset surface.
"""
