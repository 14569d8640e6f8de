"""Segment-store index: build (M3), query via block-max pruned top-k
(M4), merge/tombstones (M5). SURVEY.md §1.3, §3.2, §4."""
