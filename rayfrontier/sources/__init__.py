"""Sources & sinks: shard-partitioned pages store (keyed-lookup fetch, SURVEY.md
J5/S2) and the Lance-style atomic wave-checkpoint layout (SURVEY.md K10 —
Parquet backend in-sandbox; the logical layout is storage-engine agnostic)."""
