"""End-to-end Ray Data pipelines (crawl engine, parse/tokenize, verify/score,
dedup suites, similarity search, text analysis, stats aggregations)."""
