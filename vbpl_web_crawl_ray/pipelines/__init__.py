"""End-to-end pipelines: relational conformance queries and the crawl driver."""
