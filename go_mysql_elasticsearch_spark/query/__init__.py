"""Query engine: BM25 scoring (naive + block-max WAND), ES-style
query operators, and aggregations."""
