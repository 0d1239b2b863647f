"""Query engine: AST, planner ports, BM25 scoring, distributed top-k."""
