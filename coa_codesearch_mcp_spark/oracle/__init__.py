"""Single-node oracle (pure pandas) — golden-file generator."""
