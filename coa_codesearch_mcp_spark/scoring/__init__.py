"""Multi-factor re-scoring layer (reference: Scoring/*.cs)."""
