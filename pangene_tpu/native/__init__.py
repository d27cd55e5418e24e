"""Optional native (C) helpers: bit-exact long-double score adjustment and a
fast PAF tokenizer. Importing fails gracefully; pure-Python fallbacks exist."""
try:
    from ._pgnative import score_adj_exact  # noqa: F401
except Exception:  # extension not built
    score_adj_exact = None
