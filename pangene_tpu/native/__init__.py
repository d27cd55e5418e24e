"""Native (C) host helpers: zlib PAF parser and bit-exact long-double score
adjustment. Auto-built with the system compiler on first use; pure-Python
fallbacks exist everywhere."""
try:
    from .loader import score_adj_exact, parse_paf_native  # noqa: F401
except Exception:  # pragma: no cover
    score_adj_exact = None
    parse_paf_native = None
