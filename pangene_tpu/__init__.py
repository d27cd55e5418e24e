"""pangene_tpu: TPU-native pangenome gene-graph engine (JAX/XLA/Pallas).

Re-implements the full capability surface of lh3/pangene v1.1-r231 with a
TPU-first architecture: host-side PAF ingest and GFA emission around
jit/vmap/shard_map device kernels for the per-genome hit-filter sweeps,
adjacency extraction and cross-genome reductions.
"""
from .options import PgOpt, PG_VERSION  # noqa: F401
