"""Engine dispatch for the per-genome sweep kernels.

opt.engine == "host": exact NumPy oracle (ops/sweep.py).
opt.engine == "jax":  jit device kernels (ops/device.py) with host fallback
                      on float-predicate ambiguity. Identical results.
"""
from __future__ import annotations

from ..core.data import DataSet, Genome
from ..options import PgOpt
from . import sweep as host_sweep


def shadow(opt: PgOpt, d: DataSet, g: Genome, cal_dom_sc: bool) -> int:
    if opt.engine in ("jax", "sharded"):
        from . import device_engine
        return device_engine.shadow(opt, d, g, cal_dom_sc)
    if opt.engine == "host-ref":  # scalar oracle (tests)
        return host_sweep.shadow(opt, d, g, cal_dom_sc)
    from . import sweep_vec
    return sweep_vec.shadow(opt, d, g, cal_dom_sc)


def flt_ov_isoform(opt: PgOpt, d: DataSet, g: Genome) -> int:
    if opt.engine in ("jax", "sharded"):
        from . import device_engine
        return device_engine.flt_ov_isoform(opt, d, g)
    if opt.engine == "host-ref":
        return host_sweep.flt_ov_isoform(opt, d, g)
    from . import sweep_vec
    return sweep_vec.flt_ov_isoform(opt, d, g)
