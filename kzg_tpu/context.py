"""Per-curve kernel context: fields, groups, MSM engines (cached).

The reference picks the curve at compile time (one static library per curve,
Makefile:26-33); here a :class:`CurveContext` carries every constructed kernel
object for a runtime-selected curve.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax

# Persistent compilation cache: the protocol layer compiles one kernel per
# (operation, size) signature; caching them across processes makes CLI /
# demo / benchmark startup practical (first-ever compile is slow on the
# remote TPU compile service).
_cache_dir = os.environ.get(
    "KZG_TPU_JAX_CACHE", os.path.expanduser("~/.cache/kzg_tpu_jax"))
if _cache_dir in ("", "0", "off"):
    _cache_dir = None          # KZG_TPU_JAX_CACHE=off disables persistence
try:
    if _cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:                                          # pragma: no cover
    pass

from .curves.params import CurveParams, get_curve
from .fields.mont import Field
from .fields.quadratic import Fp2
from .groups.ec import Curve
from .ops.msm import MSMEngine


def make_g1(cp: CurveParams) -> Curve:
    return Curve(Field(cp.fp), 3 * cp.b, name=f"{cp.name}-G1")


def make_g2(cp: CurveParams) -> Curve:
    f2 = Fp2(Field(cp.fp), cp.qnr)
    b3 = (3 * cp.b2[0], 3 * cp.b2[1])
    return Curve(f2, b3, name=f"{cp.name}-G2")


class CurveContext:
    def __init__(self, cp: CurveParams):
        self.cp = cp
        self.fp = Field(cp.fp)
        self.fr = Field(cp.fr)
        self.fp2 = Fp2(self.fp, cp.qnr)
        self.g1 = Curve(self.fp, 3 * cp.b, name=f"{cp.name}-G1")
        self.g2 = Curve(self.fp2, (3 * cp.b2[0], 3 * cp.b2[1]),
                        name=f"{cp.name}-G2")
        self.msm_g1 = MSMEngine(self.g1, self.fr, cp.r)
        self.msm_g2 = MSMEngine(self.g2, self.fr, cp.r)


@lru_cache(maxsize=None)
def get_context(name: str) -> CurveContext:
    return CurveContext(get_curve(name))
