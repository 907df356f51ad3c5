"""Generic Pallas pointwise fuser: run any batched field/group computation
as ONE VMEM-resident TPU kernel.

Why this exists: the limb-decomposed field arithmetic (fields/mont.py) turns
a single Fp multiply into ~50 XLA ops over (N8, batch) tensors. Left to XLA,
each complete EC addition (~14 field muls, groups/ec.py) streams hundreds of
intermediate tensors through HBM — ~25 KB of traffic per point-add lane,
hopelessly bandwidth-bound (the reference has no such problem: MIRACL keeps a
point in registers, src/trusted_setup.cpp:163-174). The fuser loads the
inputs into VMEM once, traces the *whole* composite computation (field mul,
complete point add, segmented-scan combine, NTT butterfly, ...) inside a
single Pallas kernel so every intermediate lives on-chip, and writes only the
final outputs: ~1 KB per point-add lane, a ~25x traffic cut on the MSM hot
path.

Usage:
    out = fuse_pointwise(fn, args, batch_ndim=1)

* `fn(*args)` is any jax-traceable function whose computation is pointwise
  over the trailing `batch_ndim` axes of every argument leaf (leading "lead"
  axes — limb, coordinate — may differ per leaf and are kept whole in VMEM).
* Array constants closed over by `fn` (Montgomery reduction matrices, curve
  coefficients) are auto-lifted from the jaxpr and passed as kernel inputs
  (Pallas forbids captured constants); they are replicated to every grid
  program.
* Falls back to plain `fn(*args)` off-TPU (CPU tests, interpret mode) and
  for tiny batches where kernel-launch overhead dominates.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:                                                     # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:                                        # pragma: no cover
    _HAVE_PALLAS = False

LANE_TILE = 256           # batch lanes per grid program (2 * 128); composite
                          # kernels hold many live limb tensors per lane, and
                          # Mosaic's scoped-VMEM stack is ~16 MB
MIN_LANES = 256           # below this, XLA fusion is good enough
# Fusion granularity policy (measured on the v5e toolchain):
#  * per-MUL kernels (~80 ops) are the sweet spot: Mosaic compiles the body
#    once (~60 s) then ~1.5 s per additional shape, and VMEM-residency cuts
#    the mul's HBM traffic ~100x (the XLA path materializes the (N8,N8,lanes)
#    outer product through ~5 HBM sweeps — measured 275 ms of pure bandwidth
#    in one deg-4096 bucket accumulation);
#  * COMPOSITE kernels (whole point-add, dbl chains) are compile-latency
#    disasters — one fused 8-doubling chain took >7 min in Mosaic — so they
#    are opt-in via KZG_TPU_PALLAS_COMPOSITE=1 and off the default path.
# KZG_TPU_NO_PALLAS=1 force-disables everything (CPU tests force it off
# implicitly: fusion only activates on the TPU backend).
_DISABLE = os.environ.get("KZG_TPU_NO_PALLAS", "") not in ("", "0")
COMPOSITE = os.environ.get("KZG_TPU_PALLAS_COMPOSITE", "") not in ("", "0")
_FUSING = [False]         # re-entrancy guard: a fused fn that itself calls
                          # fuse_pointwise must inline (no nested pallas_call)


def _on_tpu() -> bool:
    if _DISABLE or not _HAVE_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                    # pragma: no cover
        return False


def _flatten_batch(leaf, batch_ndim):
    lead = leaf.shape[: leaf.ndim - batch_ndim]
    b = int(np.prod(leaf.shape[leaf.ndim - batch_ndim:], dtype=np.int64)) \
        if batch_ndim else 1
    return leaf.reshape(lead + (b,)), lead


def fuse_composite(fn, args, batch_ndim: int = 1, tile: int = LANE_TILE):
    """fuse_pointwise for composite (multi-field-op) bodies — a plain call
    unless KZG_TPU_PALLAS_COMPOSITE=1 (see policy note above)."""
    if not COMPOSITE:
        return fn(*args)
    return fuse_pointwise(fn, args, batch_ndim, tile)


def fuse_pointwise(fn, args, batch_ndim: int = 1, tile: int = LANE_TILE):
    """Run fn(*args) as one Pallas kernel, tiled over the shared trailing
    batch axes. Returns exactly what fn returns (single array or tuple/list
    of arrays). Requires every input/output leaf to end with the same
    batch shape."""
    flat_in, treedef_in = jax.tree.flatten(tuple(args))
    if not flat_in or _FUSING[0]:
        return fn(*args)
    batch_shape = flat_in[0].shape[flat_in[0].ndim - batch_ndim:] \
        if batch_ndim else ()
    lanes = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    if not _on_tpu() or lanes < MIN_LANES:
        return fn(*args)
    for leaf in flat_in:
        if leaf.shape[leaf.ndim - batch_ndim:] != batch_shape:
            return fn(*args)                   # mismatched batch: fall back

    # --- flatten batch to one lane axis, pad to the tile ------------------
    ins, in_leads = [], []
    for leaf in flat_in:
        v, lead = _flatten_batch(leaf, batch_ndim)
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.uint32)
        ins.append(v)
        in_leads.append(lead)
    n_tiles = -(-lanes // tile)
    padded = n_tiles * tile

    # --- trace ONE TILE to a jaxpr; lift captured array constants ---------
    # (the computation is pointwise over batch lanes, so a tile-shaped trace
    # is valid for every grid program; Pallas forbids captured constants, so
    # the jaxpr's consts become explicit replicated kernel inputs)
    # fn must be batch-shape-agnostic (pure pointwise over trailing axes):
    # inside the kernel each leaf carries a 1-D lane batch of length `tile`
    def flat_fn(*leaves):
        out = fn(*jax.tree.unflatten(treedef_in, leaves))
        flat_out, td = jax.tree.flatten(out)
        flat_fn.out_treedef = td
        return flat_out

    abstract = [jax.ShapeDtypeStruct(lead + (tile,), leaf.dtype)
                for leaf, lead in zip(flat_in, in_leads)]
    _FUSING[0] = True
    try:
        closed = jax.make_jaxpr(flat_fn)(*abstract)
    finally:
        _FUSING[0] = False
    out_treedef = flat_fn.out_treedef
    # normalize constants to >= 2-D for TPU refs; restore shapes in-kernel
    const_shapes = [jnp.asarray(c).shape for c in closed.consts]
    consts = [jnp.asarray(c).reshape((1,) * max(0, 2 - len(cs)) + cs)
              for c, cs in zip(closed.consts, const_shapes)]
    out_avals = closed.out_avals
    for aval in out_avals:
        if aval.shape[-1:] != (tile,):
            return fn(*args)                   # non-pointwise output

    def pad(v):
        if padded == lanes:
            return v
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, padded - lanes)])

    ins = [pad(v) for v in ins]

    in_dtypes = [leaf.dtype for leaf in flat_in]

    def kernel(*refs):
        cvals = [r[:].reshape(cs) for r, cs in
                 zip(refs[: len(consts)], const_shapes)]
        avals_ = []
        for r, dt, lead in zip(refs[len(consts): len(consts) + len(ins)],
                               in_dtypes, in_leads):
            v = r[:]
            if dt == jnp.bool_:
                v = v != 0
            avals_.append(v.reshape(lead + (tile,)))
        outs = jax.core.eval_jaxpr(closed.jaxpr, cvals, *avals_)
        for oref, o in zip(refs[len(consts) + len(ins):], outs):
            # inside the kernel the batch is already flattened to ONE trailing
            # lane axis (the abstract inputs were lead + (tile,)), so the
            # output's lead is everything but the last axis — regardless of
            # the caller's batch_ndim
            if o.dtype == jnp.bool_:
                o = o.astype(jnp.uint32)
            oref[:] = o

    def cspec(c):
        return pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                            memory_space=pltpu.VMEM)

    def bspec(lead):
        nd = len(lead) + 1
        return pl.BlockSpec(lead + (tile,),
                            lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                            memory_space=pltpu.VMEM)

    out_shapes, out_specs, out_info = [], [], []
    for aval in out_avals:
        lead = aval.shape[:-1]     # trace already flattened batch to 1 axis
        dt = jnp.uint32 if aval.dtype == jnp.bool_ else aval.dtype
        out_shapes.append(jax.ShapeDtypeStruct(lead + (padded,), dt))
        out_specs.append(bspec(lead))
        out_info.append((lead, aval.dtype))

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[cspec(c) for c in consts] + [
            bspec(lead) for lead in in_leads],
        out_specs=out_specs,
        out_shape=out_shapes,
    )
    outs = call(*consts, *ins)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    final = []
    for v, (lead, dt) in zip(outs, out_info):
        v = v[..., :lanes].reshape(lead + batch_shape)
        if dt == jnp.bool_:
            v = v != 0
        final.append(v)
    return jax.tree.unflatten(out_treedef, final)
