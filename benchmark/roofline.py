"""Per-kernel roofline: measured throughput vs chip speed-of-light.

BASELINE.json requires every hot field kernel benchmarked against a
per-chip roofline. The three kernels that carry the protocol:

  * Fr Montgomery mul  (the primitive under everything),
  * G1 complete point add (the Pippenger inner loop),
  * end-to-end G1 MSM (points/s — the north-star metric).

Speed-of-light model (TPU v5e defaults, override with --peak-*):
  * compute bound: the limb dataflow costs ~OPS_PER_* u32 VPU lane-ops per
    element (counted from the jaxpr, one op per output element per
    primitive); peak VPU rate = lanes * clock;
  * bandwidth bound: fused kernels read inputs + write outputs once;
    bytes/element over peak HBM bandwidth.
  The reported SOL is min(compute, bandwidth); utilization = measured/SOL.

Usage: python benchmark/roofline.py [--out roofline.json]
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (one chip): 4 VPU sub-lanes x 8x128 lanes x ~0.94 GHz, HBM ~819 GB/s
PEAK_VPU_OPS = 4 * 8 * 128 * 0.94e9        # u32 lane-ops/s
PEAK_HBM_BW = 819e9                        # bytes/s


def count_lane_ops(fn, *args):
    """u32 lane-ops of fn: sum over jaxpr equations of output element count
    (one VPU op per output element per primitive — a deliberate lower bound:
    it ignores ICI, register pressure, and multi-pass lowering)."""
    closed = jax.make_jaxpr(fn)(*args)
    total = 0

    def walk(jaxpr):
        nonlocal total
        for eqn in jaxpr.eqns:
            inner = []
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else [v]
                for x in vs:
                    if hasattr(x, "jaxpr"):          # ClosedJaxpr
                        inner.append(x.jaxpr)
                    elif hasattr(x, "eqns"):         # Jaxpr
                        inner.append(x)
            for j in inner:                          # trip counts ignored:
                walk(j)                              # keeps this a lower bound
            if not inner:
                for ov in eqn.outvars:
                    aval = getattr(ov, "aval", None)
                    if aval is not None and hasattr(aval, "shape"):
                        total += int(np.prod(aval.shape, dtype=np.int64))
    walk(closed.jaxpr)
    return total


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--curve", default="BN254")
    ap.add_argument("--lanes", type=int, default=1 << 20)
    ap.add_argument("--peak-vpu", type=float, default=PEAK_VPU_OPS)
    ap.add_argument("--peak-bw", type=float, default=PEAK_HBM_BW)
    args = ap.parse_args(argv)

    from kzg_tpu.context import get_context
    from kzg_tpu.fields.mont import ints_to_limbs
    from kzg_tpu.ops.poly import _fused
    from kzg_tpu.refmodel.model import G1 as OracleG1

    ctx = get_context(args.curve)
    F, J = ctx.fr, ctx.g1
    r = ctx.cp.r
    L = F.L
    random.seed(7)
    rows = []

    def report(name, per_elem_ops, bytes_per_elem, elems, secs):
        sol_compute = args.peak_vpu / per_elem_ops
        sol_bw = args.peak_bw / bytes_per_elem
        sol = min(sol_compute, sol_bw)
        meas = elems / secs
        rows.append({
            "kernel": name, "elements_per_s": meas,
            "sol_compute_per_s": sol_compute, "sol_bandwidth_per_s": sol_bw,
            "bound": "compute" if sol_compute < sol_bw else "bandwidth",
            "utilization": meas / sol,
            "lane_ops_per_element": per_elem_ops,
            "bytes_per_element": bytes_per_elem,
        })
        print(f"# {name}: {meas:.3e}/s  SOL {sol:.3e}/s "
              f"({rows[-1]['bound']}-bound)  util {meas / sol:.1%}",
              file=sys.stderr)

    # ---- Fr mul ----------------------------------------------------------
    n = args.lanes
    base = F.encode([random.randrange(r) for _ in range(4096)])
    A = jnp.tile(base, (1, n // 4096))
    B = jnp.roll(A, 1, axis=1)
    mul = jax.jit(_fused(F.mul))   # production path: Pallas-fused
    secs = timeit(mul, (A, B))
    one = F.encode([1, 2])
    ops = count_lane_ops(F._mul_impl, one, one) // 2
    report("fr_montgomery_mul", ops, 3 * L * 4, n, secs)

    # ---- G1 complete add -------------------------------------------------
    og = OracleG1(ctx.cp)
    k = 2048
    pts = []
    acc = og.gen
    for _ in range(k):
        pts.append(acc)
        acc = og.add(acc, acc)
    Pb = ctx.g1.encode_points(pts)
    npts = max(1 << 17, k)
    Pt = {kk: jnp.tile(v, (1, npts // k)) for kk, v in Pb.items()}
    Qt = {kk: jnp.roll(v, 3, axis=-1) for kk, v in Pt.items()}
    addf = jax.jit(_fused(J.add))  # production path: Pallas-fused muls
    secs = timeit(addf, (Pt, Qt))
    small = {kk: v[..., :2] for kk, v in Pb.items()}
    ops = count_lane_ops(J.add, small, small) // 2
    Lp = ctx.fp.L
    report("g1_complete_add", ops, 3 * 3 * Lp * 4, npts, secs)

    # ---- MSM (shifted-base Pippenger, deg 4096) --------------------------
    import kzg_tpu as kzg
    kzg.init(args.curve)
    ts = kzg.trusted_setup.from_secret(0xFEED, 5000)
    msg = "".join(chr(random.randrange(32, 127)) for _ in range(4097))
    p = kzg.poly.from_blob(kzg.blob.from_string(msg))
    ts.create_commit(p)                     # compile
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        c = ts.create_commit(p)
    secs = (time.perf_counter() - t0) / iters
    rows.append({"kernel": "g1_msm_commit_deg4096",
                 "elements_per_s": 4097 / secs,
                 "points_per_s_per_chip": 4097 / secs,
                 "ms": secs * 1e3})
    print(f"# msm commit deg4096: {secs * 1e3:.2f} ms "
          f"= {4097 / secs:.3e} points/s/chip", file=sys.stderr)

    out = {"curve": args.curve, "backend": jax.default_backend(),
           "peak_vpu_ops": args.peak_vpu, "peak_hbm_bw": args.peak_bw,
           "kernels": rows}
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
