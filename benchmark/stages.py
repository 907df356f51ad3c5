"""Per-stage timing breakdown of commit / proof / verify on the TPU.

Writes benchmark/results/stage_times.json — the data the next optimization
round starts from (VERDICT r4 item 2). Every stage is timed as its own jit
with blocking warmup (the remote compile service is asynchronous: unblocked
warmups pollute the first timed call with compile tail).

Usage: python benchmark/stages.py [--setup 5000] [--degree 4096]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    jax.block_until_ready(fn())
    times = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append((time.time() - t0) * 1e3)
    return round(statistics.median(times), 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setup", type=int, default=5000)
    ap.add_argument("--degree", type=int, default=4096)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results", "stage_times.json"))
    args = ap.parse_args()

    import random
    random.seed(1)
    kzg.init("BN254")
    pc = _ctx()
    fr = pc.ctx.fr
    pe = pc.poly
    res = {"setup_terms": args.setup, "degree": args.degree,
           "platform": str(jax.devices()[0])}

    t0 = time.time()
    ts = kzg.trusted_setup.from_secret(0xBEEF_CAFE_0123, args.setup)
    res["setup_gen_first_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    kzg.trusted_setup.from_secret(0xBEEF_CAFE_0123, args.setup)
    res["setup_gen_warm_ms"] = round((time.time() - t0) * 1e3, 1)

    data = "".join(chr(random.randrange(32, 127))
                   for _ in range(args.degree + 1))
    b = kzg.blob.from_string(data)
    p = kzg.poly.from_blob(b)
    res["from_blob_warm_ms"] = timeit(lambda: kzg.poly.from_blob(b), n=3)

    # -------- dispatch / transfer floor --------
    triv = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros((8,), jnp.uint32)
    res["dispatch_ms"] = timeit(lambda: triv(x8), n=10)
    res["scalar_readback_ms"] = timeit(
        lambda: int(jax.device_get(triv(x8)[0])), n=10)

    # -------- commit stages --------
    res["commit_e2e_ms"] = timeit(lambda: ts.create_commit(p))
    sh = ts._shifted1()
    eng = pc.ctx.msm_g1
    n = p._n
    dev = p.device_coeffs(pc)

    def msm_only(d, shifted):
        sraw = fr.canon(fr.from_mont(d))
        sl = {k: v[..., :n] for k, v in shifted.items()}
        return eng.msm_shifted(sraw, sl)

    jm = jax.jit(msm_only)
    res["commit_msm_only_ms"] = timeit(lambda: jm(dev, sh))

    def msm_affine(d, shifted):
        return pc.ctx.g1.affine_packed(msm_only(d, shifted))

    ja = jax.jit(msm_affine)
    res["commit_msm_affine_ms"] = timeit(lambda: ja(dev, sh))
    out = ja(dev, sh)
    res["commit_readback_ms"] = timeit(
        lambda: np.asarray(jax.device_get(out)))

    # -------- proof stages --------
    res["proof_e2e_ms"] = timeit(lambda: ts.create_proof(p, 0, 1))
    off_m = pc.ctx.fr.encode([0])[..., 0]
    P = pe._pad_last(dev, n)

    def poly_stage(Pd, om):
        ys = pe.multieval(Pd, om, 1)
        I = pe.interpolate(om, ys)
        Z = pe.vanishing(om, 1)
        q = pe.quotient(Pd, I, Z)
        return q

    jp = jax.jit(poly_stage)
    res["proof_polyops_ms"] = timeit(lambda: jp(P, off_m))

    def pq_stage(Pd, om):
        return pe.multieval(Pd, om, 1)

    res["proof_multieval_ms"] = timeit(
        lambda: jax.jit(pq_stage)(P, off_m))

    # -------- verify stages --------
    c = ts.create_commit(p)
    pr = ts.create_proof(p, 0, 1)
    blob1 = kzg.blob.from_string(data[0], 0)
    assert ts.verify_proof(c, pr, blob1)
    res["verify_e2e_ms"] = timeit(lambda: ts.verify_proof(c, pr, blob1))

    eng2 = pc.pairing_engine()
    g1d = ts._g1_points_dev()
    g2d = ts._g2_points_dev()
    g1eng, g2eng = pc.ctx.msm_g1, pc.ctx.msm_g2
    from kzg_tpu.fields.mont import ints_to_limbs
    r = pc.cp.r
    ys_raw = np.asarray(ints_to_limbs([ord(data[0])], fr.L))
    off_raw = np.asarray(ints_to_limbs([0], fr.L))
    k = 1

    def vmath(ysr, offr, g1dd, g2dd):
        ysd = fr.to_mont(ysr)
        om = fr.to_mont(offr)[..., 0]
        I = pe.interpolate(om, ysd)
        Z = pe.vanishing(om, k)
        Iraw = fr.canon(fr.from_mont(I))
        Zraw = fr.canon(fr.from_mont(Z))
        g1s = {kk: v[..., :k] for kk, v in g1dd.items()}
        g2s = {kk: v[..., :k + 1] for kk, v in g2dd.items()}
        zc = g2eng.msm(Zraw, g2s)
        ic = g1eng.msm(Iraw, g1s)
        return zc, ic

    jv = jax.jit(vmath)
    res["verify_math_ms"] = timeit(
        lambda: jv(ys_raw, off_raw, g1d, g2d))

    def g2msm_only(ysr, offr, g2dd):
        om = fr.to_mont(offr)[..., 0]
        Z = pe.vanishing(om, k)
        Zraw = fr.canon(fr.from_mont(Z))
        g2s = {kk: v[..., :k + 1] for kk, v in g2dd.items()}
        return g2eng.msm(Zraw, g2s)

    res["verify_g2msm_ms"] = timeit(
        lambda: jax.jit(g2msm_only)(ys_raw, off_raw, g2d))

    zc, ic = jv(ys_raw, off_raw, g1d, g2d)
    g2gen = pc.g2gen_dev()
    cm = {kk: v[..., 0] for kk, v in
          pc.ctx.g1.encode_points([c.curve_point]).items()}
    prf = {kk: v[..., 0] for kk, v in
           pc.ctx.g1.encode_points([pr.curve_point]).items()}

    jpc = jax.jit(eng2.pairing_check)
    res["verify_pairing_check_ms"] = timeit(
        lambda: jpc(zc, prf, g2gen, cm))

    # pairing internals
    t12 = eng2.t12
    g1c, g2c = pc.ctx.g1, pc.ctx.g2

    def affinize(Qa, Pa, Qb, Pb):
        F2 = pc.ctx.fp2
        F = F2.base
        Q = {kk: jnp.stack([Qa[kk], Qb[kk]], axis=-1)
             for kk in ("x", "y", "z")}
        P2 = {kk: jnp.stack([Pa[kk], Pb[kk]], axis=-1)
              for kk in ("x", "y", "z")}
        nrm = F2._norm_val(Q["z"])
        zs = jnp.concatenate([P2["z"], nrm], axis=-1)
        inv4 = F.batch_inv(zs, axis=1)
        return inv4

    res["verify_affinize_ms"] = timeit(
        lambda: jax.jit(affinize)(zc, prf, g2gen, cm))

    def miller_only(Qa, Pa):
        F = pc.ctx.fp
        xp, yp, _ = g1c.to_affine(Pa)
        qx, qy, _ = g2c.to_affine(Qa)
        Qd = g2c.from_affine(qx, qy)
        Qb = {kk: v[..., None] for kk, v in Qd.items()}
        return eng2.miller(Qb, (xp[..., None], yp[..., None]))

    jm2 = jax.jit(miller_only)
    res["verify_miller1_ms"] = timeit(lambda: jm2(zc, prf))
    m = jm2(zc, prf)
    u = jax.jit(lambda mm: t12.mul(mm[..., 0, :],
                                   t12.conj_s(mm[..., 0, :])))(m)
    ju = jax.jit(eng2._unity_check)
    res["verify_unity_ms"] = timeit(lambda: ju(u))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
