"""Measure dispatch cost vs device-resident argument size, and count the
true cost of each protocol-op stage at setup 5000."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx


def timeit(label, fn, n=10):
    fn()
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:38s} {dt:9.2f} ms", file=sys.stderr)
    return dt


def main():
    kzg.init("BN254")
    pc = _ctx()

    f = jax.jit(lambda x: x[0, 0] + 1)
    for mb in (0.001, 1, 8, 32):
        n = max(1, int(mb * 1e6 / 4))
        x = jnp.zeros((1, n), jnp.uint32)
        jax.block_until_ready(x)
        timeit(f"dispatch {mb}MB device arg", lambda x=x: f(x))

    # many small args
    g = jax.jit(lambda *xs: xs[0] + len(xs))
    xs = [jnp.zeros((8,), jnp.uint32) for _ in range(12)]
    timeit("dispatch 12 small args", lambda: g(*xs))

    # host->device transfer of 1 MB
    h = np.zeros((250000,), np.uint32)
    timeit("put 1MB host array", lambda: jax.device_put(h))

    # full protocol ops at setup 5000
    ts = kzg.trusted_setup.from_secret(0xBEEF_CAFE_0123, 5000)
    import random
    random.seed(1)
    data = "".join(chr(random.randrange(32, 127)) for _ in range(4097))
    b = kzg.blob.from_string(data)
    t0 = time.time()
    p = kzg.poly.from_blob(b)
    jax.block_until_ready(p._dev)
    print(f"# from_blob {time.time()-t0:.1f}s", file=sys.stderr)
    c = ts.create_commit(p)
    pr = ts.create_proof(p, 0, 1)
    timeit("create_commit (deg4096)", lambda: ts.create_commit(p), n=5)
    timeit("create_proof (deg4096,k1)", lambda: ts.create_proof(p, 0, 1), n=5)
    b1 = kzg.blob.from_string(data[0], 0)
    ok = ts.verify_proof(c, pr, b1)
    print(f"# ok={ok}", file=sys.stderr)
    timeit("verify_proof (k=1)", lambda: ts.verify_proof(c, pr, b1), n=5)

    # commit stages
    sh = ts._shifted1()
    sraw = pc.scalars_raw(p.coeffs)
    eng = pc.ctx.msm_g1
    nn = 4097

    def raw_msm(sr, shifted):
        sl = {k: v[..., :nn] for k, v in shifted.items()}
        return eng.msm_shifted(sr, sl)
    jm = jax.jit(raw_msm)
    timeit("msm jit only (no decode)", lambda: jm(sraw, sh), n=5)
    out = jm(sraw, sh)
    timeit("decode_points(1)", lambda: pc.ctx.g1.decode_points(out), n=5)

    # verify stages (k=1)
    k = 1
    ys = pc.poly.encode([ord(data[0])])
    off_m = pc.ctx.fr.encode([0])[..., 0]
    timeit("encode ys (1 val)", lambda: pc.poly.encode([ord(data[0])]), n=5)
    cmE = pc.ctx.g1.encode_points([c.curve_point])
    timeit("encode_points commit",
           lambda: pc.ctx.g1.encode_points([c.curve_point]), n=5)
    g1d = ts._g1_points_dev()
    g2d = ts._g2_points_dev()
    fm = pc._jit_cache.get(("verify_math", k, 5000))
    if fm is not None:
        timeit("fn_math jit", lambda: fm(ys, off_m, cmE, g1d, g2d), n=5)
        zc, p2 = fm(ys, off_m, cmE, g1d, g2d)
        prf = pc.ctx.g1.encode_points([pr.curve_point])
        fp = pc._jit_cache.get(("verify_pair",))
        timeit("fn_pair jit", lambda: fp(zc, prf, p2), n=5)
        timeit("fn_pair + bool", lambda: bool(fp(zc, prf, p2)), n=5)


if __name__ == "__main__":
    main()
