"""Stage-by-stage timing of the verify path on the current backend.

Times, with compile excluded (second call):
  * a trivial jit dispatch (measures tunnel/dispatch overhead)
  * verify fn_math stage
  * miller loop alone
  * final_exp alone
  * full pairing_check
  * end-to-end verify_proof
"""
import sys
import time

import jax
import jax.numpy as jnp

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx


def timeit(label, fn, n=5):
    jax.block_until_ready(fn())  # warm/compile (block: remote compile is
    jax.block_until_ready(fn())  # async — unblocked warmup polluted timings)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:28s} {dt:9.2f} ms", file=sys.stderr)
    return dt


def main():
    curve = sys.argv[1] if len(sys.argv) > 1 else "BN254"
    kzg.init(curve)
    pc = _ctx()
    ts = kzg.trusted_setup.from_secret(12345, 16)
    b = kzg.blob.from_string("hello")
    p = kzg.poly.from_blob(b)
    c = ts.create_commit(p)
    pr = ts.create_proof(p, 0, 1)
    ok = ts.verify_proof(c, pr, kzg.blob.from_string("h", 0))
    print(f"# verify_ok={ok}", file=sys.stderr)
    assert ok

    # dispatch overhead
    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.uint32)
    timeit("trivial dispatch", lambda: triv(x))

    # end-to-end verify
    blob1 = kzg.blob.from_string("h", 0)
    timeit("verify_proof e2e", lambda: ts.verify_proof(c, pr, blob1))

    # pairing stages
    eng = pc.pairing_engine()
    t12 = eng.t12
    g2 = pc.ctx.g2
    g1 = pc.ctx.g1
    g2gen = {k: v[..., 0] for k, v in
             g2.encode_points([pc.cp.g2]).items()}
    g1gen = {k: v[..., 0] for k, v in
             g1.encode_points([pc.cp.g1]).items()}

    Q = {k: jnp.stack([v, v], axis=-1) for k, v in g2gen.items()}
    P = {k: jnp.stack([v, v], axis=-1) for k, v in g1gen.items()}

    def run_miller():
        xpa, ypa, _ = g1.to_affine(P)
        return eng.miller(Q, (xpa, ypa))

    jm = jax.jit(run_miller)
    m = jm()
    timeit("miller (batch2)", lambda: jm())

    ma = m[..., 0, :]
    u = jax.jit(lambda x: eng.t12.mul(x[..., 0, :],
                                      eng.t12.conj_s(x[..., 1, :])))(m)
    jf = jax.jit(eng._unity_check)
    timeit("unity_check", lambda: jf(u))

    jpc = jax.jit(eng.pairing_check)
    timeit("pairing_check jit",
           lambda: jpc(g2gen, g1gen, g2gen, g1gen))

    # one Fp12 mul / sqr at batch ()
    one = t12.one(())
    jmul = jax.jit(lambda a: t12.mul(a, a))
    timeit("fp12 sqr x1", lambda: jmul(one), n=20)

    def chain(a):
        for _ in range(32):
            a = t12.mul(a, a)
        return a
    jch = jax.jit(chain)
    timeit("fp12 sqr x32 chain", lambda: jch(one), n=5)

    def scan32(a):
        def body(acc, _):
            return t12.sqr(acc), None
        acc, _ = jax.lax.scan(body, a, jnp.arange(32))
        return acc
    jsc = jax.jit(scan32)
    timeit("fp12 sqr x32 scan", lambda: jsc(one), n=5)


if __name__ == "__main__":
    main()
