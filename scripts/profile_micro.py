"""Micro-experiments: where does per-op overhead live on this backend?

Times fp12 sqr chains in different structural forms, plus base-field mul
cost in-scan, to decide the pairing-engine optimization strategy.
"""
import sys
import time

import jax
import jax.numpy as jnp

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx


def timeit(label, fn, n=5):
    fn()
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:34s} {dt:9.2f} ms", file=sys.stderr)
    return dt


def main():
    kzg.init("BN254")
    pc = _ctx()
    eng = pc.pairing_engine()
    t12 = eng.t12
    F = pc.ctx.fr
    one = t12.one(())

    # 32 sqr as plain chain (baseline: slow)
    def chain(a):
        for _ in range(32):
            a = t12.mul(a, a)
        return a
    timeit("chain32 plain", lambda: jax.jit(chain)(one))

    # 32 sqr via fori_loop
    def floop(a):
        return jax.lax.fori_loop(0, 32, lambda i, x: t12.mul(x, x), a)
    timeit("chain32 fori_loop", lambda: jax.jit(floop)(one))

    # 32 sqr chain wrapped in a length-1 scan
    def wrapped(a):
        def body(c, _):
            return chain(c), None
        out, _ = jax.lax.scan(body, a, None, length=1)
        return out
    timeit("chain32 scan-length-1", lambda: jax.jit(wrapped)(one))

    # 8-sqr body scanned 4 times
    def seg(a):
        def body(c, _):
            for _ in range(8):
                c = t12.mul(c, c)
            return c, None
        out, _ = jax.lax.scan(body, a, None, length=4)
        return out
    timeit("chain32 as 4x8 scan", lambda: jax.jit(seg)(one))

    # base field mul in a 64-step scan, batch 2
    x = F.ones((2,))
    def bscan(a):
        def body(c, _):
            return F.mul(c, c), None
        out, _ = jax.lax.scan(body, a, None, length=64)
        return out
    timeit("base mul x64 scan (b2)", lambda: jax.jit(bscan)(x))

    # base field mul in a 64-step scan, batch 1024
    x2 = F.ones((1024,))
    timeit("base mul x64 scan (b1024)", lambda: jax.jit(bscan)(x2))

    # norm16 in a 64-step scan
    def nscan(a):
        def body(c, _):
            return F._norm16(c), None
        out, _ = jax.lax.scan(body, a, None, length=64)
        return out
    timeit("norm16 x64 scan (b2)", lambda: jax.jit(nscan)(x))

    # Fp2 mul 64-step scan (current impl: 3 sequential base muls)
    F2 = pc.ctx.fp2
    y = F2.ones((2,))
    def f2scan(a):
        def body(c, _):
            return F2.mul(c, c), None
        out, _ = jax.lax.scan(body, a, None, length=64)
        return out
    timeit("fp2 mul x64 scan (b2)", lambda: jax.jit(f2scan)(y))


if __name__ == "__main__":
    main()
