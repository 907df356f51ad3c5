"""Value-bound stress tests of the stacked Fp2 / norm-free tower ops (CPU).

Chains operations WITHOUT intermediate canonicalization (as the miller loop
does) and compares against the exact python oracle after each step.
"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_disable_most_optimizations', True)
import numpy as np
import jax.numpy as jnp
import random

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx
from kzg_tpu.refmodel import model as rm

kzg.init('BN254')
pc = _ctx()
cp = pc.cp
F = pc.ctx.fp
F2 = pc.ctx.fp2
eng = pc.pairing_engine()
t12 = eng.t12
tw = rm.Tower(cp)
random.seed(3)


def r2():
    return (random.randrange(cp.p), random.randrange(cp.p))


def re12():
    return tuple(r2() for _ in range(6))


# ---- 1. chained Fp2 muls + subs (no canon) --------------------------------
def chain_f2(a, b, n):
    # x <- x*y; y <- x - y alternating, like the line computations
    for _ in range(n):
        a = F2.mul(a, b)
        b = F2.sub(a, b, k=16)
    return a, b


a0, b0 = r2(), r2()
fn = jax.jit(lambda a, b: chain_f2(a, b, 12))
ga, gb = fn(F2.encode([a0])[..., 0], F2.encode([b0])[..., 0])
ea, eb = a0, b0
for _ in range(12):
    ea = tw.e2_mul(ea, eb)
    eb = tw.e2_sub(ea, eb) if hasattr(tw, 'e2_sub') else (
        (ea[0] - eb[0]) % cp.p, (ea[1] - eb[1]) % cp.p)
got = (F2.decode(ga[..., None]), F2.decode(gb[..., None]))
print('fp2 chain ok:', got[0][0] == ea and got[1][0] == eb)

# ---- 2. chained Fp12 muls (no norm) ---------------------------------------
u0, v0 = re12(), re12()


def chain12(u, v, n):
    for _ in range(n):
        u = t12.mul(u, v)
        u = t12.sqr(u)
    return u


fn = jax.jit(lambda u, v: chain12(u, v, 10))
gu = fn(F2.encode(list(u0)), F2.encode(list(v0)))
eu, ev = tw.e12_from_coeffs(list(u0)), tw.e12_from_coeffs(list(v0))
for _ in range(10):
    eu = tw.e12_mul(eu, ev)
    eu = tw.e12_mul(eu, eu)
print('fp12 chain ok:', tuple(F2.decode(gu)) == tw.e12_coeffs(eu))

# ---- 3. sparse-mul chain (line-shaped) ------------------------------------
f0 = re12()
cs = [r2() for _ in range(3)]
pos = [0, 1, 3]


def chain_sp(f, c0, c1, c3, n):
    for _ in range(n):
        f = t12.mul_sparse(t12.sqr(f), [(0, c0), (1, c1), (3, c3)])
    return f


cd = [F2.encode([c])[..., 0] for c in cs]
fn = jax.jit(lambda f, c0, c1, c3: chain_sp(f, c0, c1, c3, 10))
gf = fn(F2.encode(list(f0)), *cd)
dense = [(0, 0)] * 6
for p_, c_ in zip(pos, cs):
    dense[p_] = c_
ef = tw.e12_from_coeffs(list(f0))
ec = tw.e12_from_coeffs(dense)
for _ in range(10):
    ef = tw.e12_mul(tw.e12_mul(ef, ef), ec)
print('sparse chain ok:', tuple(F2.decode(gf)) == tw.e12_coeffs(ef))

# ---- 4. windowed pow_const / inv ------------------------------------------
for trial in range(5):
    x = random.randrange(1, cp.p)
    xe = F.encode([x])
    gi = F.decode(jax.jit(F.inv)(xe))
    print(f'inv trial {trial} ok:', gi[0] == pow(x, -1, cp.p))

# ---- 5. batch_inv ----------------------------------------------------------
xs = [random.randrange(cp.p) for _ in range(6)]
xs[2] = 0
gb = F.decode(jax.jit(lambda v: F.batch_inv(v, axis=1))(F.encode(xs)))
eb = [pow(x, -1, cp.p) if x else 0 for x in xs]
print('batch_inv ok:', gb == eb)

# ---- 6. frob chain ---------------------------------------------------------
def chainfr(u, n):
    for _ in range(n):
        u = t12.frob(u, eng.gamma_c)
        u = t12.sqr(u)
    return u


fn = jax.jit(lambda u: chainfr(u, 6))
gu = fn(F2.encode(list(u0)))
eu = tw.e12_from_coeffs(list(u0))
gams = rm.frobenius_gammas(tw)
for _ in range(6):
    eu = tw.e12_frob(eu, gams)
    eu = tw.e12_mul(eu, eu)
print('frob chain ok:', tuple(F2.decode(gu)) == tw.e12_coeffs(eu))

# ---- 7. conj_s on un-normalized values ------------------------------------
def cj(u, v):
    w = t12.mul(u, v)            # un-normalized ~36p values
    return t12.mul(t12.conj_s(w), w)


fn = jax.jit(cj)
gu = fn(F2.encode(list(u0)), F2.encode(list(v0)))
eu = tw.e12_mul(tw.e12_from_coeffs(list(u0)), tw.e12_from_coeffs(list(v0)))
ec = tw.e12_mul(tw.e12_conj(eu) if hasattr(tw, 'e12_conj') else
                tw.e12_from_coeffs([tw.e2_neg(c) if i % 2 else c
                                    for i, c in
                                    enumerate(tw.e12_coeffs(eu))]), eu)
print('conj_s chain ok:', tuple(F2.decode(gu)) == tw.e12_coeffs(ec))
