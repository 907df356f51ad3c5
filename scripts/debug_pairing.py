"""Stage-by-stage oracle validation of the rewritten pairing engine (CPU)."""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_disable_most_optimizations', True)

import jax.numpy as jnp
import numpy as np

import kzg_tpu as kzg
from kzg_tpu.protocol.api import _ctx
from kzg_tpu.refmodel import model as rm

kzg.init('BN254')
pc = _ctx()
cp = pc.cp
eng = pc.pairing_engine()
t12 = eng.t12
F2 = pc.ctx.fp2
tw = rm.Tower(cp)

import random
random.seed(7)


def rand_e12():
    return tuple((random.randrange(cp.p), random.randrange(cp.p))
                 for _ in range(6))


def enc12(e):
    """oracle 6x(Fp2 pair) -> device tensor (2, L, 6)."""
    return F2.encode(list(e))


def dec12(x):
    """device (2, L, 6) -> oracle tuple."""
    out = F2.decode(x)
    return tuple(out)


# 1. Fp12 mul vs oracle
a, b = rand_e12(), rand_e12()
got = dec12(jax.jit(t12.mul)(enc12(a), enc12(b)))
exp = tw.e12_coeffs(tw.e12_mul(tw.e12_from_coeffs(list(a)),
                               tw.e12_from_coeffs(list(b))))
print('fp12 mul ok:', got == tuple(exp))

# 2. mul_sparse vs dense mul
terms_pos = [0, 1, 3]
cs = [(random.randrange(cp.p), random.randrange(cp.p)) for _ in terms_pos]
sparse_dense = [(0, 0)] * 6
for p_, c_ in zip(terms_pos, cs):
    sparse_dense[p_] = c_
f = rand_e12()
cd = [F2.encode([c])[..., 0] for c in cs]
got = dec12(jax.jit(lambda fe, c0, c1, c3: t12.mul_sparse(
    fe, [(0, c0), (1, c1), (3, c3)]))(enc12(f), *cd))
exp = tw.e12_coeffs(tw.e12_mul(tw.e12_from_coeffs(list(f)),
                               tw.e12_from_coeffs(sparse_dense)))
print('mul_sparse ok:', got == tuple(exp))

# 3. frob vs oracle
got = dec12(jax.jit(lambda x: t12.frob(x, eng.gamma_c))(enc12(a)))
exp = tw.e12_coeffs(tw.e12_frob(tw.e12_from_coeffs(list(a)),
                                rm.frobenius_gammas(tw)))
print('frob ok:', got == tuple(exp))

# 4. unity check: u = g^r -> True; u = g -> False
g = rand_e12()
gr = tw.e12_pow(tw.e12_from_coeffs(list(g)), cp.r)
uc = jax.jit(eng._unity_check)
print('unity(g^r) =', bool(uc(enc12(tw.e12_coeffs(gr)))), '(want True)')
print('unity(g)   =', bool(uc(enc12(g))), '(want False)')

# 5. fused dbl/add line group outputs vs groups.ec
og2 = rm.G2(cp)
Q = og2.mul(987, og2.gen)
Q2 = og2.mul(1234, og2.gen)
Qe = {k: v[..., 0] for k, v in pc.ctx.g2.encode_points([Q]).items()}
Q2e = {k: v[..., 0] for k, v in pc.ctx.g2.encode_points([Q2]).items()}
og1 = rm.G1(cp)
P1 = og1.mul(55, og1.gen)
P1e = {k: v[..., 0] for k, v in pc.ctx.g1.encode_points([P1]).items()}
xp, yp = P1e["x"], P1e["y"]

T2, _ = jax.jit(lambda T: eng._dbl_line(T, xp, yp))(Qe)
exp2 = og2.add(Q, Q)
got2 = pc.ctx.g2.decode_points({k: v[..., None] for k, v in T2.items()})[0]
print('dbl_line group ok:', got2 == exp2)

T3, _ = jax.jit(lambda T, Qx, Qy: eng._add_line(T, Qx, Qy, xp, yp))(
    Qe, Q2e["x"], Q2e["y"])
exp3 = og2.add(Q, Q2)
got3 = pc.ctx.g2.decode_points({k: v[..., None] for k, v in T3.items()})[0]
print('add_line group ok:', got3 == exp3)

# 6. full pairing check e(abG2, G1) == e(aG2, bG1)
orc = rm.Pairing(cp)
a_, b_ = 37, 91
Qa = og2.mul(a_ * b_, og2.gen)
Qb = og2.mul(a_, og2.gen)
Pa = og1.gen
Pb = og1.mul(b_, og1.gen)
Qae = {k: v[..., 0] for k, v in pc.ctx.g2.encode_points([Qa]).items()}
Qbe = {k: v[..., 0] for k, v in pc.ctx.g2.encode_points([Qb]).items()}
Pae = {k: v[..., 0] for k, v in pc.ctx.g1.encode_points([Pa]).items()}
Pbe = {k: v[..., 0] for k, v in pc.ctx.g1.encode_points([Pb]).items()}
jc = jax.jit(eng.pairing_check)
print('pairing eq   =', bool(jc(Qae, Pae, Qbe, Pbe)), '(want True)')
print('pairing neq  =', bool(jc(Qae, Pbe, Qbe, Pae)), '(want False)')
