import time, random
import jax, jax.numpy as jnp
from kzg_tpu.context import get_context
from kzg_tpu.ops.fuse import fuse_pointwise
from kzg_tpu.refmodel.model import G1

ctx = get_context("BN254")
F, J = ctx.fr, ctx.g1
random.seed(7)
r = ctx.cp.r
n = 2000
avals = [random.randrange(r) for _ in range(n)]
bvals = [random.randrange(r) for _ in range(n)]
A, B = F.encode(avals), F.encode(bvals)
out = fuse_pointwise(F.mul, (A, B), batch_ndim=1)
print("fused mul exact:", F.decode(out) == [a*b % r for a,b in zip(avals,bvals)])

og = G1(ctx.cp)
ks = [random.randrange(1, 2**100) for _ in range(500)]
P = ctx.g1.encode_points([og.mul(k, og.gen) for k in ks])
Q = ctx.g1.encode_points([og.mul(k, og.gen) if i % 11 else None
                          for i, k in enumerate(ks)])
R = fuse_pointwise(J.add, (P, Q), batch_ndim=1)
got = ctx.g1.decode_points(R)
expp = [og.add(og.mul(k, og.gen), (og.mul(k, og.gen) if i % 11 else None))
        for i, k in enumerate(ks)]
print("fused add exact:", got == expp)

big = 131072
Abig = jnp.tile(A, (1, big // n + 1))[:, :big]
Bbig = jnp.tile(B, (1, big // n + 1))[:, :big]
f_fused = jax.jit(lambda a, b: fuse_pointwise(F.mul, (a, b), batch_ndim=1))
f_plain = jax.jit(F.mul)
for f, name in [(f_fused, "fused"), (f_plain, "plain")]:
    o = f(Abig, Bbig); o.block_until_ready()
    t0 = time.time()
    for _ in range(20): o = f(Abig, Bbig)
    o.block_until_ready()
    print(f"{name} mul 131k lanes: {(time.time()-t0)/20*1000:.3f} ms")
Pb = {k: jnp.tile(v, (1, 300))[..., :big] for k, v in P.items()}
Qb = {k: jnp.tile(v, (1, 300))[..., :big] for k, v in Q.items()}
f_addf = jax.jit(lambda a, b: fuse_pointwise(J.add, (a, b), batch_ndim=1))
f_addp = jax.jit(J.add)
for f, name in [(f_addf, "fused"), (f_addp, "plain")]:
    o = f(Pb, Qb); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(10): o = f(Pb, Qb)
    jax.block_until_ready(o)
    print(f"{name} point-add 131k lanes: {(time.time()-t0)/10*1000:.3f} ms")
