"""Direct unit tests for the hot compute engines: polynomial kernels
(NTT / Karatsuba convolution, series division, interpolation, multieval),
the Pippenger MSM (all three strategies), the Pallas pointwise fuser's
fallback parity, and the mesh-sharded entry points on the 8-device virtual
mesh (tests/conftest.py).

The reference exercises these only through protocol self-tests
(testing/testing.cpp); the engines here are new code, so they get their own
coverage against the exact python oracle (refmodel.model).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kzg_tpu.context import get_context
from kzg_tpu.curves.params import get_curve, CURVE_NAMES
from kzg_tpu.fields.mont import ints_to_limbs
from kzg_tpu.ops.fuse import fuse_pointwise
from kzg_tpu.ops.msm import MSMEngine
from kzg_tpu.ops.poly import PolyEngine
from kzg_tpu.refmodel.model import G1 as OracleG1


def _poly_engine(curve):
    ctx = get_context(curve)
    return ctx, PolyEngine(ctx.fr, ctx.cp)


def _conv_oracle(av, bv, r):
    out = [0] * (len(av) + len(bv) - 1)
    for i, x in enumerate(av):
        for j, y in enumerate(bv):
            out[i + j] = (out[i + j] + x * y) % r
    return out


# ---------------------------------------------------------------------------
# polynomial engine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_conv_vs_oracle(curve):
    """conv() dispatches to NTT (BLS12-381/BN158) or level-batched Karatsuba
    (BN254, 2-adicity 2) — both must match the exact oracle."""
    ctx, pe = _poly_engine(curve)
    r = ctx.cp.r
    na, nb = 5, 7
    av = [random.randrange(r) for _ in range(na)]
    bv = [random.randrange(r) for _ in range(nb)]
    got = pe.decode(jax.jit(pe.conv)(pe.encode(av), pe.encode(bv)))
    assert got == _conv_oracle(av, bv, r)


def test_conv_ntt_pow2():
    ctx, pe = _poly_engine("BLS12381")
    r = ctx.cp.r
    av = [random.randrange(r) for _ in range(16)]
    bv = [random.randrange(r) for _ in range(16)]
    got = pe.decode(jax.jit(pe.conv)(pe.encode(av), pe.encode(bv)))
    assert got == _conv_oracle(av, bv, r)


def test_ntt_roundtrip():
    ctx, pe = _poly_engine("BLS12381")
    r = ctx.cp.r
    av = [random.randrange(r) for _ in range(32)]
    a = pe.encode(av)
    back = pe.decode(jax.jit(
        lambda x: pe.ntt(pe.ntt(x), inverse=True))(a))
    assert back == av


@pytest.mark.parametrize("curve", ["BN254", "BLS12381"])
def test_divmod_exact(curve):
    ctx, pe = _poly_engine(curve)
    r = ctx.cp.r
    # monic divisor (matches the protocol's vanishing-poly use)
    bv = [random.randrange(r) for _ in range(4)] + [1]
    qv = [random.randrange(r) for _ in range(6)]
    rv = [random.randrange(r) for _ in range(4)]
    av = _conv_oracle(qv, bv, r)
    av = [(x + (rv[i] if i < len(rv) else 0)) % r for i, x in enumerate(av)]
    q, rem = jax.jit(pe.divmod)(pe.encode(av), pe.encode(bv))
    assert pe.decode(q) == qv
    assert pe.decode(rem) == rv
    # monic degree-1 divisor: the geometric-series fast path (the
    # single-point proof's quotient shape)
    b1 = [random.randrange(r), 1]
    a1 = _conv_oracle(qv, b1, r)
    a1 = [(x + (rv[0] if i == 0 else 0)) % r for i, x in enumerate(a1)]
    q1, rem1 = jax.jit(pe.divmod)(pe.encode(a1), pe.encode(b1))
    assert pe.decode(q1) == qv
    assert pe.decode(rem1) == [rv[0]]


@pytest.mark.parametrize("curve", ["BN254", "BLS12381"])
@pytest.mark.parametrize("n", [4, 6, 8])
def test_interpolate_multieval_roundtrip(curve, n):
    ctx, pe = _poly_engine(curve)
    r = ctx.cp.r
    off = 3
    ys = [random.randrange(r) for _ in range(n)]
    off_m = ctx.fr.encode([off])[..., 0]
    I = jax.jit(pe.interpolate)(off_m, pe.encode(ys))
    coeffs = pe.decode(I)
    # exact oracle check: evaluate the interpolant at the domain
    for i in range(n):
        x = off + i
        v = 0
        for c in reversed(coeffs):
            v = (v * x + c) % r
        assert v == ys[i]
    # multieval must invert interpolate
    got = pe.decode(jax.jit(
        lambda o, c: pe.multieval(c, o, n))(off_m, I))
    assert got == ys


def test_vanishing_poly():
    ctx, pe = _poly_engine("BN254")
    r = ctx.cp.r
    off, n = 5, 6
    off_m = ctx.fr.encode([off])[..., 0]
    Z = pe.decode(jax.jit(lambda o: pe.vanishing(o, n))(off_m))
    exp = [1]
    for i in range(n):
        root = off + i
        exp = [(c1 - root * c0) % r
               for c0, c1 in zip(exp + [0], [0] + exp)]
    assert Z == exp
    assert Z[-1] == 1                      # monic


def test_eval_points_blocked_horner():
    ctx, pe = _poly_engine("BN254")
    r = ctx.cp.r
    n = 200                                # > HORNER_BLOCK: two-level path
    cv = [random.randrange(r) for _ in range(n)]
    xs = [random.randrange(r) for _ in range(5)]
    got = pe.decode(jax.jit(pe.eval_points)(
        pe.encode(cv), ctx.fr.encode(xs)))
    exp = []
    for x in xs:
        v = 0
        for c in reversed(cv):
            v = (v * x + c) % r
        exp.append(v)
    assert got == exp


# ---------------------------------------------------------------------------
# MSM engine (all strategies)
# ---------------------------------------------------------------------------

def _msm_inputs(curve, n):
    ctx = get_context(curve)
    og = OracleG1(ctx.cp)
    pts, acc = [], og.gen
    for _ in range(n):
        pts.append(acc)
        acc = og.add(acc, og.gen)
    scalars = [random.randrange(ctx.cp.r) for _ in range(n)]
    scalars[0] = 0                          # exercise the zero-digit discard
    P = ctx.g1.encode_points(pts)
    sraw = jnp.asarray(ints_to_limbs(scalars, ctx.fr.L))
    exp = None
    for k, Pt in zip(scalars, pts):
        t = og.mul(k, Pt)
        if t is not None:
            exp = t if exp is None else og.add(exp, t)
    return ctx, sraw, P, exp


@pytest.mark.parametrize("strategy", ["merge", "log", "scan"])
def test_msm_strategies_vs_oracle(strategy):
    ctx, sraw, P, exp = _msm_inputs("BN254", 11)
    eng = MSMEngine(ctx.g1, ctx.fr, ctx.cp.r, strategy=strategy)
    out = jax.jit(eng.msm)(sraw, P)
    assert ctx.g1.decode_points(out)[0] == exp


def test_msm_shifted_vs_oracle():
    ctx, sraw, P, exp = _msm_inputs("BN254", 9)
    eng = MSMEngine(ctx.g1, ctx.fr, ctx.cp.r, strategy="scan")
    sh = jax.jit(eng.precompute_shifted)(P)
    out = jax.jit(eng.msm_shifted)(sraw, sh)
    assert ctx.g1.decode_points(out)[0] == exp


# ---------------------------------------------------------------------------
# Pallas fuser (CPU fallback parity; the kernel path runs on TPU only)
# ---------------------------------------------------------------------------

def test_fuse_pointwise_mul_parity():
    ctx = get_context("BN254")
    F = ctx.fr
    r = ctx.cp.r
    n = 300
    av = [random.randrange(r) for _ in range(n)]
    bv = [random.randrange(r) for _ in range(n)]
    A, B = F.encode(av), F.encode(bv)
    out = fuse_pointwise(F.mul, (A, B), batch_ndim=1)
    assert F.decode(out) == [a * b % r for a, b in zip(av, bv)]


def test_fuse_pointwise_point_add_parity():
    ctx = get_context("BN254")
    og = OracleG1(ctx.cp)
    ks = [random.randrange(1, 2 ** 64) for _ in range(40)]
    Ppts = [og.mul(k, og.gen) for k in ks]
    Qpts = [og.mul(k, og.gen) if i % 7 else None
            for i, k in enumerate(ks)]
    P = ctx.g1.encode_points(Ppts)
    Q = ctx.g1.encode_points(Qpts)
    R = fuse_pointwise(ctx.g1.add, (P, Q), batch_ndim=1)
    assert ctx.g1.decode_points(R) == [og.add(p, q)
                                       for p, q in zip(Ppts, Qpts)]


# ---------------------------------------------------------------------------
# mesh-sharded entry points (8-device virtual mesh from conftest)
# ---------------------------------------------------------------------------

def test_sharded_msm_on_mesh():
    from kzg_tpu.parallel.sharded import make_mesh, sharded_msm
    n_dev = min(8, len(jax.devices()))
    ctx, sraw, P, exp = _msm_inputs("BN254", 2 * n_dev)
    eng = MSMEngine(ctx.g1, ctx.fr, ctx.cp.r, strategy="scan")
    mesh = make_mesh(n_dev)
    out = jax.jit(sharded_msm(eng, mesh))(sraw, P)
    assert ctx.g1.decode_points(out)[0] == exp


def test_distributed_ntt_matches_local():
    """Four-step mesh NTT (all_to_all re-stripe + local butterflies +
    all_gather outer stage) == single-device NTT, both directions."""
    from kzg_tpu.parallel.sharded import make_mesh
    from kzg_tpu.parallel.ntt import DistributedNTT
    n_dev = min(8, len(jax.devices()))
    ctx, pe = _poly_engine("BLS12381")
    r = ctx.cp.r
    n = max(64, n_dev * n_dev)
    av = [random.randrange(r) for _ in range(n)]
    a = pe.encode(av)
    dntt = DistributedNTT(pe, make_mesh(n_dev))
    fwd = jax.jit(lambda x: dntt(x))(a)
    ref = jax.jit(pe.ntt)(a)
    assert pe.decode(fwd) == pe.decode(ref)
    back = jax.jit(lambda x: dntt(x, inverse=True))(fwd)
    assert pe.decode(back) == av


def test_sharded_setup_powers_on_mesh():
    from kzg_tpu.parallel.sharded import make_mesh, sharded_setup_powers
    import kzg_tpu as kzg
    n_dev = min(8, len(jax.devices()))
    pc = kzg.init("BN254")
    s, num = 12345, 2 * n_dev
    r = pc.cp.r
    powers = [pow(s, i, r) for i in range(num)]
    nb = r.bit_length()
    nbytes = (nb + 7) // 8
    buf = b"".join(v.to_bytes(nbytes, "little") for v in powers)
    byte_mat = np.frombuffer(buf, np.uint8).reshape(num, nbytes)
    bits = jnp.asarray((((byte_mat[:, :, None] >> np.arange(8)) & 1)
                        .astype(np.bool_).reshape(num, -1)[:, :nb].T)
                       )
    t1, _ = pc.gen_tables()
    mesh = make_mesh(n_dev)
    out = jax.jit(sharded_setup_powers(pc.ctx.g1, mesh))(bits, t1)
    got = pc.ctx.g1.decode_points(out)
    og = OracleG1(pc.cp)
    assert got == [og.mul(v, og.gen) for v in powers]
