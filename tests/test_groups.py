"""Jacobian group ops (G1 over Fp, G2 over Fp2) vs the exact oracle,
including the complete-addition edge cases (equal points, negatives,
infinity) that the MSM segmented scans rely on."""

import random

import jax
import pytest

from kzg_tpu.curves.params import get_curve, CURVE_NAMES
from kzg_tpu.fields.mont import Field
from kzg_tpu.fields.quadratic import Fp2
from kzg_tpu.context import make_g1, make_g2
from kzg_tpu.refmodel.model import G1, G2


@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_g1_group_law(curve):
    cp = get_curve(curve)
    F = Field(cp.fp)
    og = G1(cp)
    J = make_g1(cp)
    pts = [og.mul(random.randrange(1, cp.r), og.gen) for _ in range(8)]
    pts += [None, og.gen]
    qts = [og.mul(random.randrange(1, cp.r), og.gen) for _ in range(8)]
    qts += [og.gen, None]
    qts[0] = pts[0]                                  # equal -> doubling path
    qts[1] = (pts[1][0], (-pts[1][1]) % cp.p)        # negation -> infinity
    P, Q = J.encode_points(pts), J.encode_points(qts)
    assert J.decode_points(P) == pts                 # affine roundtrip
    got = J.decode_points(jax.jit(J.add)(P, Q))
    assert got == [og.add(a, b) for a, b in zip(pts, qts)]
    got = J.decode_points(jax.jit(J.dbl)(P))
    assert got == [og.add(a, a) for a in pts]


@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_g1_add_chain(curve):
    cp = get_curve(curve)
    F = Field(cp.fp)
    og = G1(cp)
    J = make_g1(cp)
    pts = [og.mul(random.randrange(1, cp.r), og.gen) for _ in range(4)] + [None]
    P = J.encode_points(pts)
    f9 = jax.jit(lambda P: J.add(J.dbl(J.dbl(J.dbl(P))), P))
    assert J.decode_points(f9(P)) == [og.mul(9, a) for a in pts]


@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_g2_group_law(curve):
    cp = get_curve(curve)
    F2 = Fp2(Field(cp.fp), cp.qnr)
    og = G2(cp)
    J = make_g2(cp)
    pts = [og.mul(random.randrange(1, cp.r), og.gen) for _ in range(4)]
    pts += [None, og.gen]
    qts = [og.mul(random.randrange(1, cp.r), og.gen) for _ in range(4)]
    qts += [og.gen, None]
    qts[0] = pts[0]
    P, Q = J.encode_points(pts), J.encode_points(qts)
    assert J.decode_points(P) == pts
    got = J.decode_points(jax.jit(J.add)(P, Q))
    assert got == [og.add(a, b) for a, b in zip(pts, qts)]
    f9 = jax.jit(lambda P: J.add(J.dbl(J.dbl(J.dbl(P))), P))
    assert J.decode_points(f9(P)) == [og.mul(9, a) for a in pts]
