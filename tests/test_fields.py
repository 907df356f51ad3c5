"""Field-arithmetic kernels vs the exact python oracle.

Mirrors the role of MIRACL/NTL's own test coverage in the reference (which
trusts the vendored backends; reference testing/testing.cpp only exercises the
protocol layer). Here the limb kernels are new, so they get direct coverage.
"""

import random

import jax
import numpy as np
import pytest

from kzg_tpu.curves.params import get_curve, CURVE_NAMES
from kzg_tpu.fields.mont import Field
from kzg_tpu.fields.quadratic import Fp2
from kzg_tpu.refmodel.model import Tower


@pytest.mark.parametrize("curve", CURVE_NAMES)
@pytest.mark.parametrize("which", ["fp", "fr"])
def test_base_field_ops(curve, which):
    cp = get_curve(curve)
    fp = cp.fp if which == "fp" else cp.fr
    F = Field(fp)
    m = fp.modulus
    n = 32
    av = [random.randrange(m) for _ in range(n)]
    bv = [random.randrange(m) for _ in range(n)]
    av[0] = 0
    bv[1] = 0
    av[2] = m - 1
    bv[2] = m - 1
    av[3] = 1
    a, b = F.encode(av), F.encode(bv)
    assert F.decode(a) == av
    assert F.decode(jax.jit(F.mul)(a, b)) == [x * y % m for x, y in zip(av, bv)]
    assert F.decode(jax.jit(F.add)(a, b)) == [(x + y) % m for x, y in zip(av, bv)]
    assert F.decode(jax.jit(F.sub)(a, b)) == [(x - y) % m for x, y in zip(av, bv)]
    assert F.decode(jax.jit(F.neg)(a)) == [(-x) % m for x in av]
    # lazy chain exercising redundant-form bounds
    f = jax.jit(lambda a, b: F.mul(F.sub(F.add(F.add(F.mul(a, b), a), b), b), a))
    assert F.decode(f(a, b)) == [(x * y + x) * x % m for x, y in zip(av, bv)]
    assert list(np.asarray(jax.jit(F.is_zero)(a))) == [x == 0 for x in av]


@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_field_inverse(curve):
    cp = get_curve(curve)
    F = Field(cp.fr)
    m = cp.r
    av = [random.randrange(m) for _ in range(16)]
    av[0] = 0
    a = F.encode(av)
    inv = F.decode(jax.jit(F.inv)(a))
    assert inv == [0 if x == 0 else pow(x, -1, m) for x in av]
    assert F.decode(jax.jit(F.batch_inv)(a)) == inv


@pytest.mark.parametrize("curve", CURVE_NAMES)
def test_fp2_ops(curve):
    cp = get_curve(curve)
    F = Field(cp.fp)
    F2 = Fp2(F, cp.qnr)
    tw = Tower(cp)
    n = 16
    av = [(random.randrange(cp.p), random.randrange(cp.p)) for _ in range(n)]
    bv = [(random.randrange(cp.p), random.randrange(cp.p)) for _ in range(n)]
    av[0] = (0, 0)
    a, b = F2.encode(av), F2.encode(bv)
    assert F2.decode(a) == av
    assert F2.decode(jax.jit(F2.mul)(a, b)) == [tw.e2_mul(x, y) for x, y in zip(av, bv)]
    assert F2.decode(jax.jit(F2.sub)(a, b)) == [tw.e2_sub(x, y) for x, y in zip(av, bv)]
    assert F2.decode(jax.jit(F2.inv)(a)) == [
        (0, 0) if x == (0, 0) else tw.e2_inv(x) for x in av]
