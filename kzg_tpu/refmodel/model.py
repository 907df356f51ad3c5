"""Exact pure-Python oracle for the whole KZG stack.

This module is the *correctness anchor* for the TPU kernels: every JAX/Pallas
kernel in kzg_tpu.fields / groups / ops / pairing is tested against it. It is
also used for tiny inputs where kernel launch overhead is not worth it (e.g.
parsing a handful of setup points).

It mirrors the observable semantics of the reference C++ library
(/root/reference/src/*.cpp) — same fields, same groups, same pairing equation,
same polynomial algorithms' *results* (interpolation / vanishing polynomial /
quotient are mathematically unique, reference util.cpp:172-284) — with
O(n^2) algorithms, python ints, no dependencies.
"""

from __future__ import annotations

from ..curves.params import CurveParams, get_curve


# ============================================================================
# Prime field helpers (plain ints mod m)
# ============================================================================

def finv(a: int, m: int) -> int:
    return pow(a, -1, m)


# ============================================================================
# Fp2 / Fp6 / Fp12 tower
#   Fp2  = Fp[w]/(w^2 - qnr)          elements (a, b)
#   Fp6  = Fp2[v]/(v^3 - xi)          elements (c0, c1, c2)
#   Fp12 = Fp6[s]/(s^2 - v)           elements (d0, d1)
# ============================================================================

class Tower:
    def __init__(self, cp: CurveParams):
        self.p = cp.p
        self.qnr = cp.qnr % cp.p
        self.xi = (cp.xi[0] % cp.p, cp.xi[1] % cp.p)

    # ---- Fp2 ----
    def e2_add(self, x, y):
        p = self.p
        return ((x[0] + y[0]) % p, (x[1] + y[1]) % p)

    def e2_sub(self, x, y):
        p = self.p
        return ((x[0] - y[0]) % p, (x[1] - y[1]) % p)

    def e2_neg(self, x):
        p = self.p
        return ((-x[0]) % p, (-x[1]) % p)

    def e2_mul(self, x, y):
        p, q = self.p, self.qnr
        return ((x[0] * y[0] + q * x[1] * y[1]) % p,
                (x[0] * y[1] + x[1] * y[0]) % p)

    def e2_smul(self, x, c: int):
        p = self.p
        return (x[0] * c % p, x[1] * c % p)

    def e2_sqr(self, x):
        return self.e2_mul(x, x)

    def e2_inv(self, x):
        p, q = self.p, self.qnr
        d = (x[0] * x[0] - q * x[1] * x[1]) % p
        di = finv(d, p)
        return (x[0] * di % p, (-x[1] * di) % p)

    def e2_conj(self, x):
        return (x[0], (-x[1]) % self.p)

    def e2_pow(self, x, e: int):
        r = (1, 0)
        while e:
            if e & 1:
                r = self.e2_mul(r, x)
            x = self.e2_sqr(x)
            e >>= 1
        return r

    def e2_mul_xi(self, x):
        return self.e2_mul(x, self.xi)

    # ---- Fp6 (tuples of 3 Fp2) ----
    E6_ZERO = None  # set in __init__-style accessors below

    def e6_zero(self):
        return ((0, 0), (0, 0), (0, 0))

    def e6_one(self):
        return ((1, 0), (0, 0), (0, 0))

    def e6_add(self, x, y):
        return tuple(self.e2_add(a, b) for a, b in zip(x, y))

    def e6_sub(self, x, y):
        return tuple(self.e2_sub(a, b) for a, b in zip(x, y))

    def e6_neg(self, x):
        return tuple(self.e2_neg(a) for a in x)

    def e6_mul(self, x, y):
        m, ad, xi = self.e2_mul, self.e2_add, self.e2_mul_xi
        a0, a1, a2 = x
        b0, b1, b2 = y
        t0, t1, t2 = m(a0, b0), m(a1, b1), m(a2, b2)
        c0 = ad(t0, xi(self.e2_sub(self.e2_sub(
            m(ad(a1, a2), ad(b1, b2)), t1), t2)))
        c1 = ad(self.e2_sub(self.e2_sub(m(ad(a0, a1), ad(b0, b1)), t0), t1),
                xi(t2))
        c2 = ad(self.e2_sub(self.e2_sub(m(ad(a0, a2), ad(b0, b2)), t0), t2), t1)
        return (c0, c1, c2)

    def e6_sqr(self, x):
        return self.e6_mul(x, x)

    def e6_smul2(self, x, c):
        """Multiply Fp6 by an Fp2 scalar."""
        return tuple(self.e2_mul(a, c) for a in x)

    def e6_mul_v(self, x):
        """Multiply by v: (c0,c1,c2) -> (xi*c2, c0, c1)."""
        return (self.e2_mul_xi(x[2]), x[0], x[1])

    def e6_inv(self, x):
        m, s, xi = self.e2_mul, self.e2_sqr, self.e2_mul_xi
        a0, a1, a2 = x
        c0 = self.e2_sub(s(a0), xi(m(a1, a2)))
        c1 = self.e2_sub(xi(s(a2)), m(a0, a1))
        c2 = self.e2_sub(s(a1), m(a0, a2))
        t = self.e2_add(xi(self.e2_add(m(a2, c1), m(a1, c2))), m(a0, c0))
        ti = self.e2_inv(t)
        return (m(c0, ti), m(c1, ti), m(c2, ti))

    # ---- Fp12 (tuples of 2 Fp6) ----
    def e12_one(self):
        return (self.e6_one(), self.e6_zero())

    def e12_add(self, x, y):
        return (self.e6_add(x[0], y[0]), self.e6_add(x[1], y[1]))

    def e12_mul(self, x, y):
        a0, a1 = x
        b0, b1 = y
        t0 = self.e6_mul(a0, b0)
        t1 = self.e6_mul(a1, b1)
        c0 = self.e6_add(t0, self.e6_mul_v(t1))
        c1 = self.e6_sub(self.e6_sub(
            self.e6_mul(self.e6_add(a0, a1), self.e6_add(b0, b1)), t0), t1)
        return (c0, c1)

    def e12_sqr(self, x):
        return self.e12_mul(x, x)

    def e12_inv(self, x):
        a0, a1 = x
        t = self.e6_sub(self.e6_mul(a0, a0),
                        self.e6_mul_v(self.e6_mul(a1, a1)))
        ti = self.e6_inv(t)
        return (self.e6_mul(a0, ti), self.e6_neg(self.e6_mul(a1, ti)))

    def e12_conj(self, x):
        """f^(p^6): conjugation over Fp6 (s -> -s)."""
        return (x[0], self.e6_neg(x[1]))

    def e12_pow(self, x, e: int):
        if e < 0:
            x = self.e12_inv(x)
            e = -e
        r = self.e12_one()
        while e:
            if e & 1:
                r = self.e12_mul(r, x)
            x = self.e12_sqr(x)
            e >>= 1
        return r

    def e12_frob(self, x, gammas):
        """Frobenius x -> x^p using precomputed gamma constants.

        Representation: x = sum_{i<3, j<2} c_{ij} v^i s^j; x^p applies Fp2
        conjugation to each c_ij and multiplies by gamma1[i + 3j... ] — we use
        the flat coefficient order below.
        """
        co = self.e12_coeffs(x)
        out = []
        for k, c in enumerate(co):
            c = self.e2_conj(c)
            if k > 0:
                c = self.e2_mul(c, gammas[k - 1])
            out.append(c)
        return self.e12_from_coeffs(out)

    def e12_coeffs(self, x):
        """Flatten to coefficients of s^k, k=0..5, where s^2=v, s^6=xi...

        Fp12 element a + b*s with a=(a0,a1,a2) in Fp6 (basis 1, v, v^2) and
        v = s^2: flat basis (1, s, s^2, s^3, s^4, s^5) ->
        (a0, b0, a1, b1, a2, b2).
        """
        a, b = x
        return (a[0], b[0], a[1], b[1], a[2], b[2])

    def e12_from_coeffs(self, co):
        return ((co[0], co[2], co[4]), (co[1], co[3], co[5]))


def frobenius_gammas(tw: Tower):
    """gamma1[k-1] = xi^(k*(p-1)/6) in Fp2 for k=1..5 (p = 1 mod 6 for both
    BN and BLS12 families)."""
    p = tw.p
    assert (p - 1) % 6 == 0
    g1 = tw.e2_pow(tw.xi, (p - 1) // 6)
    gs = [g1]
    for _ in range(4):
        gs.append(tw.e2_mul(gs[-1], g1))
    return gs


# ============================================================================
# Elliptic curve groups (affine, None = point at infinity)
# ============================================================================

class G1:
    def __init__(self, cp: CurveParams):
        self.p, self.b = cp.p, cp.b
        self.gen = cp.g1

    def is_on(self, P):
        if P is None:
            return True
        x, y = P
        return (y * y - x * x * x - self.b) % self.p == 0

    def neg(self, P):
        return None if P is None else (P[0], (-P[1]) % self.p)

    def add(self, P, Q):
        p = self.p
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = 3 * x1 * x1 * finv(2 * y1, p) % p
        else:
            lam = (y2 - y1) * finv((x2 - x1) % p, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    def mul(self, k: int, P):
        R = None
        k = int(k)
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R

    def eq(self, P, Q):
        return P == Q


class G2:
    def __init__(self, cp: CurveParams):
        self.tw = Tower(cp)
        self.b2 = (cp.b2[0] % cp.p, cp.b2[1] % cp.p)
        self.gen = cp.g2

    def is_on(self, P):
        if P is None:
            return True
        t = self.tw
        x, y = P
        return t.e2_sub(t.e2_sqr(y),
                        t.e2_add(t.e2_mul(t.e2_sqr(x), x), self.b2)) == (0, 0)

    def neg(self, P):
        return None if P is None else (P[0], self.tw.e2_neg(P[1]))

    def add(self, P, Q):
        t = self.tw
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if t.e2_add(y1, y2) == (0, 0):
                return None
            lam = t.e2_mul(t.e2_smul(t.e2_sqr(x1), 3),
                           t.e2_inv(t.e2_smul(y1, 2)))
        else:
            lam = t.e2_mul(t.e2_sub(y2, y1), t.e2_inv(t.e2_sub(x2, x1)))
        x3 = t.e2_sub(t.e2_sub(t.e2_sqr(lam), x1), x2)
        return (x3, t.e2_sub(t.e2_mul(lam, t.e2_sub(x1, x3)), y1))

    def mul(self, k: int, P):
        R = None
        k = int(k)
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R


# ============================================================================
# Pairing (optimal ate, computed on E(Fp12) for oracle simplicity)
# ============================================================================

class Pairing:
    """e : G2 x G1 -> Fp12 (argument order matches MIRACL PAIR_ate(P2, P1),
    reference trusted_setup.cpp:243,250)."""

    def __init__(self, cp: CurveParams):
        self.cp = cp
        self.tw = Tower(cp)
        t = self.tw
        p = cp.p
        # s^2 = v, s^6 = xi. Untwist maps E'(Fp2) -> E(Fp12):
        #   D-twist (y^2 = x^3 + b/xi):  (x, y) -> (x*s^2, y*s^3)
        #   M-twist (y^2 = x^3 + b*xi):  (x, y) -> (x/s^2, y/s^3)
        one6 = t.e6_one()
        s2 = ((0, 0), (1, 0), (0, 0))          # v  = s^2  in Fp6 (coeff of v)
        self.s2 = (s2, t.e6_zero())            # Fp12 element s^2
        s3_hi = ((0, 0), (1, 0), (0, 0))       # s^3 = v*s -> Fp6 coeff v on s
        self.s3 = (t.e6_zero(), s3_hi)
        if cp.twist == "M":
            self.s2 = self.e12_inv_cached(self.s2)
            self.s3 = self.e12_inv_cached(self.s3)
        self.gammas = frobenius_gammas(t)
        # final exponentiation: hard exponent digits base p
        d = (p ** 4 - p ** 2 + 1) // cp.r
        self.hard_digits = []
        for _ in range(4):
            self.hard_digits.append(d % p)
            d //= p
        assert d == 0

    def e12_inv_cached(self, x):
        return self.tw.e12_inv(x)

    def untwist(self, Q):
        t = self.tw
        x, y = Q
        X = t.e12_mul(((x, (0, 0), (0, 0)), t.e6_zero()), self.s2)
        Y = t.e12_mul(((y, (0, 0), (0, 0)), t.e6_zero()), self.s3)
        return (X, Y)

    # full-Fp12 affine point ops for the Miller loop
    def _add(self, P, Q, xp, yp):
        """Add points P+Q on E(Fp12); returns (P+Q, line_{P,Q}(xp, yp)).
        xp, yp are Fp elements of the G1 argument."""
        t = self.tw
        x1, y1 = P
        x2, y2 = Q
        if self._eq12(x1, x2):
            if self._is_zero(t.e12_add(y1, y2)):
                # vertical line: l = xp - x1
                l = t.e12_add(self._emb(xp), self._neg12(x1))
                return None, l
            lam = t.e12_mul(self._smul(t.e12_mul(x1, x1), 3),
                            t.e12_inv(self._smul(y1, 2)))
        else:
            lam = t.e12_mul(t.e12_add(y2, self._neg12(y1)),
                            t.e12_inv(t.e12_add(x2, self._neg12(x1))))
        x3 = t.e12_add(t.e12_mul(lam, lam),
                       self._neg12(t.e12_add(x1, x2)))
        y3 = t.e12_add(t.e12_mul(lam, t.e12_add(x1, self._neg12(x3))),
                       self._neg12(y1))
        # l(xp, yp) = yp - y1 - lam*(xp - x1)
        l = t.e12_add(
            t.e12_add(self._emb(yp), self._neg12(y1)),
            self._neg12(t.e12_mul(lam, t.e12_add(self._emb(xp),
                                                 self._neg12(x1)))))
        return (x3, y3), l

    def _emb(self, a: int):
        t = self.tw
        return ((((a % t.p, 0)), (0, 0), (0, 0)), t.e6_zero())

    def _neg12(self, x):
        t = self.tw
        return (t.e6_neg(x[0]), t.e6_neg(x[1]))

    def _smul(self, x, c: int):
        t = self.tw
        return (t.e6_smul2(x[0], (c, 0)), t.e6_smul2(x[1], (c, 0)))

    def _eq12(self, x, y):
        return x == y

    def _is_zero(self, x):
        t = self.tw
        return x == (t.e6_zero(), t.e6_zero())

    def frob_g2(self, Q, k=1):
        """pi^k on the untwisted point: raise coordinates to p^k via
        Frobenius of Fp12 (k applications)."""
        t = self.tw
        x, y = Q
        for _ in range(k):
            x = t.e12_frob(x, self.gammas)
            y = t.e12_frob(y, self.gammas)
        return (x, y)

    def miller(self, Q2, P1):
        """Miller loop; Q2 is an affine G2 point (Fp2 coords), P1 affine G1."""
        cp, t = self.cp, self.tw
        xp, yp = P1
        Q = self.untwist(Q2)
        if cp.family == "bn":
            c = 6 * cp.u + 2
        else:
            c = cp.u
        neg = c < 0
        c = abs(c)
        f = t.e12_one()
        T = Q
        for i in range(c.bit_length() - 2, -1, -1):
            T, l = self._add(T, T, xp, yp)
            f = t.e12_mul(t.e12_mul(f, f), l)
            if (c >> i) & 1:
                T, l = self._add(T, Q, xp, yp)
                f = t.e12_mul(f, l)
        if neg:
            f = t.e12_conj(f)          # f^(p^6) = f^-1 in cyclotomic subgroup
            T = (T[0], self._neg12(T[1]))
        if cp.family == "bn":
            Q1 = self.frob_g2(Q, 1)
            Q2f = self.frob_g2(Q, 2)
            nQ2 = (Q2f[0], self._neg12(Q2f[1]))
            T, l = self._add(T, Q1, xp, yp)
            f = t.e12_mul(f, l)
            T, l = self._add(T, nQ2, xp, yp)
            f = t.e12_mul(f, l)
        return f

    def final_exp(self, f):
        t, p = self.tw, self.cp.p
        # easy part: f^((p^6-1)(p^2+1))
        f = t.e12_mul(t.e12_conj(f), t.e12_inv(f))
        f = t.e12_mul(t.e12_frob(t.e12_frob(f, self.gammas), self.gammas), f)
        # hard part: f^((p^4-p^2+1)/r) via base-p digits + Frobenius
        out = t.e12_one()
        fr = f
        for i, d in enumerate(self.hard_digits):
            if d:
                out = t.e12_mul(out, t.e12_pow(fr, d))
            if i < 3:
                fr = t.e12_frob(fr, self.gammas)
        return out

    def ate(self, Q2, P1):
        """Full pairing e(Q2, P1). Either argument None -> 1."""
        if Q2 is None or P1 is None:
            return self.tw.e12_one()
        return self.final_exp(self.miller(Q2, P1))


# ============================================================================
# Polynomial oracle (coefficients as python-int lists mod r, O(n^2) algos)
# ============================================================================

class PolyOracle:
    def __init__(self, cp: CurveParams):
        self.r = cp.r

    def normalize(self, c):
        c = [x % self.r for x in c]
        while c and c[-1] == 0:
            c.pop()
        return c

    def add(self, a, b):
        n = max(len(a), len(b))
        return self.normalize(
            [(a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)
             for i in range(n)])

    def sub(self, a, b):
        n = max(len(a), len(b))
        return self.normalize(
            [(a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0)
             for i in range(n)])

    def mul(self, a, b):
        if not a or not b:
            return []
        out = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    out[i + j] = (out[i + j] + ai * bj) % self.r
        return self.normalize(out)

    def eval(self, c, x):
        acc = 0
        for ci in reversed(c):
            acc = (acc * x + ci) % self.r
        return acc

    def divmod(self, a, b):
        """Exact polynomial long division mod r."""
        r = self.r
        a = list(a)
        q = [0] * max(0, len(a) - len(b) + 1)
        binv = finv(b[-1], r)
        for i in range(len(a) - len(b), -1, -1):
            t = a[i + len(b) - 1] * binv % r
            q[i] = t
            if t:
                for j, bj in enumerate(b):
                    a[i + j] = (a[i + j] - t * bj) % r
        return self.normalize(q), self.normalize(a)

    def vanishing(self, xs):
        z = [1]
        for x in xs:
            z = self.mul(z, [(-x) % self.r, 1])
        return z

    def interpolate(self, xs, ys):
        """Lagrange, O(n^2); unique degree-<n interpolant mod r."""
        r = self.r
        n = len(xs)
        z = self.vanishing(xs)
        out = [0] * n
        for i in range(n):
            # ni = z / (x - xs[i]) via synthetic division
            ni = [0] * n
            acc = 0
            for k in range(n, 0, -1):
                acc = (z[k] + acc * xs[i]) % r if k < n else z[n] % r
                ni[k - 1] = acc
            d = self.eval(ni, xs[i])
            w = ys[i] * finv(d, r) % r
            if w:
                for k in range(n):
                    out[k] = (out[k] + w * ni[k]) % r
        return self.normalize(out)


# ============================================================================
# Full-protocol oracle
# ============================================================================

class KZGOracle:
    """End-to-end oracle implementing reference semantics with python ints."""

    def __init__(self, curve="BN254"):
        self.cp = get_curve(curve) if isinstance(curve, str) else curve
        self.g1 = G1(self.cp)
        self.g2 = G2(self.cp)
        self.pairing = Pairing(self.cp)
        self.poly = PolyOracle(self.cp)

    # --- trusted setup ---
    def setup(self, num_coeff: int, s: int):
        if num_coeff < 2:
            raise ValueError("num_coeff must be at least 2")
        r = self.cp.r
        powers = [pow(s, i, r) for i in range(num_coeff)]
        G1s = [self.g1.mul(pi, self.g1.gen) for pi in powers]
        G2s = [self.g2.mul(pi, self.g2.gen) for pi in powers]
        return G1s, G2s

    def msm_g1(self, coeffs, G1s):
        acc = None
        for c, P in zip(coeffs, G1s):
            acc = self.g1.add(acc, self.g1.mul(c, P))
        return acc

    def msm_g2(self, coeffs, G2s):
        acc = None
        for c, P in zip(coeffs, G2s):
            acc = self.g2.add(acc, self.g2.mul(c, P))
        return acc

    # --- protocol ---
    def blob_from_string(self, sdata: bytes, offset=0):
        return [(offset + i, b) for i, b in enumerate(sdata)]

    def commit(self, coeffs, G1s):
        if len(coeffs) >= len(G1s):
            raise ValueError("degree too high for setup")
        return self.msm_g1(coeffs, G1s)

    def create_proof(self, coeffs, offset, length, G1s):
        if length < 1:
            raise ValueError("chunk_length must be 1 or greater")
        xs = [(offset + i) % self.cp.r for i in range(length)]
        ys = [self.poly.eval(coeffs, x) for x in xs]
        I = self.poly.interpolate(xs, ys)
        Z = self.poly.vanishing(xs)
        q, rem = self.poly.divmod(self.poly.sub(coeffs, I), Z)
        assert not rem, "quotient must be exact"
        return self.msm_g1(q, G1s)

    def verify_proof(self, commit, proof, points, G1s, G2s):
        if len(points) < 1:
            raise ValueError("expected_data size must be 1 or greater")
        if len(points) >= len(G1s):
            return False
        xs = [x % self.cp.r for x, _ in points]
        ys = [y % self.cp.r for _, y in points]
        I = self.poly.interpolate(xs, ys)
        Z = self.poly.vanishing(xs)
        zs2 = self.msm_g2(Z, G2s)
        v1 = self.pairing.ate(zs2, proof)
        is1 = self.msm_g1(I, G1s)
        p2 = self.g1.add(self.g1.neg(is1), commit)
        v2 = self.pairing.ate(G2s[0], p2)
        return v1 == v2
