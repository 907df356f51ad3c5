"""One-time derivation of pairing-curve parameters for kzg_tpu.

Derives and verifies every constant needed by the library for the three curve
configs the reference supports (BN158 / BN254 / BLS12-381; reference:
/root/reference/config/curve_*/kzg_config.h selects MIRACL instantiations).
The reference obtains these constants from vendored MIRACL ROM files, which are
not present in this checkout (empty git submodule), so we derive them from the
published curve-family formulas instead:

  * BN family (Barreto-Naehrig):  p = 36u^4 + 36u^3 + 24u^2 + 6u + 1
                                  r = 36u^4 + 36u^3 + 18u^2 + 6u + 1
                                  t = 6u^2 + 1
  * BLS12 family:                 p = (u-1)^2 (u^4 - u^2 + 1)/3 + u
                                  r = u^4 - u^2 + 1
                                  t = u + 1

Curve choices:
  * BN254  : u = -(2^62 + 2^55 + 1)  (the well-known Nogami BN254 curve,
             the same family member MIRACL's BN254 config uses), b = 2.
  * BLS12381: the standard BLS12-381 curve (zkcrypto/IETF constants),
             u = -0xd201000000010000, b = 4.
  * BN158  : MIRACL's exact BN158 `u` is not recoverable from this checkout,
             so we fix a deterministic family member: the smallest u = k*2^15
             (even, for NTT-friendly 2-adicity of r-1) giving a 158-bit prime
             p and prime r. The wire formats (20-byte field elements,
             octet/point layout) match the reference exactly.

Every derived constant is verified (primality, curve membership, subgroup
order, non-residue properties) before being frozen into params_data.py.

Run:  python -m kzg_tpu.curves.generate
"""

from __future__ import annotations

import math
import sys
import time

from sympy import isprime


# ----------------------------------------------------------------------------
# Minimal exact field helpers (python ints)
# ----------------------------------------------------------------------------

def inv_mod(a: int, m: int) -> int:
    return pow(a, -1, m)


def sqrt_mod_prime(a: int, p: int):
    """Tonelli-Shanks; returns a square root of a mod p or None."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli-Shanks
    s, q = 0, p - 1
    while q % 2 == 0:
        s += 1
        q //= 2
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


class Fp2:
    """Fp2 = Fp[w] / (w^2 - qnr), elements (a, b) = a + b*w, python ints."""

    def __init__(self, p: int, qnr: int):
        self.p = p
        self.qnr = qnr % p

    def add(self, x, y):
        p = self.p
        return ((x[0] + y[0]) % p, (x[1] + y[1]) % p)

    def sub(self, x, y):
        p = self.p
        return ((x[0] - y[0]) % p, (x[1] - y[1]) % p)

    def mul(self, x, y):
        p, q = self.p, self.qnr
        a = (x[0] * y[0] + q * x[1] * y[1]) % p
        b = (x[0] * y[1] + x[1] * y[0]) % p
        return (a, b)

    def sqr(self, x):
        return self.mul(x, x)

    def inv(self, x):
        p, q = self.p, self.qnr
        d = (x[0] * x[0] - q * x[1] * x[1]) % p
        di = inv_mod(d, p)
        return (x[0] * di % p, (-x[1] * di) % p)

    def pow(self, x, e: int):
        r = (1, 0)
        b = x
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.sqr(b)
            e >>= 1
        return r

    def is_square(self, x):
        # x is a square in Fp2 iff x^((p^2-1)/2) == 1
        if x == (0, 0):
            return True
        return self.pow(x, (self.p * self.p - 1) // 2) == (1, 0)

    def is_cube(self, x):
        p2 = self.p * self.p
        if (p2 - 1) % 3 != 0:
            return True
        if x == (0, 0):
            return True
        return self.pow(x, (p2 - 1) // 3) == (1, 0)

    def sqrt(self, x):
        """Square root in Fp2 (generic slow path via complex method)."""
        p = self.p
        if x == (0, 0):
            return (0, 0)
        if not self.is_square(x):
            return None
        if x[1] == 0 and self.qnr == p - 1:
            # x = a + 0*w with w^2 = -1
            s = sqrt_mod_prime(x[0], p)
            if s is not None:
                return (s, 0)
            s = sqrt_mod_prime((-x[0]) % p, p)
            return (0, s)
        # generic: find y with y^2 = x by exponent tricks (p^2 = 1 mod 4 always
        # for p odd), use Tonelli-Shanks in Fp2.
        p2 = self.p * self.p
        s, q = 0, p2 - 1
        while q % 2 == 0:
            s += 1
            q //= 2
        # find a non-square z in Fp2 deterministically
        z = None
        for b in range(0, 20):
            for a in range(0, 20):
                cand = (a, b)
                if cand == (0, 0):
                    continue
                if not self.is_square(cand):
                    z = cand
                    break
            if z:
                break
        m, c, t, r = s, self.pow(z, q), self.pow(x, q), self.pow(x, (q + 1) // 2)
        while t != (1, 0):
            i, t2 = 0, t
            while t2 != (1, 0):
                t2 = self.sqr(t2)
                i += 1
            b = self.pow(c, 1 << (m - i - 1))
            m, c = i, self.sqr(b)
            t, r = self.mul(t, c), self.mul(r, b)
        return r


# ----------------------------------------------------------------------------
# Short-Weierstrass point ops (affine, python ints) over Fp and Fp2
# ----------------------------------------------------------------------------

class CurveFp:
    def __init__(self, p, b):
        self.p, self.b = p, b

    def is_on(self, P):
        if P is None:
            return True
        x, y = P
        return (y * y - (x * x * x + self.b)) % self.p == 0

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
            lam = (3 * x1 * x1) * inv_mod(2 * y1, p) % p
        else:
            lam = (y2 - y1) * inv_mod((x2 - x1) % p, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def mul(self, k, P):
        R = None
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R


class CurveFp2:
    def __init__(self, fp2: Fp2, b2):
        self.f, self.b2 = fp2, b2

    def is_on(self, P):
        if P is None:
            return True
        f = self.f
        x, y = P
        lhs = f.sqr(y)
        rhs = f.add(f.mul(f.sqr(x), x), self.b2)
        return lhs == rhs

    def add(self, P, Q):
        f = self.f
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if f.add(y1, y2) == (0, 0):
                return None
            lam = f.mul(f.mul((3, 0), f.sqr(x1)), f.inv(f.mul((2, 0), y1)))
        else:
            lam = f.mul(f.sub(y2, y1), f.inv(f.sub(x2, x1)))
        x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, k, P):
        R = None
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R


# ----------------------------------------------------------------------------
# Family formulas
# ----------------------------------------------------------------------------

def bn_params(u):
    p = 36 * u**4 + 36 * u**3 + 24 * u**2 + 6 * u + 1
    r = 36 * u**4 + 36 * u**3 + 18 * u**2 + 6 * u + 1
    t = 6 * u**2 + 1
    return p, r, t


def bls12_params(u):
    r = u**4 - u**2 + 1
    p = (u - 1) ** 2 * r // 3 + u
    t = u + 1
    return p, r, t


def two_adicity(n):
    s = 0
    while n % 2 == 0:
        s += 1
        n //= 2
    return s


def find_qnr(p):
    """Smallest quadratic non-residue mod p (for the Fp2 tower w^2 = qnr).
    Prefers -1 when p = 3 mod 4 (matching the usual i^2 = -1 tower)."""
    if p % 4 == 3:
        return p - 1
    q = 2
    while pow(q, (p - 1) // 2, p) == 1:
        q += 1
    return q


def find_fr_generator(r):
    """Smallest multiplicative generator-ish element: smallest g whose order
    is divisible by 2^s (full 2-Sylow), used to build NTT roots."""
    s = two_adicity(r - 1)
    odd = (r - 1) >> s
    g = 2
    while True:
        w = pow(g, odd, r)   # order dividing 2^s
        if pow(w, 1 << (s - 1), r) != 1:  # order exactly 2^s
            return g, w, s
        g += 1


def find_xi(f: Fp2):
    """Deterministic small sextic non-residue xi in Fp2 (neither square nor
    cube), scanning xi = (a, b) in a small lexicographic box."""
    for b in range(0, 8):
        for a in range(0, 8):
            if (a, b) == (0, 0):
                continue
            xi = (a, b)
            if not f.is_square(xi) and not f.is_cube(xi):
                return xi
    raise RuntimeError("no small sextic non-residue found")


def twist_order_candidates(p, t):
    """Candidate orders of the two sextic twists of E/Fp2 (CM disc -3)."""
    t2 = t * t - 2 * p          # trace of E over Fp2
    p2 = p * p
    d = 4 * p2 - t2 * t2
    assert d % 3 == 0
    f2 = d // 3
    f = math.isqrt(f2)
    assert f * f == f2, "CM discriminant -3 structure expected"
    cands = []
    for tw in ((t2 + 3 * f) // 2, (t2 - 3 * f) // 2, t2, -t2,
               -(t2 + 3 * f) // 2, -(t2 - 3 * f) // 2):
        cands.append(p2 + 1 - tw)
    return cands


def first_point_fp(curve: CurveFp, p):
    """Deterministic G1 base point: prefer (p-1, 1) (the classic BN b=2
    generator (-1, 1)); else smallest x >= 1 with minimal sqrt y."""
    if curve.is_on((p - 1, 1)):
        return (p - 1, 1)
    x = 1
    while True:
        rhs = (x * x * x + curve.b) % p
        y = sqrt_mod_prime(rhs, p)
        if y is not None and y != 0:
            y = min(y, p - y)
            return (x, y)
        x += 1


def first_point_fp2(curve: CurveFp2):
    f = curve.f
    for b in range(0, 8):
        for a in range(0, 8):
            x = (a, b)
            rhs = f.add(f.mul(f.sqr(x), x), curve.b2)
            y = f.sqrt(rhs)
            if y is not None and y != (0, 0):
                # canonicalize: smaller of (y, -y) lexicographically by (b, a)
                ny = ((-y[0]) % f.p, (-y[1]) % f.p)
                y = min(y, ny, key=lambda t: (t[1], t[0]))
                return (x, y)
    raise RuntimeError("no small G2 seed point found")


# ----------------------------------------------------------------------------
# Per-curve derivation
# ----------------------------------------------------------------------------

def derive_curve(name, family, u, b, modbytes, g1_hint=None, g2_hint=None,
                 xi_hint=None, twist_hint=None):
    if family == "bn":
        p, r, t = bn_params(u)
    else:
        p, r, t = bls12_params(u)
    assert isprime(p), f"{name}: p not prime"
    assert isprime(r), f"{name}: r not prime"
    n = p + 1 - t
    h1 = n // r
    assert h1 * r == n, f"{name}: r does not divide curve order"

    curve = CurveFp(p, b)
    if g1_hint is not None:
        g1 = g1_hint
        assert curve.is_on(g1), f"{name}: provided G1 gen not on curve"
    else:
        g1 = first_point_fp(curve, p)
    if h1 != 1:
        g1 = curve.mul(h1, g1)
    assert g1 is not None and curve.mul(r, g1) is None, f"{name}: G1 gen order"

    qnr = find_qnr(p)
    f2 = Fp2(p, qnr)
    xi = xi_hint if xi_hint is not None else find_xi(f2)
    assert not f2.is_square(xi) and not f2.is_cube(xi), f"{name}: xi not sextic NR"

    # twist type: D-twist  E': y^2 = x^3 + b/xi,  M-twist  E': y^2 = x^3 + b*xi
    cands = twist_order_candidates(p, t)
    chosen = None
    for ttype in (("D",) if twist_hint == "D" else
                  ("M",) if twist_hint == "M" else ("D", "M")):
        b2 = f2.mul((b, 0), f2.inv(xi)) if ttype == "D" else f2.mul((b, 0), xi)
        tw = CurveFp2(f2, b2)
        seed = g2_hint if (g2_hint is not None and twist_hint == ttype) else first_point_fp2(tw)
        assert tw.is_on(seed)
        for m in cands:
            if m % r == 0 and tw.mul(m, seed) is None:
                h2 = m // r
                g2 = tw.mul(h2, seed) if g2_hint is None else seed
                if g2 is None:
                    continue
                if tw.mul(r, g2) is not None:
                    continue
                chosen = (ttype, b2, g2, h2, m)
                break
        if chosen:
            break
    assert chosen, f"{name}: no valid sextic twist found"
    ttype, b2, g2, h2, m2 = chosen

    g, w, s = find_fr_generator(r)

    return dict(
        name=name, family=family, u=u, p=p, r=r, t=t, b=b, h1=h1,
        modbytes=modbytes,
        g1=g1, qnr=qnr, xi=xi, twist=ttype, b2=b2, g2=g2, h2=h2,
        fr_two_adicity=s, fr_sylow_gen=w,
    )


def search_bn158_u():
    """Smallest u = k*2^15 with 158-bit prime p and prime r (see module doc)."""
    k = 1
    # p ~ 36 u^4 -> u ~ 2^38.2 for 158-bit p; start k near 2^23.2
    k = (1 << 23)
    while True:
        u = k << 15
        p, r, t = bn_params(u)
        if p.bit_length() == 158 and isprime(p) and isprime(r):
            return u
        k += 1


def fmt(v, indent=0):
    if isinstance(v, tuple):
        return "(" + ", ".join(fmt(x) for x in v) + ")"
    if isinstance(v, int) and abs(v) > 10**6:
        return hex(v)
    return repr(v)


def main():
    curves = []
    t0 = time.time()

    # --- BN254 (Nogami; the family member MIRACL's BN254 config selects) ----
    u_bn254 = -(2**62 + 2**55 + 1)
    curves.append(derive_curve(
        "BN254", "bn", u_bn254, b=2, modbytes=32, g1_hint=None,
    ))
    print(f"[{time.time()-t0:.1f}s] BN254 done", file=sys.stderr)

    # --- BLS12-381 (standard constants, verified below) ---------------------
    u_bls = -0xd201000000010000
    p_bls, r_bls, _ = bls12_params(u_bls)
    g1_bls = (
        0x17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb,
        0x08b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3edd03cc744a2888ae40caa232946c5e7e1,
    )
    g2_bls = (
        (0x024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8,
         0x13e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e),
        (0x0ce5d527727d6e118cc9cdc6da2e351aadfd9baa8cbdd3a76d429a695160d12c923ac9cc3baca289e193548608b82801,
         0x0606c4a02ea734cc32acd2b02bc28b99cb3e287e85a763af267492ab572e99ab3f370d275cec1da1aaa9075ff05f79be),
    )
    try:
        c = derive_curve("BLS12381", "bls12", u_bls, b=4, modbytes=48,
                         g1_hint=g1_bls, g2_hint=g2_bls, xi_hint=(1, 1),
                         twist_hint="M")
    except AssertionError as e:
        print(f"standard BLS12-381 constants failed verification ({e}); "
              "falling back to deterministic derivation", file=sys.stderr)
        c = derive_curve("BLS12381", "bls12", u_bls, b=4, modbytes=48)
    curves.append(c)
    print(f"[{time.time()-t0:.1f}s] BLS12381 done", file=sys.stderr)

    # --- BN158 (deterministic family member, see module docstring) ----------
    u_bn158 = search_bn158_u()
    print(f"[{time.time()-t0:.1f}s] BN158 u found: {hex(u_bn158)}", file=sys.stderr)
    curves.append(derive_curve("BN158", "bn", u_bn158, b=None, modbytes=20)
                  if False else None)
    # b for BN158: find smallest b giving a curve of prime order r
    p, r, t = bn_params(u_bn158)
    b = 1
    while True:
        cv = CurveFp(p, b)
        # probe: find any point and check order r
        P = None
        x = 0
        while P is None:
            rhs = (x * x * x + b) % p
            y = sqrt_mod_prime(rhs, p)
            if y is not None and y != 0:
                P = (x, min(y, p - y))
            x += 1
        if cv.mul(r, P) is None:
            break
        b += 1
    curves[-1] = derive_curve("BN158", "bn", u_bn158, b=b, modbytes=20)

    out = ["# AUTO-GENERATED by kzg_tpu.curves.generate — do not edit by hand.",
           "# Derivation + verification: kzg_tpu/curves/generate.py",
           "", "CURVES = {"]
    for c in curves:
        out.append(f"    {c['name']!r}: {{")
        for k, v in c.items():
            out.append(f"        {k!r}: {fmt(v)},")
        out.append("    },")
    out.append("}")
    path = __file__.replace("generate.py", "params_data.py")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    for c in curves:
        print(f"{c['name']}: p={c['p'].bit_length()}b r={c['r'].bit_length()}b "
              f"b={c['b']} twist={c['twist']} xi={c['xi']} qnr={hex(c['qnr'])[:12]} "
              f"v2(r-1)={c['fr_two_adicity']} h2={hex(c['h2'])[:16]}...")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
