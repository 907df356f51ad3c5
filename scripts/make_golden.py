"""Generate golden KZG vectors from the exact python oracle ONLY.

Writes, per curve, a reference-format trusted-setup file plus a JSON of
expected serialized commit/proof bytes for a fixed secret and fixed input —
nothing here touches the JAX engines, so tests/test_golden.py proves the
TPU pipeline reproduces the protocol byte-for-byte from a setup *file*
(the reference's interop surface: trusted_setup.cpp:256-287 file format,
testing/testing.cpp:313-363 commit/proof semantics).

Protocol math (pure python ints, mirrors the reference's NTL path):
  * interpolate blob points -> P(x) (Lagrange over consecutive x),
  * commit = sum_i P_i * (s^i G1),
  * proof(a, l): I = interpolant of P over [a, a+l), Z = vanishing poly,
    q = (P - I) / Z, proof = sum_i q_i * (s^i G1).

Usage: python scripts/make_golden.py  (writes tests/fixtures/golden/)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kzg_tpu.curves.params import get_curve
from kzg_tpu.refmodel.model import G1 as OracleG1, G2 as OracleG2
from kzg_tpu.protocol import serial

SECRET = 0xBEEF_CAFE_0123
NUM_COEFF = 48          # must exceed len(MESSAGE): commit needs a base per
                        # coefficient (round-2 fixture had 24 and zip-
                        # truncated the MSM silently — wrong golden bytes)
MESSAGE = b"KZG golden vector: the quick brown fox"
PROOFS = [(0, 5), (3, 4), (0, len(MESSAGE))]     # (chunk_offset, chunk_length)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "tests", "fixtures", "golden")


def poly_interp(points, r):
    """Lagrange interpolation over arbitrary x (python ints), coeff list."""
    n = len(points)
    coeffs = [0] * n
    for i, (xi, yi) in enumerate(points):
        # numerator poly prod_{j!=i} (x - x_j), denominator scalar
        num = [1]
        den = 1
        for j, (xj, _) in enumerate(points):
            if j == i:
                continue
            num = [(c1 - xj * c0) % r
                   for c0, c1 in zip(num + [0], [0] + num)]
            den = den * (xi - xj) % r
        scale = yi * pow(den, -1, r) % r
        for k in range(len(num)):
            coeffs[k] = (coeffs[k] + num[k] * scale) % r
    while coeffs and coeffs[-1] == 0:
        coeffs.pop()
    return coeffs


def poly_divmod(a, b, r):
    a = list(a)
    q = [0] * max(1, len(a) - len(b) + 1)
    inv_lead = pow(b[-1], -1, r)
    for k in range(len(a) - len(b), -1, -1):
        c = a[k + len(b) - 1] * inv_lead % r
        q[k] = c
        for j, bj in enumerate(b):
            a[k + j] = (a[k + j] - c * bj) % r
    return q, a[: len(b) - 1]


def msm(coeffs, bases, og):
    assert len(coeffs) <= len(bases), "setup too small for this polynomial"
    acc = None
    for c, B in zip(coeffs, bases):
        t = og.mul(c, B)
        if t is not None:
            acc = t if acc is None else og.add(acc, t)
    return acc


def main():
    os.makedirs(OUT, exist_ok=True)
    for curve in ("BN254", "BLS12381"):
        cp = get_curve(curve)
        r = cp.r
        og1, og2 = OracleG1(cp), OracleG2(cp)
        s = SECRET % r
        g1_pts, g2_pts = [], []
        acc = 1
        for _ in range(NUM_COEFF):
            g1_pts.append(og1.mul(acc, og1.gen))
            g2_pts.append(og2.mul(acc, og2.gen))
            acc = acc * s % r
        setup_path = os.path.join(OUT, f"kzg_public_{curve}")
        serial.write_setup_file(setup_path, g1_pts, g2_pts, cp)

        # blob: from_string semantics — x = index, y = byte value
        points = [(i, c) for i, c in enumerate(MESSAGE)]
        P = poly_interp(points, r)
        commit_bytes = serial.serialize_g1(msm(P, g1_pts, og1), cp)

        proofs = []
        for off, ln in PROOFS:
            sub = points[off: off + ln]
            I = poly_interp(sub, r)
            Z = [1]
            for x, _ in sub:
                Z = [(c1 - x * c0) % r
                     for c0, c1 in zip(Z + [0], [0] + Z)]
            diff = [(pc - (I[i] if i < len(I) else 0)) % r
                    for i, pc in enumerate(P)]
            q, rem = poly_divmod(diff, Z, r)
            assert all(v == 0 for v in rem), "quotient not exact"
            proofs.append({
                "chunk_offset": off, "chunk_length": ln,
                "proof_hex": serial.serialize_g1(
                    msm(q, g1_pts, og1), cp).hex(),
            })

        vec = {
            "curve": curve,
            "secret": hex(SECRET),
            "num_coeff": NUM_COEFF,
            "message": MESSAGE.decode("latin-1"),
            "setup_file": os.path.basename(setup_path),
            "commit_hex": commit_bytes.hex(),
            "poly_hex": serial.serialize_poly(P).hex(),
            "proofs": proofs,
        }
        with open(os.path.join(OUT, f"golden_{curve}.json"), "w") as f:
            json.dump(vec, f, indent=1)
        print(f"{curve}: wrote {setup_path} + golden_{curve}.json")


if __name__ == "__main__":
    main()
