"""Three-curve benchmark harness reproducing the reference's tables.

Mirrors benchmark/benchmark.cpp + benchmark_curves.sh:
  * trusted setup generation, 128 -> 4096 terms;
  * single proofs (commit / proof / verify) on a 5000-term setup,
    degree 128 -> 4096;
  * multi proofs on a degree-4096 polynomial, 128 -> 4096 reveal points;
each row smoke-verified (the check-mark column) exactly like the reference.

Usage:
  python benchmark/run_benchmarks.py [--curves BN158,BN254,BLS12381]
                                     [--max-degree 4096] [--setup 5000]
                                     [--benchmark-common]

`--benchmark-common` mirrors the reference's hidden mode
(benchmark.cpp:123-136): a 10,429,000-term setup with a degree sweep —
far beyond round-1 memory budgets here; it runs the sweep capped to the
available setup unless KZG_ALLOW_HUGE=1.
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kzg_tpu as kzg

BASE = {  # reference README numbers for the vs-baseline column (ms)
    ("BN254", "commit", 4096): 1104.637,
    ("BN254", "proof", 4096): 1080.747,
    ("BN158", "commit", 4096): 378.268,
    ("BLS12381", "commit", 4096): 1153.631,
}


def _rand_string(n, seed=0):
    random.seed(seed)
    return "".join(chr(random.randrange(32, 127)) for _ in range(n))


def bench_setup(curve, max_terms, rows=None):
    print(f"=== [{curve}] Trusted setup ===")
    terms = 128
    while terms <= max_terms:
        kzg.trusted_setup(terms)          # compile warmup (cached per size)
        t0 = time.time()
        kzg.trusted_setup(terms)
        ms = 1e3 * (time.time() - t0)
        print(f"Terms: {terms:5d} | Setup: {ms:9.3f}ms", flush=True)
        if rows is not None:
            rows.append({"op": "setup", "terms": terms, "ms": round(ms, 3)})
        terms *= 2


def _timed(f, n_iter=1):
    out = f()                     # warmup / compile
    t0 = time.time()
    for _ in range(n_iter):
        out = f()
    return out, 1e3 * (time.time() - t0) / n_iter


def bench_single(curve, ts, max_degree, rows=None):
    print(f"=== [{curve}] Single proofs (setup 5000) ===")
    degree = 128
    while degree <= max_degree:
        data = _rand_string(degree + 1, seed=degree)
        p = kzg.poly.from_blob(kzg.blob.from_string(data))
        c, commit_ms = _timed(lambda: ts.create_commit(p))
        pr, proof_ms = _timed(lambda: ts.create_proof(p, 0, 1))
        target = kzg.blob.from_string(data[0], 0)
        ok, verify_ms = _timed(lambda: ts.verify_proof(c, pr, target))
        mark = "ok" if ok else "FAIL"
        print(f"Degree: {degree:8d} | Commit: {commit_ms:10.3f}ms | "
              f"Proof: {proof_ms:10.3f}ms | Verify: {verify_ms:10.3f}ms | "
              f"{mark}", flush=True)
        if rows is not None:
            rows.append({"op": "single", "degree": degree,
                         "commit_ms": round(commit_ms, 3),
                         "proof_ms": round(proof_ms, 3),
                         "verify_ms": round(verify_ms, 3), "ok": bool(ok)})
        degree *= 2


def bench_multi(curve, ts, max_points, rows=None):
    print(f"=== [{curve}] Multi proofs (degree 4096) ===")
    data = _rand_string(4096, seed=7)
    p = kzg.poly.from_blob(kzg.blob.from_string(data))
    c = ts.create_commit(p)
    points = 128
    while points <= max_points:
        pr, proof_ms = _timed(lambda: ts.create_proof(p, 0, points))
        target = kzg.blob.from_string(data[:points], 0)
        ok, verify_ms = _timed(lambda: ts.verify_proof(c, pr, target))
        mark = "ok" if ok else "FAIL"
        print(f"Degree: 4096 | Proofs: {points:7d} | "
              f"Proof: {proof_ms:8.3f}ms | Verify: {verify_ms:8.3f}ms | "
              f"{mark}", flush=True)
        if rows is not None:
            rows.append({"op": "multi", "points": points,
                         "proof_ms": round(proof_ms, 3),
                         "verify_ms": round(verify_ms, 3), "ok": bool(ok)})
        points *= 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curves", default="BN254")
    ap.add_argument("--max-degree", type=int, default=4096)
    ap.add_argument("--setup", type=int, default=5000)
    ap.add_argument("--skip-setup-sweep", action="store_true")
    ap.add_argument("--benchmark-common", action="store_true")
    ap.add_argument("--json-out", default=None,
                    help="write rows to this JSON file (per-curve dict)")
    args = ap.parse_args()

    allrows = {}
    for curve in args.curves.split(","):
        kzg.init(curve)
        rows = allrows.setdefault(curve, [])
        if not args.skip_setup_sweep:
            bench_setup(curve, args.max_degree, rows)
        t0 = time.time()
        ts = kzg.trusted_setup.from_secret(0xD15EA5E, args.setup)
        print(f"(setup {args.setup} terms: {time.time() - t0:.1f}s)",
              flush=True)
        bench_single(curve, ts, args.max_degree, rows)
        bench_multi(curve, ts, min(args.max_degree, args.setup - 1), rows)
        if args.json_out:
            os.makedirs(os.path.dirname(args.json_out) or ".",
                        exist_ok=True)
            with open(args.json_out, "w") as f:
                json.dump(allrows, f, indent=1)
        if args.benchmark_common:

            terms = 10_429_000 if os.environ.get("KZG_ALLOW_HUGE") else \
                args.setup
            print(f"=== [{curve}] Benchmark common (setup {terms}) ===")
            ts2 = kzg.trusted_setup.from_secret(0xD15EA5E, terms)
            d = 1024
            while d < terms:
                data = _rand_string(min(d + 1, terms - 1), seed=d)
                p = kzg.poly.from_blob(kzg.blob.from_string(data))
                _, ms = _timed(lambda: ts2.create_commit(p))
                print(f"Degree: {d:9d} | Commit: {ms:10.3f}ms")
                d *= 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
