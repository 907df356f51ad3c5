"""Headline benchmark: BN254 degree-4096 commit + single proof latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline: the reference's published BN254 degree-4096 numbers
(README.md:132; BASELINE.md): commit 1104.637 ms + proof 1080.747 ms
= 2185.384 ms on a desktop CPU (naive per-coefficient scalar-mul MSM,
src/trusted_setup.cpp:149-174). vs_baseline > 1 means faster than the
reference.

The headline value is the WARM median (steady-state serving latency, the
number comparable to the reference's timing loop). The stderr tail also
prints the cold (first-call-after-compile) time — on a tunneled chip the
first call of each compiled kernel pays extra dispatch/transfer setup, which
explained the round-4 discrepancy between BENCH (3-iteration mean polluted
by cold calls) and the RESULTS.md warm table.

Run on the TPU (default platform); the full 3-curve table harness lives in
benchmark/run_benchmarks.py.
"""

import json
import random
import statistics
import sys
import time

BASELINE_MS = 1104.637 + 1080.747
VERIFY_BASELINE_MS = 3.109
DEGREE = 4096
SETUP_TERMS = 5000
N_ITER = 7


def timed(fn, n=N_ITER):
    """(cold_ms, warm_median_ms) — fn must block on its result."""
    t0 = time.time()
    fn()
    cold = (time.time() - t0) * 1e3
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append((time.time() - t0) * 1e3)
    return cold, statistics.median(times)


def main():
    import kzg_tpu as kzg

    kzg.init("BN254")
    t0 = time.time()
    ts = kzg.trusted_setup.from_secret(0xBEEF_CAFE_0123, SETUP_TERMS)
    t_setup = time.time() - t0
    print(f"# setup({SETUP_TERMS}) in {t_setup:.1f}s", file=sys.stderr)

    random.seed(1)
    data = "".join(chr(random.randrange(32, 127)) for _ in range(DEGREE + 1))
    b = kzg.blob.from_string(data)
    t0 = time.time()
    p = kzg.poly.from_blob(b)
    print(f"# from_blob in {time.time() - t0:.1f}s", file=sys.stderr)

    commit_cold, commit_ms = timed(lambda: ts.create_commit(p))
    proof_cold, proof_ms = timed(lambda: ts.create_proof(p, 0, 1))

    c = ts.create_commit(p)
    pr = ts.create_proof(p, 0, 1)
    blob_ok = kzg.blob.from_string(data[0], 0)
    ok = ts.verify_proof(c, pr, blob_ok)
    refuted = not ts.verify_proof(
        c, pr, kzg.blob.from_string(chr(ord(data[0]) ^ 1), 0))
    verify_cold, verify_ms = timed(lambda: ts.verify_proof(c, pr, blob_ok))
    ok = ok and refuted
    print(f"# commit cold {commit_cold:.1f} / warm {commit_ms:.1f} ms; "
          f"proof cold {proof_cold:.1f} / warm {proof_ms:.1f} ms; "
          f"verify cold {verify_cold:.1f} / warm {verify_ms:.1f} ms "
          f"(ref verify {VERIFY_BASELINE_MS} ms); "
          f"verify_ok={ok} (incl. refutation)", file=sys.stderr)
    if not ok:
        print(json.dumps({"metric": "bn254_deg4096_commit_plus_proof",
                          "value": -1, "unit": "ms", "vs_baseline": 0,
                          "error": "verification failed"}))
        return 1

    total = commit_ms + proof_ms
    print(json.dumps({
        "metric": "bn254_deg4096_commit_plus_proof",
        "value": round(total, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / total, 3),
        "cold_ms": round(commit_cold + proof_cold, 3),
        "verify_warm_ms": round(verify_ms, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
