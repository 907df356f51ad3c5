"""TPU-only exactness battery: the Pallas-fused paths vs the python oracle.

The pytest suite runs on CPU (tests/conftest.py), where ops.fuse never
activates — so Pallas-fused kernels can ONLY be validated on the real chip.
This script is that regression gate. Run it on the TPU (no JAX_PLATFORMS
override) after touching fields/mont.py, ops/fuse.py, or ops/msm.py:

    python scripts/tpu_checks.py            # ~6 min warm cache

It re-runs the round-4 judge-grade findings:
  * fused Montgomery mul vs oracle across grid sizes (standalone kernels
    are exact at every size — the round-4 miscompile was call-site bound);
  * the deg-4096 commit MSM vs oracle — the bucket `corr` call-site
    (811,008-lane fused mul) miscompiled until ops/msm.py traced it
    un-fused (see _bucket_sums_chunked);
  * a deg-4096 end-to-end commit+proof+verify roundtrip.

Exit code 0 = all exact.
"""

import random
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import kzg_tpu as kzg
    from kzg_tpu.curves.params import get_curve
    from kzg_tpu.fields.mont import Field, ints_to_limbs, limbs_to_ints
    from kzg_tpu.ops.fuse import fuse_pointwise
    from kzg_tpu.protocol.api import _ctx
    from kzg_tpu.refmodel.model import G1 as OG1

    if jax.default_backend() != "tpu":
        print("SKIP: not on a TPU backend (Pallas paths inactive)")
        return 0

    t0 = time.time()
    failures = 0

    # ---- 1. fused mul vs oracle across grid sizes --------------------
    cp = get_curve("BN254")
    F = Field(cp.fp)
    p = F.modulus
    L = F.L
    rinv = pow(1 << (16 * L), -1, p)
    random.seed(11)
    for lanes in (4096, 131072, 811008):
        av = [random.randrange(p) for _ in range(lanes)]
        bv = [random.randrange(p) for _ in range(lanes)]
        a = jnp.asarray(ints_to_limbs(av, L))
        b = jnp.asarray(ints_to_limbs(bv, L))
        out = jax.jit(lambda x, y: fuse_pointwise(
            F._mul_impl, (x, y), batch_ndim=1))(a, b)
        rf = np.asarray(jax.device_get(out))
        bad = 0
        for i in random.sample(range(lanes), 128):
            if limbs_to_ints(rf[:, i:i + 1])[0] % p != \
                    av[i] * bv[i] * rinv % p:
                bad += 1
        status = "ok" if bad == 0 else f"FAIL ({bad}/128)"
        failures += bad > 0
        print(f"fused mul lanes={lanes:7d} (grid {lanes // 256:4d}): "
              f"{status}  [{time.time() - t0:.0f}s]", flush=True)

    # ---- 2. deg-4096 commit MSM vs oracle ----------------------------
    kzg.init("BN254")
    pc = _ctx()
    og = OG1(pc.cp)
    r = pc.cp.r
    S = 0xBEEF_CAFE_0123
    ts = kzg.trusted_setup.from_secret(S, 5000)
    random.seed(2)
    coeffs = [random.randrange(r) for _ in range(4097)]
    c = ts.create_commit(kzg.poly(coeffs))
    e, acc = 0, 1
    for ci in coeffs:
        e = (e + ci * acc) % r
        acc = acc * S % r
    ok = c.curve_point == og.mul(e, og.gen)
    failures += not ok
    print(f"deg-4096 commit MSM vs oracle: {'ok' if ok else 'FAIL'}  "
          f"[{time.time() - t0:.0f}s]", flush=True)

    # ---- 3. deg-4096 end-to-end roundtrip ----------------------------
    random.seed(1)
    data = "".join(chr(random.randrange(32, 127)) for _ in range(4097))
    pblob = kzg.poly.from_blob(kzg.blob.from_string(data))
    c2 = ts.create_commit(pblob)
    pr = ts.create_proof(pblob, 0, 1)
    ok2 = ts.verify_proof(c2, pr, kzg.blob.from_string(data[0], 0))
    ok3 = not ts.verify_proof(c2, pr, kzg.blob.from_string(
        chr(ord(data[0]) ^ 1), 0))
    failures += not (ok2 and ok3)
    print(f"deg-4096 e2e commit+proof+verify(+refute): "
          f"{'ok' if ok2 and ok3 else 'FAIL'}  [{time.time() - t0:.0f}s]",
          flush=True)

    print(f"{'ALL OK' if not failures else 'FAILURES: %d' % failures} "
          f"in {time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
