"""Render benchmark/results/tables_*.json + scaling json into RESULTS.md,
side by side with the reference's published numbers (BASELINE.md)."""

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")

# reference README numbers (ms) — see BASELINE.md for provenance
REF_SETUP = {
    "BN158": {128: 18.293, 256: 31.476, 512: 62.800, 1024: 133.105,
              2048: 246.527, 4096: 482.306},
    "BN254": {128: 34.207, 256: 71.426, 512: 169.810, 1024: 287.471,
              2048: 598.011, 4096: 947.288},
    "BLS12381": {128: 45.303, 256: 109.405, 512: 144.887, 1024: 284.286,
                 2048: 570.938, 4096: 1008.991},
}
REF_SINGLE = {
    "BN158": {128: (11.612, 11.608, 1.847), 256: (26.548, 23.826, 2.898),
              512: (48.153, 48.852, 3.471), 1024: (100.149, 90.389, 3.337),
              2048: (219.755, 194.226, 1.633),
              4096: (378.268, 404.283, 1.701)},
    "BN254": {128: (30.083, 42.504, 3.269), 256: (55.151, 62.676, 3.259),
              512: (136.220, 122.255, 3.082),
              1024: (211.453, 267.592, 3.109),
              2048: (445.452, 446.845, 3.718),
              4096: (1104.637, 1080.747, 3.109)},
    "BLS12381": {128: (38.794, 44.258, 9.437), 256: (73.779, 94.335, 9.284),
                 512: (151.911, 143.107, 16.916),
                 1024: (314.844, 339.103, 9.383),
                 2048: (610.632, 616.749, 9.117),
                 4096: (1153.631, 1399.958, 9.035)},
}
REF_MULTI = {
    "BN158": {128: (459.939, 44.586), 256: (408.241, 101.035),
              512: (361.574, 181.904), 1024: (366.182, 377.419),
              2048: (427.972, 806.526), 4096: (571.068, 1646.688)},
    "BN254": {128: (922.247, 94.114), 256: (860.305, 187.539),
              512: (810.811, 369.300), 1024: (800.158, 814.464),
              2048: (745.346, 1599.394)},
    "BLS12381": {128: (1358.254, 134.653), 256: (1118.744, 242.510),
                 512: (1077.430, 480.500), 1024: (993.971, 995.959),
                 2048: (874.976, 2032.417)},
}


def sp(x, ref):
    if ref is None:
        return f"{x:.1f} | — | —"
    return f"{x:.1f} | {ref:.1f} | {ref / x:.2f}x"


def main():
    out = ["# Measured results (one TPU v5e chip, tunneled; ~25 ms/call "
           "dispatch overhead included)",
           "",
           "Reference columns are the C++ library's published desktop-CPU "
           "numbers (BASELINE.md). `speedup` > 1 means this framework is "
           "faster.", ""]
    for f in sorted(glob.glob(os.path.join(RESULTS, "tables_*.json"))):
        data = json.load(open(f))
        for curve, rows in data.items():
            out += [f"## {curve}", ""]
            setup = [rw for rw in rows if rw["op"] == "setup"]
            if setup:
                out += ["### Trusted setup (warm generation)", "",
                        "| Terms | ms | reference ms | speedup |",
                        "|---|---|---|---|"]
                for rw in setup:
                    ref = REF_SETUP.get(curve, {}).get(rw["terms"])
                    out.append(f"| {rw['terms']} | "
                               + sp(rw["ms"], ref) + " |")
                out.append("")
            single = [rw for rw in rows if rw["op"] == "single"]
            if single:
                out += ["### Single proofs (setup 5000)", "",
                        "| Degree | commit ms | ref | x | proof ms | ref "
                        "| x | verify ms | ref | x | ok |",
                        "|---|---|---|---|---|---|---|---|---|---|"]
                for rw in single:
                    ref = REF_SINGLE.get(curve, {}).get(rw["degree"])
                    rr = ref or (None, None, None)
                    cells = []
                    for v, rv in ((rw["commit_ms"], rr[0]),
                                  (rw["proof_ms"], rr[1]),
                                  (rw["verify_ms"], rr[2])):
                        if rv is None:
                            cells += [f"{v:.1f}", "—", "—"]
                        else:
                            cells += [f"{v:.1f}", f"{rv:.1f}",
                                      f"{rv / v:.2f}x"]
                    out.append(f"| {rw['degree']} | " + " | ".join(cells)
                               + f" | {'ok' if rw['ok'] else 'FAIL'} |")
                out.append("")
            multi = [rw for rw in rows if rw["op"] == "multi"]
            if multi:
                out += ["### Multi proofs (degree-4096 polynomial)", "",
                        "| Points | proof ms | ref | x | verify ms | ref "
                        "| x | ok |", "|---|---|---|---|---|---|---|---|"]
                for rw in multi:
                    ref = REF_MULTI.get(curve, {}).get(rw["points"])
                    rr = ref or (None, None)
                    cells = []
                    for v, rv in ((rw["proof_ms"], rr[0]),
                                  (rw["verify_ms"], rr[1])):
                        if rv is None:
                            cells += [f"{v:.1f}", "—", "—"]
                        else:
                            cells += [f"{v:.1f}", f"{rv:.1f}",
                                      f"{rv / v:.2f}x"]
                    out.append(f"| {rw['points']} | " + " | ".join(cells)
                               + f" | {'ok' if rw['ok'] else 'FAIL'} |")
                out.append("")
    scal = os.path.join(RESULTS, "scaling_virtualmesh.json")
    if os.path.exists(scal):
        d = json.load(open(scal))
        out += [f"## Sharded MSM scaling — {d['curve']} n={d['n']} "
                f"({'virtual CPU mesh' if d['virtual_mesh'] else 'TPU'})",
                "", d["note"], "",
                "| Devices | coeffs/device | time ms | overhead vs D=1 |",
                "|---|---|---|---|"]
        for rw in d["rows"]:
            out.append(f"| {rw['devices']} | {rw['per_device_coeffs']} | "
                       f"{rw['time_ms']} | x{rw['overhead_vs_D1']} |")
        out.append("")
        if d.get("weak_rows"):
            out += ["Weak scaling (coeffs/device fixed; ideal on a "
                    "timeshared virtual mesh is time ∝ D, i.e. "
                    "T/(D·T1) = 1):", "",
                    "| Devices | total n | time ms | T/(D·T1) |",
                    "|---|---|---|---|"]
            for rw in d["weak_rows"]:
                out.append(f"| {rw['devices']} | {rw['n']} | "
                           f"{rw['time_ms']} | x{rw['time_over_ideal']} |")
            out.append("")
    stg = os.path.join(RESULTS, "stage_times.json")
    if os.path.exists(stg):
        d = json.load(open(stg))
        out += [f"## Stage latencies (BN254, setup {d['setup_terms']}, "
                f"degree {d['degree']}, {d['platform']})", "",
                "Median warm per-stage jit latencies. `*_e2e` rows run the "
                "production fused pipeline; standalone stage rows labelled "
                "`(unfused)` were compiled without the Pallas per-mul "
                "fuser and show the raw-XLA cost, not the in-pipeline "
                "share.", "",
                "| Stage | ms |", "|---|---|"]
        unfused = {"commit_msm_only_ms", "commit_msm_affine_ms",
                   "proof_polyops_ms", "proof_multieval_ms",
                   "verify_math_ms", "verify_g2msm_ms"}
        for k, v in d.items():
            if k in ("setup_terms", "degree", "platform"):
                continue
            lbl = k + (" (unfused)" if k in unfused else "")
            out.append(f"| {lbl} | {v} |")
        out.append("")
    roof = os.path.join(RESULTS, "roofline.json")
    if os.path.exists(roof):
        d = json.load(open(roof))
        out += ["## Roofline (speed-of-light utilization, one chip)", "",
                "| Kernel | measured /s | SOL /s | bound | utilization |",
                "|---|---|---|---|---|"]
        for kr in d["kernels"]:
            if "utilization" in kr:
                sol = min(kr["sol_compute_per_s"], kr["sol_bandwidth_per_s"])
                out.append(
                    f"| {kr['kernel']} | {kr['elements_per_s']:.3e} | "
                    f"{sol:.3e} | {kr['bound']} | "
                    f"{kr['utilization']:.1%} |")
            else:
                out.append(f"| {kr['kernel']} | "
                           f"{kr['elements_per_s']:.3e} points/s | — | — | "
                           f"{kr.get('ms', 0):.2f} ms |")
        out.append("")
    path = os.path.join(RESULTS, "RESULTS.md")
    open(path, "w").write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
