"""XLA compiler-flag sweep on the headline train step.

The production step is a single XLA program (bench.py: UNet 256px B=128
bf16), so the remaining levers after the step-variant experiments
(benchmarks/step_variants.py — all parked at parity or worse) are the
compiler's own scheduling knobs. Flags must be set before backend
initialisation, so each candidate runs `bench.py` in a fresh subprocess
with XLA_FLAGS composed into the environment.

Candidates (TPU-real flags only):
  * --xla_tpu_scoped_vmem_limit_kib=N — the VMEM budget the fusion
    pipeliner may claim per scoped allocation; larger values let conv
    pipelines keep more row-strips resident (risk: spills → slower).
  * --xla_tpu_enable_latency_hiding_scheduler — overlap async copies
    with compute (mostly pays with collectives; measured anyway).

Usage: python benchmarks/xla_flags_sweep.py [--steps 10] [--repeat 1]
Prints one JSON line per config plus a final best-config summary.
Measured results land in this docstring once the sweep has run on the
TPU (a KEEP note naming the winning config, or a PARKED note if none
beats the default).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CONFIGS = [
    ("default", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--configs", default="")
    args = p.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    picked = [c for c in CONFIGS
              if not args.configs or c[0] in args.configs.split(",")]
    results = []
    for name, flags in picked:
        best = 0.0
        for _ in range(args.repeat):
            env = dict(os.environ)
            base = env.get("XLA_FLAGS", "")
            env["XLA_FLAGS"] = (base + " " + flags).strip()
            try:
                r = subprocess.run(
                    [sys.executable, "bench.py", "--steps", str(args.steps)],
                    cwd=root, env=env, capture_output=True, text=True,
                    timeout=1800,
                )
            except subprocess.TimeoutExpired:
                # a pathological flag config must not abort the sweep
                print(json.dumps({"config": name,
                                  "error": "timed out after 1800s"}))
                continue
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                val = json.loads(line)["value"]
            except (json.JSONDecodeError, KeyError, IndexError):
                print(json.dumps({"config": name, "error":
                                  (r.stderr or "no output")[-300:]}))
                val = 0.0
            best = max(best, val)
        results.append((name, best))
        print(json.dumps({"config": name, "img_per_sec": best,
                          "flags": flags}))
    if results:
        results.sort(key=lambda t: -t[1])
        print(json.dumps({"best_config": results[0][0],
                          "best_img_per_sec": results[0][1]}))


if __name__ == "__main__":
    main()
