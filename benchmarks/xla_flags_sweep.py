"""XLA compiler-option sweep on the headline train step.

The production step is a single XLA program (bench.py: UNet 256px B=128
bf16), so the remaining levers after the step-variant experiments
(benchmarks/step_variants.py — all parked at parity or worse) are the
compiler's own scheduling knobs.

Mechanism (MEASURED finding, 2026-08-18): env-var `XLA_FLAGS` CANNOT
carry TPU flags here — the TPU is reached through a PJRT plugin tunnel
(`axon`), and the local process's XLA flag parser belongs to the CPU
build, which aborts on unknown TPU flags
(`parse_flags_from_env.cc: Unknown flag in XLA_FLAGS:
--xla_tpu_scoped_vmem_limit_kib`). The correct TPU-native channel is
per-computation `compiler_options` in the PJRT compile request:
`jit(step).lower(...).compile(compiler_options={...})` — verified
accepted by the remote compiler. This harness lowers the real train
step ONCE and compiles it per candidate option set, timing each
executable.

Candidates:
  * xla_tpu_scoped_vmem_limit_kib=N — the VMEM budget the fusion
    pipeliner may claim per scoped allocation; larger values let conv
    pipelines keep more row-strips resident (risk: spills → slower).
  * xla_tpu_enable_latency_hiding_scheduler — overlap async copies with
    compute (mostly pays with collectives; measured anyway).

Usage: python benchmarks/xla_flags_sweep.py [--steps 10]
Prints one JSON line per config plus a final best-config summary.

MEASURED (v5e via axon, 2026-08-18, --steps 20, 2 interleaved reps,
max taken):
  default          410.86 img/s
  vmem32m          417.77 img/s  (+1.7%)
  vmem64m          418.38 img/s  (+1.8%)   <- winner
  vmem96m          415.41 img/s  (+1.1%)
  lhs              410.98 img/s  (+0.03%)
  vmem64m+lhs      417.67 img/s  (+1.7%)
VERDICT: KEEP vmem64m. All three raised VMEM budgets beat default by
1-2% (the fusion pipeliner keeps more conv row-strips resident); the
latency-hiding scheduler is neutral on one chip (no collectives to
overlap). Wired into the production training programs as
`train/steps.py default_compiler_options()` (probed per process,
TPU-only, opt-out ISTPU_NO_COMPILER_OPTIONS=1).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

CONFIGS = [
    ("default", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem64m+lhs", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"}),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--repeat", type=int, default=2,
                   help="interleaved timing reps per config (max taken), "
                        "de-noising tunnel jitter")
    p.add_argument("--configs", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    size, base, batch = (256, 64, 128) if on_accel else (64, 8, 4)
    steps = args.steps if on_accel else 2

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)
    labels = jnp.asarray(
        rng.integers(0, 4, (batch, size, size)), jnp.int32)
    model = UNet(num_classes=4, base=base,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), images[:1], make_adamw(1e-3))

    step = make_train_step(DiceCELoss(ignore_index=3))
    lowered = step.lower(state0, (images, labels))

    picked = [c for c in CONFIGS
              if not args.configs or c[0] in args.configs.split(",")]
    compiled = {}
    for name, opts in picked:
        try:
            compiled[name] = lowered.compile(
                compiler_options=opts or None)
        except Exception as e:  # remote compiler may reject an option
            print(json.dumps({"config": name, "error": str(e)[:400]}),
                  flush=True)

    def time_once(fn):
        # the step donates its state input, which would invalidate
        # state0 for the next config — start each rep from a fresh
        # device copy and thread the returned state through the loop
        st = jax.tree.map(jnp.array, state0)
        st, loss = fn(st, (images, labels))
        float(loss)  # hard sync (block_until_ready no-ops over the tunnel)
        t0 = time.perf_counter()
        for _ in range(steps):
            st, loss = fn(st, (images, labels))
        float(loss)
        return batch * steps / (time.perf_counter() - t0)

    results = {name: 0.0 for name in compiled}
    for _rep in range(args.repeat):  # interleave reps across configs
        for name, fn in compiled.items():
            results[name] = max(results[name], time_once(fn))
    for name, val in results.items():
        print(json.dumps({"config": name, "img_per_sec": round(val, 2),
                          "options": dict(picked)[name]}), flush=True)
    if results:
        best = max(results, key=results.get)
        print(json.dumps({"best_config": best,
                          "best_img_per_sec": round(results[best], 2)}),
              flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
