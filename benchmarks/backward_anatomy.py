"""Per-op attribution of the train step: where the backward excess lives.

Round-2 verdict item: backward measured ~2.54× forward (theoretical 2×),
attributed in prose to "BN-backward reads + loss reductions" but never
profiled per-op. This tool produces the receipts:

  1. compile the production train step (B=128, 256px, bf16 UNet,
     Dice+CE — train/steps.py make_train_step) and keep the compiled
     HLO text, whose instruction metadata carries the originating
     module path (e.g. op_name="jit(train_step)/transpose(jvp(UNet))/
     Up_0/DoubleConv_0/ConvBNRelu_0/Conv_0/conv_general_dilated");
  2. jax.profiler-trace a few steps and sum device-op self-times from
     the perfetto JSON (event names == HLO instruction names);
  3. join (2) on (1) and bucket by direction × module:
       fwd/conv  fwd/bn  fwd/pool  bwd/conv  bwd/bn  bwd/pool
       loss (fwd+bwd — traced outside the UNet jvp scope)
       optimizer/update (no jvp in the op path)

Prints one JSON line with the bucket table (ms/step and share) plus the
measured fwd:bwd ratio, and a human table to stderr.

With --per-conv it additionally attributes every convolution HLO
instruction individually: originating layer (module path from op_name
metadata), kind (fwd / dgrad / wgrad — discriminated by result shape:
wgrad produces the (KH, KW, Cin, Cout) weight-shaped output), measured
ms/step from the trace, analytic GFLOP from the HLO shapes, and achieved
TFLOP/s — the speed-of-light receipts for where the backward excess
lives. Second JSON line + stderr table.

Run (real TPU): python benchmarks/backward_anatomy.py --per-conv
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# %name = type instr(...), ..., metadata={op_name="..." ...}
_INSTR_RE = re.compile(
    r"%?(?P<name>[\w\.\-]+) = .*metadata=\{[^}]*op_name=\"(?P<op>[^\"]*)\""
)


_BARE_INSTR_RE = re.compile(r"%?(?P<name>[\w\.\-]+) = ")


def parse_hlo_categories(hlo_text: str) -> dict:
    """instruction name -> (direction, module) category from metadata."""
    cats = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.search(line)
        if m:
            cats[m.group("name")] = categorize(m.group("op"), line)
            continue
        # instructions with no op_name metadata (wrapped computations,
        # layout copies): categorize by opcode
        b = _BARE_INSTR_RE.search(line)
        if b and " = " in line:
            name = b.group("name")
            if "select_and_scatter" in line:
                cats.setdefault(name, "bwd/pool")
            elif "reduce-window" in line:
                cats.setdefault(name, "fwd/pool")
            elif "transpose_copy" in name or line.strip().startswith(
                    f"%{name} = ") and " copy(" in line:
                cats.setdefault(name, "layout/copy")
    return cats


def categorize(op_name: str, line: str = "") -> str:
    """Map an HLO op_name path to a direction×module bucket."""
    bwd_model = "transpose(jvp" in op_name
    fwd_model = ("jvp(" in op_name or "(UNet)" in op_name) and not bwd_model
    is_model = "UNet)" in op_name or "ClipUNet)" in op_name \
        or "/DoubleConv" in op_name or "/ConvBNRelu" in op_name
    if is_model:
        d = "bwd" if bwd_model else "fwd"
        if "BatchNorm" in op_name:
            return f"{d}/bn"
        if "Conv" in op_name or "conv_general_dilated" in op_name:
            return f"{d}/conv"
        if ("max_pool" in op_name or "reduce_window" in op_name
                or "select_and_scatter" in line):
            return f"{d}/pool"
        return f"{d}/other"
    if bwd_model or "jvp(" in op_name:
        # traced under value_and_grad but outside the model module path:
        # the loss (one_hot, where, log_softmax, dice reductions)
        return "loss"
    return "optimizer/update"


# %convolution.N = bf16[128,256,256,64]{...} convolution(bf16[...] %a,
#   bf16[...] %b), window={size=3x3 ...}, dim_labels=b01f_01io->b01f, ...
_DIM_LABELS_RE = re.compile(
    r"dim_labels=(?P<lhs_spec>\w+)_(?P<rhs_spec>\w+)->(?P<out_spec>\w+)")
_SHAPE_RE = re.compile(r"[a-z]\w*\[([\d,]*)\]")


def _shape(s: str) -> list:
    return [int(d) for d in s.split(",") if d]


# instruction definition: `  %name = TYPE[dims]{layout} opcode(...)` —
# captures the defined name and its result-shape dims
_INSTR_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?P<name>[\w.\-]+)\s*=\s*"
    r"(?:\(\s*)?[a-z]\w*\[(?P<dims>[\d,]*)\]")
# computation header: `%fused_computation.3 (p0: bf16[1,2], ...) -> ... {`
_COMP_HDR_RE = re.compile(r"^(?:ENTRY\s+)?%?(?P<name>[\w.\-]+)\s+\(")
_PARAM_RE = re.compile(r"(?P<name>[\w.\-]+):\s*[a-z]\w*\[(?P<dims>[\d,]*)\]")


def parse_convs(hlo_text: str) -> dict:
    """op_name path -> {layer, kind, gflops} for every conv instruction.

    Scans the whole HLO text (top-level and fused computation bodies).
    The HLO printer emits operands as bare `%name` references (no inline
    shapes), so a first pass builds a per-computation symbol table —
    instruction result shapes plus computation-parameter shapes from
    each header — and conv operand shapes resolve through it.
    FLOPs via the universal conv identity: 2 * prod(out_shape) *
    rhs_contracted_feature * prod(rhs_spatial) — holds for forward,
    dgrad (rhs = reversed kernel) and wgrad (rhs = dout as kernel)
    alike. Kind: wgrad iff the output spec leads with spatial digits
    (weight-shaped output, e.g. ->01bf); else fwd/dgrad by jvp scope.
    """
    # pass 1: name -> result shape, scoped per computation
    scopes = {}
    scope = None
    for line in hlo_text.splitlines():
        if line and not line[0].isspace() and "(" in line:
            h = _COMP_HDR_RE.match(line)
            if h:
                scope = h.group("name")
                tbl = scopes.setdefault(scope, {})
                hdr = line.split("->")[0]
                for pm in _PARAM_RE.finditer(hdr):
                    tbl[pm.group("name")] = _shape(pm.group("dims"))
                continue
        d = _INSTR_DEF_RE.match(line)
        if d and scope is not None:
            scopes[scope][d.group("name")] = _shape(d.group("dims"))

    convs = {}
    scope = None
    for line in hlo_text.splitlines():
        if line and not line[0].isspace() and "(" in line:
            h = _COMP_HDR_RE.match(line)
            if h:
                scope = h.group("name")
                continue
        if " convolution(" not in line:
            continue
        dl = _DIM_LABELS_RE.search(line)
        b = _BARE_INSTR_RE.search(line)
        d = _INSTR_DEF_RE.match(line)
        if not dl or not b or not d:
            continue
        out = _shape(d.group("dims"))
        # operand names inside convolution(...)
        args = line.split(" convolution(", 1)[1].split(")", 1)[0]
        opnames = re.findall(r"%?([\w.\-]+)", args)
        tbl = scopes.get(scope, {})
        opshapes = [tbl.get(n) for n in opnames]
        if len(opshapes) < 2 or opshapes[1] is None:
            continue
        rhs = opshapes[1]
        om = re.search(r"op_name=\"([^\"]*)\"", line)
        op_name = om.group(1) if om else b.group("name")
        rhs_spec = dl.group("rhs_spec")
        if len(rhs) != len(rhs_spec):
            continue
        contracted = rhs[rhs_spec.index("i")]
        spatial = 1.0
        for i, c in enumerate(rhs_spec):
            if c.isdigit():
                spatial *= rhs[i]
        # lhs dilation (transpose-conv forward, dgrad of a strided conv):
        # XLA inserts zeros between lhs elements, so only 1/d of kernel
        # taps per spatial dim land on real values — the naive
        # prod(rhs_spatial) count is inflated by prod(lhs_dilate).
        # (For a 2x2 s2 transpose conv each output pixel gets exactly one
        # real tap; for dgrad of a 3x3 s2 conv this recovers FLOPs equal
        # to the forward conv, as it must.)
        wm = re.search(r"lhs_dilate=([\dx]+)", line)
        if wm:
            for d in wm.group(1).split("x"):
                spatial /= float(d)
        gflops = 2.0 * np.prod(out) * contracted * spatial / 1e9
        if not dl.group("out_spec")[0].isdigit():
            kind = "bwd/dgrad" if "transpose(jvp" in op_name else "fwd"
        else:
            kind = "bwd/wgrad"
        # short layer path: module segments between the jit/jvp prefix
        # and the trailing primitive
        seg = [s for s in op_name.split("/")
               if s and "jit(" not in s and "jvp(" not in s
               and not s.startswith("conv_general")]
        layer = "/".join(seg) or op_name
        convs[op_name] = {"layer": layer, "kind": kind,
                          "gflops": round(float(gflops), 2)}
    return convs


def per_conv_table(hlo_text: str, trace: dict, n_steps: int) -> list:
    """Join conv analytic FLOPs with measured device time per layer."""
    convs = parse_convs(hlo_text)
    # top-level instruction name -> conv op_name (direct convs and
    # fusions whose root metadata cites the conv path)
    name_to_op = {}
    for line in hlo_text.splitlines():
        b = _BARE_INSTR_RE.search(line)
        om = re.search(r"op_name=\"([^\"]*)\"", line)
        if b and om and om.group(1) in convs:
            name_to_op.setdefault(b.group("name"), om.group(1))
    times = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        op = name_to_op.get(ev.get("name", ""))
        if op:
            times[op] = times.get(op, 0.0) + ev["dur"]
    rows = {}
    for op, info in convs.items():
        key = (info["layer"], info["kind"])
        r = rows.setdefault(key, {"layer": info["layer"],
                                  "kind": info["kind"],
                                  "gflops": 0.0, "ms": 0.0})
        r["gflops"] += info["gflops"]
        r["ms"] += times.get(op, 0.0) / 1e3 / n_steps
    out = []
    for r in rows.values():
        tflops = (r["gflops"] / r["ms"]) if r["ms"] > 0 else None
        out.append({**r, "gflops": round(r["gflops"], 2),
                    "ms": round(r["ms"], 3),
                    "tflops_per_sec": round(tflops, 1) if tflops else None})
    return sorted(out, key=lambda r: -r["ms"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--trace-steps", type=int, default=3)
    p.add_argument("--trace-dir", default="/tmp/backward_anatomy_trace")
    p.add_argument("--per-conv", action="store_true",
                   help="emit the per-convolution speed-of-light table")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    B = args.batch if on_accel else 4
    S = args.size if on_accel else 64
    model = UNet(num_classes=4, base=64 if on_accel else 8,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (B, S, S)), jnp.int32)
    def mark(m):
        print(f"[banat] {m}", file=sys.stderr, flush=True)

    state = create_train_state(model, jax.random.PRNGKey(0), x[:1],
                               make_adamw(1e-3))
    mark("state created")
    step = make_train_step(DiceCELoss(ignore_index=3))

    # compiled HLO BEFORE any donated call (shares the jit cache)
    compiled = step.lower(state, (x, y)).compile()
    mark("step compiled")
    hlo_text = compiled.as_text()
    cats = parse_hlo_categories(hlo_text)

    st = [state]

    def run_step():
        s, l = step(st[0], (x, y))
        st[0] = s
        return l

    float(run_step())  # warm + hard sync (tunnel-safe)
    mark("warmed")
    t0 = time.perf_counter()
    for _ in range(10):
        l = run_step()
    float(l)
    step_ms = (time.perf_counter() - t0) / 10 * 1e3

    mark(f"timed: {step_ms:.1f} ms/step; tracing...")
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.trace_steps):
            l = run_step()
        float(l)

    files = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        sys.exit("no trace produced")
    mark(f"trace collected: {sorted(files)[-1]}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    mark("trace parsed")

    # device-lane events only: keep events whose name matches an HLO
    # instruction (host-side python/runtime lanes never do)
    buckets, unmatched = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        cat = cats.get(name) or cats.get(name.split(".")[0])
        if cat is None:
            # fusions keep their HLO names; anything else is host noise
            if re.fullmatch(r"[\w\-\.]+\.\d+", name) or name in cats:
                unmatched[name] = unmatched.get(name, 0) + ev["dur"]
            continue
        buckets[cat] = buckets.get(cat, 0.0) + ev["dur"]

    n = args.trace_steps
    table = {k: round(v / 1e3 / n, 3) for k, v in sorted(buckets.items())}
    device_total = sum(table.values())
    fwd = sum(v for k, v in table.items() if k.startswith("fwd/"))
    bwd = sum(v for k, v in table.items() if k.startswith("bwd/"))
    out = {
        "metric": "train_step_per_op_anatomy_ms",
        "buckets_ms_per_step": table,
        "device_total_ms": round(device_total, 2),
        "wall_step_ms": round(step_ms, 2),
        "fwd_ms": round(fwd, 2),
        "bwd_ms": round(bwd, 2),
        "bwd_over_fwd": round(bwd / fwd, 3) if fwd else None,
        "unmatched_ms": round(sum(unmatched.values()) / 1e3 / n, 3),
        "img_per_sec": round(B / (step_ms / 1e3), 1),
    }
    print(json.dumps(out))

    print("\n  bucket              ms/step   share", file=sys.stderr)
    for k, v in sorted(table.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<18} {v:>8.2f}   {v / device_total:>5.1%}",
              file=sys.stderr)
    if unmatched:
        top = sorted(unmatched.items(), key=lambda kv: -kv[1])[:8]
        print("  top unmatched device ops:", file=sys.stderr)
        for name, d in top:
            print(f"    {d/1e3/n:>8.2f} ms  {name}", file=sys.stderr)

    if args.per_conv:
        rows = per_conv_table(hlo_text, trace, n)
        print(json.dumps({"metric": "train_step_per_conv_speed_of_light",
                          "batch": B, "size": S, "rows": rows}))
        print("\n  layer                                   kind       "
              "ms/step   GFLOP   TFLOP/s", file=sys.stderr)
        for r in rows:
            tf = f"{r['tflops_per_sec']:>7.1f}" if r["tflops_per_sec"] \
                else "      -"
            print(f"  {r['layer']:<38}  {r['kind']:<9} {r['ms']:>8.2f} "
                  f"{r['gflops']:>8.2f} {tf}", file=sys.stderr)


if __name__ == "__main__":
    main()
