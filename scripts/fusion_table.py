"""Per-fusion HBM-traffic itemization of the flagship train step.

VERDICT round 3 asked for the 51 ms between the measured step (200.8 ms)
and the HBM-bandwidth floor (149.4 ms) to be itemized per fusion. XLA's
cost analysis only reports totals, and the axon-tunnel backend exposes no
server-side profiler trace, so this script derives the table from the
optimized (post-fusion, post-layout) HLO itself:

for every instruction executed by the ENTRY computation it charges
    bytes = output buffer + sum(operand buffers)
(operands of a fusion are exactly the HBM buffers the fusion reads; its
output is what it writes — internals don't exist in HBM), converts bytes
to a time floor at the 819 GB/s v5e bandwidth, and aggributes rows by the
instruction's `metadata op_name` source path (the jit(step)/... module
trail), so each GB maps back to a model component.

Two tables are printed:
  1. top-K single instructions by bytes (with op kind + source attribution)
  2. aggregation by component group (unet encoder / decoder / gaussians /
     fcomb+loss / optimizer / preprocessing / other)

Columns report both GB and the bandwidth-floor ms share so the residual
can be attributed: sum(ms) ~= the cost-analysis HBM floor; the measured
step minus that floor is fusion-boundary + non-overlapped-MXU overhead.

Usage: python scripts/fusion_table.py [bs] [remat]
  remat: "0" (default), "1", "save_convs"
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

HBM_BW = 819e9

_DT_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}


def shape_bytes(shape: str) -> int:
    """Bytes of one (possibly tuple) HLO shape string."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(",") if dims else []:
            n *= int(d)
        total += n * _DT_BYTES.get(dt, 4)
    return total


def classify(op_name: str) -> str:
    """Map a metadata op_name path to a component group."""
    s = op_name
    # Under jax.grad the forward trace is tagged jvp(...) and the backward
    # transpose(jvp(...)): only the latter is the backward pass.
    direction = "bwd" if "transpose(" in s else "fwd"
    if "unet" in s:
        if "/dec_" in s:
            comp = "unet-decoder"
        elif "/enc_" in s or "out_norm" in s or "out_conv" in s:
            comp = "unet-encoder"
        else:
            comp = "unet-other"
    elif "prior" in s or "posterior" in s:
        comp = "gaussians"
    elif "fcomb" in s or "crps" in s or "fused_fcomb" in s:
        comp = "fcomb+loss"
    elif "adamw" in s or "apply_gradients" in s or "update" in s.lower():
        comp = "optimizer"
    elif "preprocess" in s or "interp" in s or "standard" in s or "pool" in s:
        comp = "preprocess"
    elif not s:
        return "untagged"
    else:
        comp = "other"
    return f"{comp} ({direction})"


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    remat = sys.argv[2] if len(sys.argv) > 2 else "0"
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_train_step
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    cfg.train.batch_size = bs
    cfg.model.compute_dtype = "bfloat16"
    if remat in ("save_convs", "save_convs_all"):
        cfg.train.remat = remat
    elif remat == "1":
        cfg.train.remat = True

    res = cfg.data.resolution
    model = ProbabilisticUNet(
        img_resolution=res, dtype=jnp.bfloat16,
        remat=cfg.train.remat,
    )
    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    hr = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))(hr)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=cfg.train.seed)
    step = make_train_step(model, cfg)
    b0, b1 = jnp.float32(1.0), jnp.float32(1e-3)
    compiled = step.lower(state, hr, stats, b0, b1).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    txt = compiled.as_text()

    # ---- locate the ENTRY computation's instruction block ----
    lines = txt.splitlines()
    entry_lines = []
    in_entry = False
    depth = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
        if in_entry:
            entry_lines.append(ln)
            depth += ln.count("{") - ln.count("}")
            if depth <= 0 and len(entry_lines) > 1:
                break

    # ---- first pass: name -> output bytes for every entry instruction ----
    defn = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*((?:\([^)]*\)|\S+?))\s+([\w-]+)\(")
    out_bytes: dict[str, int] = {}
    rows = []
    for ln in entry_lines:
        m = defn.match(ln)
        if not m:
            continue
        name, shape, op = m.groups()
        b = shape_bytes(shape)
        out_bytes[name] = b
        rows.append((name, shape, op, ln, m.end()))

    # Ops that move no HBM bytes: views/metadata (HloCostAnalysis charges
    # bitcast/tuple/get-tuple-element/parameter zero bytes).
    free_ops = {"parameter", "constant", "iota", "bitcast", "tuple",
                "get-tuple-element", "after-all"}

    # ---- second pass: operand bytes + attribution ----
    items = []
    for name, shape, op, ln, opers_at in rows:
        if op in free_ops:
            continue
        # operand list: from just after "op(" (defn match end) to the first
        # ")" — names only there (modern HLO text has no % sigils)
        oplist = ln[opers_at:].split(")")[0]
        operands = re.findall(r"%?([\w.-]+)", oplist)
        rd = sum(out_bytes.get(o, 0) for o in operands)
        wr = out_bytes.get(name, 0)
        mm = re.search(r'op_name="([^"]*)"', ln)
        op_name = mm.group(1) if mm else ""
        items.append({
            "name": name, "op": op, "bytes": rd + wr, "read": rd,
            "write": wr, "op_name": op_name,
        })

    total_b = sum(it["bytes"] for it in items)
    ca_bytes = float(ca.get("bytes accessed", 0.0))
    print(f"bs={bs} remat={remat}")
    print(f"entry instructions: {len(items)}; "
          f"sum(read+write) = {total_b/1e9:.1f} GB; "
          f"cost-analysis 'bytes accessed' = {ca_bytes/1e9:.1f} GB")
    print(f"bandwidth floor at 819 GB/s: sum/BW = {total_b/HBM_BW*1e3:.1f} ms")

    # ---- table 1: top instructions ----
    items.sort(key=lambda it: -it["bytes"])
    print("\ntop 45 instructions by HBM traffic (read+write):")
    print(f"{'MB':>9} {'ms':>6}  {'op':<14} {'group':<22} op_name tail")
    for it in items[:45]:
        tail = it["op_name"][-70:]
        print(f"{it['bytes']/1e6:9.1f} {it['bytes']/HBM_BW*1e3:6.2f}  "
              f"{it['op']:<14} {classify(it['op_name']):<22} {tail}")

    # ---- table 2: aggregate by component group ----
    agg = defaultdict(lambda: [0, 0])
    for it in items:
        g = classify(it["op_name"])
        agg[g][0] += 1
        agg[g][1] += it["bytes"]
    print("\nby component group:")
    print(f"{'group':<26} {'n':>5} {'GB':>8} {'ms@819GB/s':>11} {'%':>6}")
    for g, (n, b) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"{g:<26} {n:5d} {b/1e9:8.2f} {b/HBM_BW*1e3:11.1f} "
              f"{100*b/total_b:6.1f}")

    # ---- table 3: aggregate by op kind ----
    agg2 = defaultdict(lambda: [0, 0])
    for it in items:
        agg2[it["op"]][0] += 1
        agg2[it["op"]][1] += it["bytes"]
    print("\nby op kind:")
    for g, (n, b) in sorted(agg2.items(), key=lambda kv: -kv[1][1])[:14]:
        print(f"{g:<26} {n:5d} {b/1e9:8.2f} {b/HBM_BW*1e3:11.1f} "
              f"{100*b/total_b:6.1f}")


if __name__ == "__main__":
    main()
