"""Byte-traffic + dispatch profile of the fused train step (round-3).

AOT-compiles the flagship train step and analyzes the optimized HLO entry
computation: per-op dispatch counts, and — the lever that matters — BYTE
traffic per instruction (output bytes as write-traffic proxy), ranked.
Round-3 finding: at batch 64 the step moves ~356 GB at ~28 TFLOP, i.e. it
runs at ~90% of v5e HBM bandwidth — memory-bound, so optimization = byte
reduction, not kernel-count reduction.

    python tools/profile_step.py [config] [dtype] [batch] [remat] [hlo_dump]
"""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

_DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4, "s8": 1,
    "u8": 1, "s16": 2, "u16": 2, "pred": 1, "s64": 8, "u64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


# '%name = <type> opname(' — type may be a tuple '(f32[..], bf16[..])'
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^=]*?\)|\S+?)\s+([\w\-]+)\(")


def analyze(text: str, top: int = 30):
    lines = text.splitlines()
    in_entry = False
    depth = 0
    ops = collections.Counter()
    op_bytes = collections.Counter()
    rows = []
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = ln.count("{") - ln.count("}")
            continue
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0:
            break
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        type_str, op = m.groups()
        b = shape_bytes(type_str)
        ops[op] += 1
        op_bytes[op] += b
        rows.append((b, op, ln.strip()[:140]))

    total = sum(ops.values())
    total_out_bytes = sum(op_bytes.values())
    print(f"TOTAL entry instructions (~dispatches): {total}")
    print(f"TOTAL entry OUTPUT bytes (write-traffic proxy): "
          f"{total_out_bytes/1e9:.1f} GB")
    print("\nper-op: count / output-GB")
    for op, n in ops.most_common(20):
        print(f"  {op:28s} {n:6d}  {op_bytes[op]/1e9:8.2f} GB")
    print(f"\ntop {top} instructions by output bytes:")
    rows.sort(reverse=True)
    for b, op, ln in rows[:top]:
        print(f"  {b/1e6:9.1f} MB  {ln}")


def main():
    import bench

    config = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/config/wavlm-stage2_2.yaml"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    remat = (sys.argv[4] if len(sys.argv) > 4 else "0") == "1"
    dump = sys.argv[5] if len(sys.argv) > 5 else None

    cfg, G, state, step = bench.build(config, dtype, batch, remat)
    rng = np.random.default_rng(0)
    batch_data = {
        "signal": jnp.asarray(0.1 * rng.standard_normal((batch, bench.SEG)).astype(np.float32)),
        "corrupted": jnp.asarray(0.1 * rng.standard_normal((batch, bench.SEG)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, bench.NUM_SPK, batch), dtype=jnp.int32),
    }
    compiled = step.lower(state, batch_data, jax.random.PRNGKey(1)).compile()
    text = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(text)
        print(f"HLO dumped to {dump} ({len(text)/1e6:.1f} MB)")

    print(f"config={config} dtype={dtype} batch={batch} remat={remat}")
    try:
        ca = compiled.cost_analysis()
        print(f"cost_analysis: flops={ca.get('flops'):.3e} "
              f"bytes accessed={ca.get('bytes accessed'):.3e}")
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e)
    analyze(text)


if __name__ == "__main__":
    main()
