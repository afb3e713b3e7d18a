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


# full type with layout/memory-space annotation, e.g.
#   bf16[64,8960,136]{2,1,0:T(8,128)(2,1)S(1)}
_TYPED_NAME_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*(\([^=]*?\)|[\w\[\],]+(?:\{[^}]*\})?)\s+([\w\-]+)\(([^)]*)")
_LAYOUT_RE = re.compile(r"\{([^}]*)\}")
_SPACE_RE = re.compile(r"S\(\d+\)")


def _split_type(t: str):
    """(dtype+dims, layout-sans-space, space) of the FIRST array in a type."""
    m = _SHAPE_RE.search(t)
    base = m.group(0) if m else t
    lm = _LAYOUT_RE.search(t)
    layout = lm.group(1) if lm else ""
    space = "".join(_SPACE_RE.findall(layout))
    return base, _SPACE_RE.sub("", layout), space


def classify_copies(text: str):
    """Attribute every copy's bytes to one of three classes (round-3 VERDICT
    next #5 — name the ~99 GB 'unattributed async/copy staging' bucket):

      space-change: same logical layout, different memory space (S(k)) —
          HBM<->VMEM prefetch/spill the MSA scheduler inserts; the price of
          software pipelining, not removable waste.
      layout-change: physical relayout (tiling/minor-order differs) — each
          multi-GB entry here is a candidate optimization (round-3's
          dual-phase CREPE conv0 removed 3x591 MB of exactly these).
      duplicate: bit-identical copy, same layout AND space — genuine
          duplicated writes; should be ~0 after CSE, any mass here is a bug.

    Counts ``copy`` and ``copy-start`` (async pairs counted once at start;
    ``copy-done`` aliases the same buffer), across ALL computations so
    fusion-wrapped and while-body copies are included.
    """
    types: dict[str, str] = {}
    rows = []
    for ln in text.splitlines():
        m = _TYPED_NAME_RE.match(ln)
        if not m:
            continue
        name, type_str, op, operands = m.groups()
        types[name.lstrip("%")] = type_str
        if op not in ("copy", "copy-start"):
            continue
        src = operands.split(",")[0].strip().lstrip("%")
        # operand may be written as 'f32[..]{..} %name' (typed operand form)
        src_type = None
        if " " in src:
            parts = src.rsplit("%", 1)
            if len(parts) == 2:
                src_type, src = parts[0].strip(), parts[1].strip()
        if src_type is None:
            src_type = types.get(src)
        b = shape_bytes(type_str)
        if src_type is None:
            rows.append((b, "unknown-src", ln.strip()[:140]))
            continue
        dst_base, dst_layout, dst_space = _split_type(type_str)
        src_base, src_layout, src_space = _split_type(src_type)
        if dst_layout != src_layout or dst_base != src_base:
            cls = "layout-change"
        elif dst_space != src_space:
            cls = "space-change"
        else:
            cls = "duplicate"
        rows.append((b, cls, ln.strip()[:140]))

    by_class = collections.Counter()
    n_class = collections.Counter()
    for b, cls, _ in rows:
        by_class[cls] += b
        n_class[cls] += 1
    print("\ncopy classification (all computations):")
    for cls in ("space-change", "layout-change", "duplicate", "unknown-src"):
        if n_class[cls]:
            print(f"  {cls:14s} {n_class[cls]:6d} copies  "
                  f"{by_class[cls]/1e9:8.2f} GB")
    print("top 15 non-space-change copies by bytes:")
    interesting = sorted((r for r in rows if r[1] != "space-change"),
                         reverse=True)
    for b, cls, ln in interesting[:15]:
        print(f"  {b/1e6:9.1f} MB  [{cls}]  {ln}")
    return by_class


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
    classify_copies(text)


if __name__ == "__main__":
    main()
