"""Attribute device self-time to model components.

Joins a jax.profiler trace (per-fusion self-times, via analyze_trace's
hlo_stats extraction) with a compiled-HLO dump (fusion -> op_name metadata,
via tools/dump_step_hlo.py) and rolls the time up by component scope —
the strategic view behind "where does the train step actually go".

Usage:
  python tools/dump_step_hlo.py --bf16 --out /tmp/step.hlo.txt
  python bench_train.py --bf16 --trace /tmp/prof
  python tools/attribute_trace.py /tmp/prof /tmp/step.hlo.txt
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analyze_trace import find_xplane, tool_data  # noqa: E402
import json  # noqa: E402


def load_fusion_opnames(hlo_path: str) -> dict[str, str]:
    """fusion name -> op_name metadata from an HLO text dump."""
    name_pat = re.compile(r"^\s*(?:ROOT )?%([a-zA-Z0-9_.-]+) = ")
    meta_pat = re.compile(r"metadata=\{[^}]*op_name=\"([^\"]*)\"")
    out: dict[str, str] = {}
    with open(hlo_path) as f:
        for line in f:
            m = name_pat.match(line)
            if not m or m.group(1) in out:
                continue
            mm = meta_pat.search(line)
            if mm:
                out[m.group(1)] = mm.group(1)
    return out


# op_name is like:
#   jit(<unknown>)/transpose(jvp(AvocodoDiscriminator))/combd/block_2/conv_3/...
#   jit(<unknown>)/jvp(SynthesizerTrn)/dec/up_1/...
_DIRECTION = re.compile(r"transpose\(jvp\(([A-Za-z_]+)\)\)|jvp\(([A-Za-z_]+)\)")


def component_key(op_name: str, depth: int) -> str:
    m = _DIRECTION.search(op_name)
    if m:
        model = m.group(1) or m.group(2)
        grad = "bwd" if m.group(1) else "fwd"
        tail = op_name[m.end():].strip("/")
    else:
        model, grad = "other", ""
        tail = op_name.split("/", 1)[-1]
    parts = [p for p in tail.split("/") if not p.startswith(("jit(", "jvp("))]
    scope = "/".join(parts[:depth]) or "(top)"
    return f"{model}:{grad}:{scope}" if grad else f"{model}:{scope}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("hlo_dump")
    ap.add_argument("--depth", type=int, default=1,
                    help="scope depth to roll up to (1=submodule)")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    opnames = load_fusion_opnames(args.hlo_dump)

    data = tool_data(find_xplane(args.logdir), "hlo_stats")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]

    def col(frag):
        for i, c in enumerate(cols):
            if frag.lower() in str(c).lower():
                return i
        raise SystemExit(f"no column matching {frag}: {cols}")

    i_name = col("hlo op name")
    i_self = col("total self time (us)")

    agg: dict[str, float] = {}
    unmatched = 0.0
    total = 0.0
    for r in rows:
        t = r[i_self] or 0.0
        total += t
        name = str(r[i_name])
        op = opnames.get(name)
        if op is None:
            unmatched += t
            continue
        key = component_key(op, args.depth)
        agg[key] = agg.get(key, 0.0) + t

    print(f"{'self_us':>12} {'pct':>6}  component")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:>12.0f} {100 * v / total:>5.1f}%  {k}")
    print(f"{unmatched:>12.0f} {100 * unmatched / total:>5.1f}%  "
          f"(unmatched: fusion names not in dump — numbering drift)")


if __name__ == "__main__":
    main()
