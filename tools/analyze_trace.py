"""Summarize a jax.profiler trace: top self-time ops on the device.

Usage: python tools/analyze_trace.py /tmp/prof_f32 [--top 30]

Parses the .xplane.pb the profiler wrote (via the xprof /
tensorboard_plugin_profile converter that ships in the image) and prints a
per-op self-time table — the data behind VERDICT.md's "profile the train
step" item, without needing the TensorBoard UI.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_xplane(logdir: str) -> str:
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    return paths[-1]


def tool_data(xplane: str, tool: str):
    try:
        from xprof.convert import raw_to_tool_data as rtd  # newer image
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], tool, {})
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--tool", default="hlo_stats")
    args = ap.parse_args()

    xplane = find_xplane(args.logdir)
    print(f"# {xplane}", file=sys.stderr)
    data = tool_data(xplane, args.tool)
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        obj = json.loads(data)
    except Exception:
        print(data[:4000])
        return

    # hlo_stats comes back as gviz-style {cols, rows}
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]

    def col(name_frag):
        for i, c in enumerate(cols):
            if name_frag.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("hlo op name") or col("op name") or col("name")
    i_self = col("total self time (us)") or col("self time")
    i_pct = col("self time (%)") or col("%")
    if i_self is None:
        print(cols)
        for r in rows[:10]:
            print(r)
        return

    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f"{'self_us':>12} {'pct':>6}  {'category':<24} name")
    for r in rows[: args.top]:
        pct = 100.0 * (r[i_self] or 0) / total if total else 0
        print(
            f"{r[i_self] or 0:>12.0f} {pct:>5.1f}%  "
            f"{str(r[i_cat])[:24]:<24} {str(r[i_name])[:90]}"
        )
    # category rollup
    agg: dict[str, float] = {}
    for r in rows:
        agg[str(r[i_cat])] = agg.get(str(r[i_cat]), 0.0) + (r[i_self] or 0)
    print("\n# by category")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v:>12.0f} {100.0 * v / total if total else 0:>5.1f}%  {k}")


if __name__ == "__main__":
    main()
