"""Count true FLOPs of a compiled HLO module (grouped-conv aware).

XLA's cost_analysis() counts feature_group_count convolutions as if dense,
inflating model FLOPs (and thus MFU) by the group count on grouped-conv
heavy models like the Avocodo discriminator. This parses the compiled HLO
text and counts convolution + dot FLOPs exactly.

Usable as a module (bench.py imports true_flops_from_hlo) or a CLI:
  python tools/hlo_flops.py /tmp/step.hlo.txt
"""

from __future__ import annotations

import math
import re
import sys

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8)\[([0-9,]*)\]")
_CONV = re.compile(r"%?\S+ = \S+ convolution\(")
_DOT = re.compile(r"%?\S+ = \S+ dot\(")
_FGC = re.compile(r"feature_group_count=(\d+)")
_BGC = re.compile(r"batch_group_count=(\d+)")
_WINDOW_SIZE = re.compile(r"window=\{size=([0-9x]+)")
_DNUMS = re.compile(r"dim_labels=([0-9a-z?]+)_([0-9a-z?]+)->([0-9a-z?]+)")
_CONTRACT = re.compile(
    r"lhs_contracting_dims=\{([0-9,]*)\}"
)


def _shapes(line: str) -> list[tuple[str, list[int]]]:
    return [
        (m.group(1), [int(x) for x in m.group(2).split(",") if x])
        for m in _SHAPE.finditer(line)
    ]


_OPERANDS = re.compile(r"\(([^()]*)\)")
_NAME_DEF = re.compile(r"^\s*(?:ROOT )?%([a-zA-Z0-9_.-]+) = (\S+)")


def conv_flops(line: str, shape_of: dict[str, list[int]]) -> float:
    """2 * out_elems * window_size * in_channels_per_group (MACs x 2)."""
    shapes = _shapes(line)
    if not shapes:
        return 0.0
    out_shape = shapes[0][1]  # result shape leads the instruction
    m = _WINDOW_SIZE.search(line)
    sizes = [int(x) for x in m.group(1).split("x")] if m else [1]
    # input dilation (gradient convs): only ~size/lhs_dilate window taps
    # land on a real (non-stuffed-zero) input per output element
    md = re.search(r"lhs_dilate=([0-9x]+)", line)
    dils = (
        [int(x) for x in md.group(1).split("x")] if md else [1] * len(sizes)
    )
    window = math.prod(
        -(-s // d) for s, d in zip(sizes, dils)
    )
    # rhs (kernel) shape: resolve the second operand by name
    mo = _OPERANDS.search(line[line.index("convolution(") :])
    cipg = 1
    dn = _DNUMS.search(line)
    if mo and dn:
        ops = [o.strip().lstrip("%") for o in mo.group(1).split(",")]
        rhs_shape = shape_of.get(ops[1]) if len(ops) > 1 else None
        if rhs_shape:
            # rhs dim_labels e.g. "io01": 'i' = input-features-per-group.
            # The window dims in rhs_labels are digits; cipg is at 'i'.
            i_pos = dn.group(2).index("i")
            if i_pos < len(rhs_shape):
                # window already includes the kernel spatial dims; divide
                # them out of rhs if 'i' aliases one (it never does: labels
                # are distinct), so this is just the 'i' extent.
                cipg = rhs_shape[i_pos]
    # batch-grouped convs (XLA weight-gradient convs for grouped/depthwise
    # forward convs): the contraction only spans batch/bgc elements per
    # output group, so the dense count overcounts by exactly bgc
    mb = _BGC.search(line)
    bgc = int(mb.group(1)) if mb else 1
    if bgc > 1 and cipg % bgc == 0:
        cipg //= bgc
    out_elems = math.prod(out_shape)
    return 2.0 * out_elems * window * cipg


def dot_flops(line: str) -> float:
    shapes = _shapes(line)
    if len(shapes) < 2:
        return 0.0
    out_shape = shapes[0][1]
    lhs_shape = shapes[1][1]
    m = _CONTRACT.search(line)
    if m and m.group(1):
        cdims = [int(x) for x in m.group(1).split(",")]
        k = math.prod(lhs_shape[d] for d in cdims)
    else:
        k = lhs_shape[-1] if lhs_shape else 1
    return 2.0 * math.prod(out_shape) * k


def true_flops_from_hlo(hlo_text: str) -> dict[str, float]:
    lines = hlo_text.splitlines()
    shape_of: dict[str, list[int]] = {}
    for line in lines:
        m = _NAME_DEF.match(line)
        if m:
            sh = _SHAPE.search(m.group(2))
            if sh:
                shape_of.setdefault(
                    m.group(1), [int(x) for x in sh.group(2).split(",") if x]
                )
    conv = dot = 0.0
    for line in lines:
        if " convolution(" in line:
            conv += conv_flops(line, shape_of)
        elif " dot(" in line:
            dot += dot_flops(line)
    return {"conv": conv, "dot": dot, "total": conv + dot}


def main():
    with open(sys.argv[1]) as f:
        text = f.read()
    r = true_flops_from_hlo(text)
    print(
        f"conv={r['conv']:.4e}  dot={r['dot']:.4e}  total={r['total']:.4e}"
    )


if __name__ == "__main__":
    main()
