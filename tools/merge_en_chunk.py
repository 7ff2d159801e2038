"""Dev helper: filter + validate a candidate en_dict chunk before appending.

    python tools/merge_en_chunk.py /tmp/chunk.py

The chunk file defines CHUNK: dict[str, str]. Prints (a) conflicts with the
existing lexicon, (b) validation errors/warnings, (c) the cleaned dict body
(new keys only, sorted) ready to paste into a WORDS.update({...}) section.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from vits_tpu.text.en_dict import WORDS  # noqa: E402
from tools.validate_en_dict import syllable_count  # noqa: E402
from vits_tpu.text.symbols import symbols  # noqa: E402


def main(path: str) -> int:
    ns: dict = {}
    exec(open(path).read(), ns)
    chunk: dict[str, str] = ns["CHUNK"]
    symset = set(symbols)
    new: dict[str, str] = {}
    errors = []
    for w, ipa in chunk.items():
        if w in WORDS:
            if WORDS[w] != ipa:
                print(f"CONFLICT {w!r}: existing {WORDS[w]!r} vs chunk {ipa!r}")
            continue
        rewritten = ipa.replace("r", "ɹ").replace("ʤ", "dʒ").replace("ʧ", "tʃ")
        bad = [c for c in rewritten if c not in symset]
        if bad:
            errors.append(f"{w!r}: chars outside inventory {bad} ({ipa})")
            continue
        syl = syllable_count(ipa)
        if syl >= 2 and "ˈ" not in ipa:
            errors.append(f"{w!r}: polysyllable missing stress ({ipa})")
            continue
        if syl <= 1 and ("ˈ" in ipa or "ˌ" in ipa):
            errors.append(f"{w!r}: monosyllable with stress ({ipa})")
            continue
        new[w] = ipa
    for e in errors:
        print("ERROR", e)
    print(f"# {len(new)} new entries ({len(chunk) - len(new)} dropped/dupes)")
    line = "    "
    out_lines = []
    for w in sorted(new):
        frag = f'"{w}": "{new[w]}", '
        if len(line) + len(frag) > 78:
            out_lines.append(line.rstrip())
            line = "    "
        line += frag
    if line.strip():
        out_lines.append(line.rstrip())
    print("\n".join(out_lines))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
