"""Token-coverage measurement for the English lexicon + affix layer.

    python tools/en_coverage.py [rootdir ...] [--top N]

Walks the given roots (default: the installed site-packages plus
/usr/share/doc) for prose-ish text files (.md/.rst/.txt), tokenizes to
lowercase word tokens, and reports the fraction resolved WITHOUT falling
through to rule-based letter-to-sound (i.e. via the vendored lexicon or its
affix layer, english.py:_lexicon_lookup). Prints the most frequent
unresolved words so dictionary batches can be mined frequency-first
(the method that drove 66.6% -> 89.1% -> this round's target >=96%).
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vits_tpu.text.english import _lexicon_lookup  # noqa: E402

WORD = re.compile(r"[a-z']+")
EXTS = (".md", ".rst", ".txt")
_VOWELS = set("aeiouy")


def prose_token(w: str) -> bool:
    """Keep natural-prose words; drop code identifiers and stray letters
    (no vowel, single letters other than a/i, bare apostrophe runs)."""
    w = w.strip("'")
    if len(w) < 1 or (len(w) == 1 and w not in "ai"):
        return False
    return any(c in _VOWELS for c in w)


def iter_files(roots):
    for root in roots:
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.lower().endswith(EXTS):
                    yield os.path.join(dirpath, fn)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 200
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    roots = args or [
        "/opt/venv/lib/python3.12/site-packages", "/usr/share/doc"
    ]
    counts: collections.Counter[str] = collections.Counter()
    for path in iter_files(roots):
        try:
            text = open(path, errors="ignore").read().lower()
        except OSError:
            continue
        counts.update(w for w in WORD.findall(text) if prose_token(w))
    total = sum(counts.values())
    covered = 0
    miss: collections.Counter[str] = collections.Counter()
    for w, c in counts.items():
        if _lexicon_lookup(w.strip("'")) is not None:
            covered += c
        else:
            miss[w] += c
    print(f"tokens: {total}  types: {len(counts)}")
    print(f"token coverage: {covered/total:.4f}")
    print(f"type coverage: {1 - len(miss)/len(counts):.4f}")
    print("--- top unresolved ---")
    for w, c in miss.most_common(top):
        print(f"{c:8d} {w}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
