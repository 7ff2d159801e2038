"""Score the rule LTS against the hand-transcribed golden fixture.

    python tools/en_lts_accuracy.py [--verbose]

Fixture: tests/fixtures/en_lts_gold.tsv (200 real OOV words, CMU-convention
IPA authored once by hand; VERDICT r4 item #4b). Reports exact-match rate
(full string incl. stress marks), stress-pattern-only match, and
segments-only match, plus every miss with --verbose.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vits_tpu.text.english import _word_to_ipa_fallback  # noqa: E402


def main() -> int:
    verbose = "--verbose" in sys.argv
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "en_lts_gold.tsv",
    )
    rows = [
        line.rstrip("\n").split("\t")
        for line in open(path)
        if line.strip() and not line.startswith("#")
    ]
    exact = seg = stress = 0
    misses = []
    for word, gold in rows:
        out = _word_to_ipa_fallback(word)
        if out == gold:
            exact += 1
        else:
            misses.append((word, gold, out))
        strip = lambda s: re.sub(r"[ˈˌ]", "", s)  # noqa: E731
        if strip(out) == strip(gold):
            seg += 1
        pat = lambda s: [i for i, c in enumerate(strip(s)) if False]  # noqa: E731
        if [c for c in out if c in "ˈˌ"] == [c for c in gold if c in "ˈˌ"]:
            stress += 1
    n = len(rows)
    print(f"exact {exact}/{n} = {exact/n*100:.1f}%  "
          f"segments-only {seg}/{n} = {seg/n*100:.1f}%  "
          f"stress-inventory {stress}/{n} = {stress/n*100:.1f}%")
    if verbose:
        for w, g, o in misses:
            print(f"  {w}: gold={g} got={o}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
