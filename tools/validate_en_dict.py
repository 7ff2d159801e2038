"""Integrity checks for the vendored English lexicon (text/en_dict.py).

Run after editing the dictionary:

    python tools/validate_en_dict.py

Checks every entry for (a) symbol-inventory encodability after english.py's
IPA->IPA2 rewrites, (b) stress-mark conventions (eng_to_ipa marks stress in
polysyllables only), and (c) spelling-alphabet sanity of the keys. Exits
non-zero on hard failures; prints warnings for heuristic stress findings.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from vits_tpu.text.en_dict import WORDS  # noqa: E402
from vits_tpu.text.symbols import symbols  # noqa: E402

VOWELS = "aeiouæɑɔɛɪʊə"
DIPHTHONGS = ("eɪ", "aɪ", "oʊ", "aʊ", "ɔɪ")


def syllable_count(ipa: str) -> int:
    s = ipa.replace("ˈ", "").replace("ˌ", "")
    for d in DIPHTHONGS:
        s = s.replace(d, "V")
    # remaining vowel runs: hiatus (iə, uə, ...) is 2 nuclei in eng_to_ipa
    n = 0
    for ch in s:
        if ch == "V" or ch in VOWELS:
            n += 1
    return n


def main() -> int:
    errors: list[str] = []
    warnings: list[str] = []
    symset = set(symbols)
    for word, ipa in sorted(WORDS.items()):
        if not re.fullmatch(r"[a-z']+", word):
            errors.append(f"key not lowercase-alpha: {word!r}")
        if not ipa:
            errors.append(f"empty IPA: {word!r}")
            continue
        rewritten = (
            ipa.replace("r", "ɹ").replace("ʤ", "dʒ").replace("ʧ", "tʃ")
        )
        bad = [c for c in rewritten if c not in symset]
        if bad:
            errors.append(f"{word!r}: chars outside inventory: {bad} ({ipa})")
        syl = syllable_count(ipa)
        if syl >= 2 and "ˈ" not in ipa:
            warnings.append(f"{word!r}: {syl} syllables but no primary stress ({ipa})")
        if syl <= 1 and ("ˈ" in ipa or "ˌ" in ipa):
            warnings.append(f"{word!r}: monosyllable with stress mark ({ipa})")
    print(f"{len(WORDS)} entries checked: {len(errors)} errors, {len(warnings)} warnings")
    for w in warnings:
        print("WARN", w)
    for e in errors:
        print("ERROR", e)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
