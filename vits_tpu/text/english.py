"""English g2p: text -> IPA.

Behavioral reference: /root/reference/text/english.py (keithito-style
cleaning, eng_to_ipa conversion, CMU/ARPA fallback for OOV words, dark-l
marking, IPA->IPA2 rewrites).

Backends: `eng_to_ipa` (+ `g2p_en` for OOV) when installed — the reference's
own libraries. Otherwise a dependency-free fallback: a built-in lexicon of
frequent words + rule-based letter-to-sound. The fallback trades accuracy
for availability; its output stays inside the model's symbol inventory.
"""

from __future__ import annotations

import re
import unicodedata

from vits_tpu.text.numbers import normalize_numbers_en

_abbreviations = [
    (re.compile(r"\b%s\." % x[0], re.IGNORECASE), x[1])
    for x in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"),
        ("gen", "general"), ("drs", "doctors"), ("rev", "reverend"),
        ("lt", "lieutenant"), ("hon", "honorable"), ("sgt", "sergeant"),
        ("capt", "captain"), ("esq", "esquire"), ("ltd", "limited"),
        ("col", "colonel"), ("ft", "fort"),
    ]
]

_ipa_to_ipa2 = [(re.compile(p), r) for p, r in [("r", "ɹ"), ("ʤ", "dʒ"), ("ʧ", "tʃ")]]

# ARPA -> IPA (reference english.py:90-93)
ARPA_TO_IPA = {
    "a": "ə", "ey": "eɪ", "aa": "ɑ", "ae": "æ", "ah": "ə", "ao": "ɔ",
    "aw": "aʊ", "ay": "aɪ", "ch": "ʧ", "dh": "ð", "eh": "ɛ", "er": "ər",
    "hh": "h", "ih": "ɪ", "jh": "ʤ", "ng": "ŋ", "ow": "oʊ", "oy": "ɔɪ",
    "sh": "ʃ", "th": "θ", "uh": "ʊ", "uw": "u", "zh": "ʒ", "iy": "i",
    "y": "j",
}

# built-in lexicon for the dependency-free fallback: the vendored
# CMU-derived frequent-word dictionary (text/en_dict.py, ~5,300 base forms
# with stress marks) layered over the original small seed list below; the
# affix layer in _word_to_ipa_fallback derives regular inflections, so the
# effective form coverage is several times larger.
_SEED_LEXICON = {
    "a": "ə", "an": "æn", "the": "ðə", "of": "əv", "to": "tu", "and": "ænd",
    "in": "ɪn", "is": "ɪz", "it": "ɪt", "you": "ju", "that": "ðæt",
    "he": "hi", "she": "ʃi", "was": "wəz", "for": "fɔɹ", "are": "ɑɹ",
    "with": "wɪð", "as": "æz", "his": "hɪz", "her": "həɹ", "they": "ðeɪ",
    "i": "aɪ", "at": "æt", "be": "bi", "this": "ðɪs", "have": "hæv",
    "from": "fɹəm", "or": "ɔɹ", "one": "wən", "had": "hæd", "by": "baɪ",
    "word": "wəɹd", "but": "bət", "not": "nɑt", "what": "wət",
    "all": "ɔɫ", "were": "wəɹ", "we": "wi", "when": "wɛn", "your": "jɔɹ",
    "can": "kæn", "said": "sɛd", "there": "ðɛɹ", "use": "juz",
    "each": "iʧ", "which": "wɪʧ", "do": "du", "how": "haʊ",
    "their": "ðɛɹ", "if": "ɪf", "will": "wɪɫ", "up": "əp",
    "other": "əðəɹ", "about": "əbaʊt", "out": "aʊt", "many": "mɛni",
    "then": "ðɛn", "them": "ðɛm", "these": "ðiz", "so": "soʊ",
    "some": "səm", "would": "wʊd", "make": "meɪk", "like": "laɪk",
    "him": "hɪm", "into": "ɪntu", "time": "taɪm", "has": "hæz",
    "look": "lʊk", "two": "tu", "more": "mɔɹ", "write": "ɹaɪt",
    "go": "goʊ", "see": "si", "no": "noʊ", "way": "weɪ",
    "could": "kʊd", "my": "maɪ", "than": "ðæn", "first": "fəɹst",
    "been": "bɪn", "who": "hu", "its": "ɪts", "now": "naʊ",
    "people": "pipəɫ", "over": "oʊvəɹ", "did": "dɪd", "down": "daʊn",
    "only": "oʊnli", "world": "wəɹɫd", "hello": "hɛloʊ", "speech": "spiʧ",
    "voice": "vɔɪs", "synthesis": "sɪnθəsɪs", "language": "læŋgwəʤ",
    "model": "mɑdəɫ", "test": "tɛst", "good": "gʊd", "morning": "mɔɹnɪŋ",
    "says": "sɛz", "very": "vɛɹi", "here": "hiɹ", "our": "aʊəɹ",
    "say": "seɪ", "where": "wɛɹ", "after": "æftəɹ", "little": "lɪtəɫ",
    "know": "noʊ", "should": "ʃʊd", "because": "bɪkɔz", "through": "θɹu",
    "years": "jɪɹz", "day": "deɪ", "does": "dəz", "come": "kəm",
    "new": "nu", "sound": "saʊnd", "work": "wəɹk", "three": "θɹi",
    "word's": "wəɹdz", "give": "gɪv",
}

from vits_tpu.text.en_dict import WORDS as _EN_DICT  # noqa: E402

_LEXICON = dict(_SEED_LEXICON)
_LEXICON.update(_EN_DICT)  # the vendored dictionary wins (adds stress marks)

_SIBILANT_FINAL = tuple("szʃʒʧʤ")
_VOICELESS_FINAL = tuple("ptkfθ")

# ordered rule-based letter-to-sound rules (fallback path only)
_LTS_RULES = [
    ("ation", "eɪʃən"),
    ("tion", "ʃən"), ("sion", "ʒən"), ("ture", "ʧəɹ"), ("ought", "ɔt"),
    ("augh", "æf"), ("ough", "ʌf"), ("eigh", "eɪ"), ("igh", "aɪ"),
    ("tch", "ʧ"), ("dge", "ʤ"), ("nge", "nʤ"), ("ck", "k"),
    ("wh", "w"), ("wr", "ɹ"),
    ("kn", "n"), ("qu", "kw"), ("ph", "f"), ("gh", "g"), ("sh", "ʃ"),
    ("ch", "ʧ"), ("th", "θ"), ("ng", "ŋ"), ("oo", "u"), ("ee", "i"),
    ("ea", "i"), ("ou", "aʊ"), ("ow", "oʊ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("au", "ɔ"), ("aw", "ɔ"), ("oa", "oʊ"),
    ("ie", "i"), ("ue", "u"), ("ew", "u"), ("eu", "u"),
    ("ar", "ɑɹ"), ("er", "əɹ"),
    ("ir", "əɹ"), ("or", "ɔɹ"), ("ur", "əɹ"),
    ("a", "æ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "g"), ("h", "h"), ("i", "ɪ"), ("j", "ʤ"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɑ"),
    ("p", "p"), ("q", "k"), ("r", "r"), ("s", "s"), ("t", "t"),
    ("u", "ə"), ("v", "v"), ("w", "w"), ("x", "ks"), ("y", "i"),
    ("z", "z"), ("'", ""),
    # magic-e long vowels (uppercased by _letter_to_sound's silent-e strip)
    ("A", "eɪ"), ("E", "i"), ("I", "aɪ"), ("O", "oʊ"), ("U", "ju"),
]


def expand_abbreviations(text: str) -> str:
    for regex, replacement in _abbreviations:
        text = regex.sub(replacement, text)
    return text


def collapse_whitespace(text: str) -> str:
    return re.sub(r"\s+", " ", text)


def mark_dark_l(text: str) -> str:
    """l before non-vowel/word-end -> dark l (reference english.py:65-66)."""
    return re.sub(r"l([^aeiouæɑɔəɛɪʊ ]*(?: |$))", lambda m: "ɫ" + m.group(1), text)


def _strip_accents(text: str) -> str:
    """unidecode-lite: NFKD + drop combining marks."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text)
        if not unicodedata.combining(c) and ord(c) < 128
    )


def _plural_suffix(base_ipa: str) -> str:
    """-s allomorph: /ɪz/ after sibilants, /s/ after voiceless, else /z/."""
    if base_ipa.endswith(_SIBILANT_FINAL):
        return "ɪz"
    if base_ipa.endswith(_VOICELESS_FINAL):
        return "s"
    return "z"


def _past_suffix(base_ipa: str) -> str:
    """-ed allomorph: /ɪd/ after t,d; /t/ after voiceless; else /d/."""
    if base_ipa.endswith(("t", "d")):
        return "ɪd"
    if base_ipa.endswith(_VOICELESS_FINAL) or base_ipa.endswith(
            ("s", "ʃ", "ʧ")):
        return "t"
    return "d"


def _derived(base_ipa: str, suffix: str) -> str:
    """Attach a derivational suffix, adding word-initial stress when the
    suffix makes a monosyllabic base polysyllabic (eng_to_ipa marks stress
    in polysyllables only: play -> ˈpleɪɪŋ, walked stays wɔkt)."""
    if base_ipa.endswith("l") and suffix == "li":
        out = base_ipa + "i"  # careful + ly -> ˈkɛrfəli, not -lli
    else:
        out = base_ipa + suffix
    if "ˈ" not in out and any(v in suffix for v in "ɪəaeiouæɛʊɔ"):
        out = "ˈ" + out
    return out


def _lexicon_base(stem: str) -> str | None:
    """Look up a stem allowing silent-e restore, consonant undoubling
    (stopp -> stop), and y->i spelling (happi -> happy)."""
    if stem in _LEXICON:
        return _LEXICON[stem]
    if stem + "e" in _LEXICON:  # making -> make
        return _LEXICON[stem + "e"]
    if (len(stem) >= 3 and stem[-1] == stem[-2]
            and stem[:-1] in _LEXICON):  # stopp -> stop
        return _LEXICON[stem[:-1]]
    if stem.endswith("i") and stem[:-1] + "y" in _LEXICON:  # happi -> happy
        return _LEXICON[stem[:-1] + "y"]
    return None


def _word_to_ipa_fallback(word: str) -> str:
    ipa = _lexicon_lookup(word)
    if ipa is not None:
        return ipa
    # OOV inflection: peel possessive / past endings so the suffix reads
    # with the right allomorph instead of as spelled letters
    if len(word) > 3 and (word.endswith("'s") or word.endswith("s'")):
        base = _word_to_ipa_fallback(word[:-2])
        return base + _plural_suffix(base)
    if (len(word) >= 5 and word.endswith("ed")
            and word[-3] not in "aeiouy"):
        stem = word[:-2]
        if len(stem) >= 3 and stem[-1] == stem[-2]:  # planned -> plan
            stem = stem[:-1]
        base = _letter_to_sound(stem + "e")  # magic-e fires where due
        return base + _past_suffix(base)
    return _letter_to_sound(word.replace("'", ""))


def _lexicon_lookup(word: str) -> str | None:
    """Resolve via the vendored lexicon or its affix layer; None on miss."""
    if word in _LEXICON:
        return _LEXICON[word]
    # ---- affix layer: derive regular inflections from lexicon bases ----
    if word.endswith("'s") or word.endswith("s'"):
        base = _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, _plural_suffix(base))
    if word.endswith("ies") and word[:-3] + "y" in _LEXICON:
        # cities -> city (+z after the -i), flies -> fly (+z after -aɪ)
        return _LEXICON[word[:-3] + "y"] + "z"
    if word.endswith("es"):
        base = _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, _plural_suffix(base))
    if word.endswith("s") and not word.endswith("ss"):
        base = _lexicon_base(word[:-1])
        if base is None and len(word) >= 6:
            # plural of a word the affix layer itself derives
            # (holders, contributors, misreadings) — one recursive level
            base = _lexicon_lookup(word[:-1])
        if base is not None:
            return _derived(base, _plural_suffix(base))
    if word.endswith("ied") and word[:-3] + "y" in _LEXICON:
        base = _LEXICON[word[:-3] + "y"]  # carried -> carry
        return base + "d"
    if word.endswith("ed"):
        # prefer the e-final base (hoped -> hope, not the shorter word hop)
        base = _lexicon_base(word[:-1]) or _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, _past_suffix(base))
    if word.endswith("ing"):
        base = _lexicon_base(word[:-3])
        if base is not None:
            return _derived(base, "ɪŋ")
    if word.endswith("est"):
        base = _lexicon_base(word[:-3])
        if base is not None:
            return _derived(base, "əst")
    if word.endswith("er"):
        # prefer the e-final base (diner -> dine, not the shorter word din)
        base = _lexicon_base(word[:-1]) or _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, "ər")
    if word.endswith("or") and len(word) >= 6:
        # latinate agent nouns: contributor -> contribute, director -> direct
        base = _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, "ər")
    if word.endswith("ly"):
        base = _lexicon_base(word[:-2])
        if base is not None:
            return _derived(base, "li")
    for suf, ipa in (("ness", "nəs"), ("ment", "mənt"), ("ful", "fəl"),
                     ("less", "ləs"), ("ship", "ˌʃɪp"), ("hood", "ˌhʊd"),
                     ("al", "əl"), ("ous", "əs"), ("ish", "ɪʃ"),
                     ("able", "əbəl"), ("ible", "əbəl")):
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            base = _lexicon_base(word[: -len(suf)])
            if base is not None:
                return _derived(base, ipa)
    if word.endswith("y") and len(word) >= 4:
        # -y adjectivizer: rain -> rainy, dust -> dusty, crust -> crusty
        base = _lexicon_base(word[:-1])
        if base is not None and not base.endswith(tuple("iəaeɪu")):
            return _derived(base, "i")
    for pre, ipa in (("un", "ən"), ("re", "ri"), ("dis", "dɪs"),
                     ("pre", "pri"), ("non", "nɑn"), ("over", "ˌoʊvər"),
                     ("out", "ˌaʊt"), ("mis", "mɪs")):
        if word.startswith(pre) and len(word) - len(pre) >= 3:
            rest = word[len(pre):]
            hit = _LEXICON.get(rest)
            if hit is None and len(rest) >= 5:
                # prefix on a derived form (unsupported, disclaimer) —
                # one recursive level through the suffix rules
                hit = _lexicon_lookup(rest)
            if hit is not None:
                return ipa + hit
    # closed compound of two lexicon words (seashell, sunlight, raincoat):
    # primary stress on the first element, secondary on the second —
    # the regular English compound-stress pattern
    if len(word) >= 7:
        for cut in range(3, len(word) - 2):
            a, b = word[:cut], word[cut:]
            if a in _LEXICON and b in _LEXICON:
                ipa_a = _LEXICON[a].replace("ˈ", "").replace("ˌ", "")
                ipa_b = _LEXICON[b].replace("ˈ", "").replace("ˌ", "")
                return "ˈ" + ipa_a + "ˌ" + ipa_b
    return None


# nucleus tokens for syllabification (diphthongs before monophthongs)
_NUCLEI = re.compile(r"eɪ|aɪ|oʊ|aʊ|ɔɪ|[iuɪʊɛæɑɔəɜ]")

# legal English syllable onsets (clusters; any single consonant is legal)
_LEGAL_ONSETS = frozenset(
    "pl pr bl br tr dr kr kl gr gl fr fl fj θr θw sl sm sn sp st sk sw tw "
    "dw kw gw ʃr vj pj bj tj dj kj mj nj lj hj sf "
    "spr str skr spl skw spj stj skj".split()
)


def _add_default_stress(ipa: str) -> str:
    """Give a stressless LTS output a primary stress mark (eng_to_ipa marks
    stress in every polysyllable; a stressless polysyllable reads flat and
    is outside the reference distribution). Suffix-aware placement:
    -tion/-sion and -ic stress the preceding syllable, -ity/-ology/-ography
    the antepenult; everything else defaults to initial stress."""
    if "ˈ" in ipa or "ˌ" in ipa:
        return ipa
    nuclei = list(_NUCLEI.finditer(ipa))
    if len(nuclei) < 2:
        return ipa
    k = 0
    if re.search(r"(ʃ|ʒ)ən$", ipa) or ipa.endswith(("ɪk", "əns", "ɪʃəs")):
        k = len(nuclei) - 2
    elif re.search(r"([ɪə]ti|ədʒi|əfi|əmi|əni)$", ipa):
        k = max(len(nuclei) - 3, 0)
    start = nuclei[k].start()
    if k == 0:
        return "ˈ" + ipa
    # onset: take the longest phonotactically legal cluster before the
    # stressed nucleus (kwɪksɑtɪk -> kwɪk.ˈsɑ, not kwɪ.ˈksɑ)
    prev_end = nuclei[k - 1].end()
    cluster = ipa[prev_end:start]
    onset = len(cluster)
    while onset > 1 and cluster[-onset:] not in _LEGAL_ONSETS:
        onset -= 1
    return ipa[: start - onset] + "ˈ" + ipa[start - onset:]


def _letter_to_sound(word: str) -> str:
    """Rule-of-thumb grapheme-to-phoneme; last resort for OOV words."""
    out = ""
    i = 0
    w = word
    if w.startswith("x"):
        # word-initial x reads /z/ (xylophone, xenon, xerox); the greek
        # xy- prefix keeps its long vowel (the uppercase sentinel is the
        # magic-e long-vowel convention of the rule table)
        w = ("zI" + w[2:]) if w.startswith("xy") else ("z" + w[1:])
    if w.startswith(("gn", "ps", "pn", "mn")) and len(w) > 3:
        w = w[1:]  # silent initial letter (gnome, pseudo, pneumonia)
    if w.startswith("mc"):
        w = "mək" + w[2:]  # mcdonald, mcguffin
    if w.endswith("ture") and len(w) > 4:
        # handle before the magic-e strip would turn it into tUr -> tjur
        return _add_default_stress(_letter_to_sound(w[:-4]) + "ʧəɹ")
    # silent final e lengthens the previous vowel (magic e: blaze -> bleɪz,
    # glide -> glaɪd); uppercase marks the long vowel for the rule table.
    # Keep the e after soft c/g so the dge/ce/ge rules fire (bridge, office)
    if (len(w) > 3 and w.endswith("e") and w[-2] not in "aeiou"
            and not w.endswith(("dge", "ce", "ge"))):
        w = w[:-1]
        if (len(w) >= 2 and w[-2] in "aeiou" and
                (len(w) < 3 or w[-3] not in "aeiou")):
            w = w[:-2] + w[-2].upper() + w[-1]
    elif (len(w) > 3 and w.endswith(("ce", "ge")) and w[-3] in "aeiou"
            and (len(w) < 5 or w[-4] not in "aeiou")):
        # magic e through soft c/g: nice -> naɪs, page -> peɪʤ
        w = w[:-3] + w[-3].upper() + w[-2:]
    while i < len(w):
        # context-sensitive cases the flat rule list cannot express
        if w[i] == "c" and i + 1 < len(w) and w[i + 1] in "eiy":
            out += "s"  # soft c (cell, city, cycle)
            i += 1
            continue
        if w[i] == "g" and i + 1 < len(w) and w[i + 1] in "ey":
            out += "ʤ"  # soft g (page, gym); gi- kept hard (give, girl)
            i += 1
            continue
        if w[i] == "e" and i == len(w) - 1 and i > 0 and w[i - 1] in "cg":
            i += 1  # silent final e kept for the soft c/g context
            continue
        if w[i] == "y":
            out += "j" if i == 0 else ("i" if i == len(w) - 1 else "ɪ")
            i += 1
            continue
        if w[i] == "a" and i == len(w) - 1 and i > 0:
            out += "ə"  # word-final a is a schwa (sofa, data, NASA)
            i += 1
            continue
        if w[i] == "o" and i == len(w) - 1 and i > 0:
            out += "oʊ"  # word-final o is long (hero, photo, pseudo)
            i += 1
            continue
        for pat, rep in _LTS_RULES:
            if w.startswith(pat, i):
                out += rep
                i += len(pat)
                break
        else:
            out += w[i]
            i += 1
    # doubled consonant letters are one sound (umbrella, thrapple)
    return _add_default_stress(re.sub(r"([bdfgklmnprstvz])\1", r"\1", out))


def _text_to_ipa_backend(text: str) -> str:
    try:
        import eng_to_ipa

        phonemes = eng_to_ipa.convert(text)
        return _oov_to_ipa(phonemes)
    except ImportError:
        words = re.findall(r"[a-z']+|[^a-z' ]+| ", text)
        return "".join(
            _word_to_ipa_fallback(w) if re.match(r"^[a-z']+$", w) else w
            for w in words
        )


def _oov_to_ipa(text: str) -> str:
    """Words eng_to_ipa marked with `*` -> g2p_en + ARPA->IPA
    (reference english.py:109-122)."""
    matches = re.findall(r"\s([\w|']+\*)", text) + re.findall(r"^([\w|']+\*)", text)
    if not matches:
        return text
    try:
        from g2p_en import G2p

        g2p = G2p()
        for word in matches:
            ipa = "".join(
                ARPA_TO_IPA.get(ph.lower().rstrip("012345"), ph.lower())
                for ph in g2p(word.rstrip("*"))
            )
            text = text.replace(word, ipa)
    except ImportError:
        for word in matches:
            text = text.replace(word, _word_to_ipa_fallback(word.rstrip("*")))
    return text


# letter-name words for acronym spell-out; their IPA lives in the lexicon
_LETTER_WORDS = {
    "a": "ay", "b": "bee", "c": "cee", "d": "dee", "e": "ee", "f": "ef",
    "g": "gee", "h": "aitch", "i": "eye", "j": "jay", "k": "kay",
    "l": "el", "m": "em", "n": "en", "o": "oh", "p": "pee", "q": "cue",
    "r": "ar", "s": "ess", "t": "tee", "u": "yu", "v": "vee",
    "w": "doubleyu", "x": "ex", "y": "why", "z": "zee",
}
_LETTER_NAME_IPA = {
    "ay": "eɪ", "bee": "bi", "cee": "si", "dee": "di", "ee": "i",
    "ef": "ɛf", "gee": "ʤi", "aitch": "eɪʧ", "eye": "aɪ", "jay": "ʤeɪ",
    "kay": "keɪ", "el": "ɛl", "em": "ɛm", "en": "ɛn", "oh": "oʊ",
    "pee": "pi", "cue": "kju", "ar": "ɑr", "ess": "ɛs", "tee": "ti",
    "yu": "ju", "vee": "vi", "doubleyu": "ˈdəbəlju", "ex": "ɛks",
    "why": "waɪ", "zee": "zi",
}
_LEXICON.update(_LETTER_NAME_IPA)


def _spell_acronyms(text: str) -> str:
    """ALL-CAPS tokens read as letter names: TTS -> tee tee ess. Runs
    before lowercasing — case is the only signal. Short caps words and
    vowel-less caps spell out; longer pronounceable initialisms (NASA)
    read as words; ordinary lexicon words typed in caps stay words."""

    def repl(m):
        word = m.group(0)
        lower = word.lower()
        if lower in _LEXICON and len(word) > 2:
            return lower
        if len(word) <= 3 or not any(c in "aeiou" for c in lower):
            return " ".join(_LETTER_WORDS[c] for c in lower if c in _LETTER_WORDS)
        return lower

    return re.sub(r"\b[A-Z]{2,}\b", repl, text)


def english_to_ipa(text: str) -> str:
    """Main entry (reference english.py:69-85)."""
    text = text.replace("-", " ")
    text = _strip_accents(text)
    text = _spell_acronyms(text)
    text = text.lower()
    text = expand_abbreviations(text)
    text = normalize_numbers_en(text)
    phonemes = _text_to_ipa_backend(text)
    phonemes = collapse_whitespace(phonemes)
    text = mark_dark_l(phonemes)
    for regex, replacement in _ipa_to_ipa2:
        text = regex.sub(replacement, text)
    return text.replace("...", "…")
