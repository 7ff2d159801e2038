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

# built-in lexicon for the dependency-free fallback (frequent words +
# function words whose rule-based reading would be wrong)
_LEXICON = {
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

# ordered rule-based letter-to-sound rules (fallback path only)
_LTS_RULES = [
    ("tion", "ʃən"), ("sion", "ʒən"), ("ture", "ʧəɹ"), ("ought", "ɔt"),
    ("augh", "æf"), ("ough", "ʌf"), ("eigh", "eɪ"), ("igh", "aɪ"),
    ("tch", "ʧ"), ("dge", "ʤ"), ("ck", "k"), ("wh", "w"), ("wr", "ɹ"),
    ("kn", "n"), ("qu", "kw"), ("ph", "f"), ("gh", "g"), ("sh", "ʃ"),
    ("ch", "ʧ"), ("th", "θ"), ("ng", "ŋ"), ("oo", "u"), ("ee", "i"),
    ("ea", "i"), ("ou", "aʊ"), ("ow", "oʊ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("au", "ɔ"), ("aw", "ɔ"), ("oa", "oʊ"),
    ("ie", "i"), ("ue", "u"), ("ew", "u"), ("ar", "ɑɹ"), ("er", "əɹ"),
    ("ir", "əɹ"), ("or", "ɔɹ"), ("ur", "əɹ"),
    ("a", "æ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "g"), ("h", "h"), ("i", "ɪ"), ("j", "ʤ"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɑ"),
    ("p", "p"), ("q", "k"), ("r", "r"), ("s", "s"), ("t", "t"),
    ("u", "ə"), ("v", "v"), ("w", "w"), ("x", "ks"), ("y", "i"),
    ("z", "z"), ("'", ""),
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


def _word_to_ipa_fallback(word: str) -> str:
    if word in _LEXICON:
        return _LEXICON[word]
    if word.endswith("s") and word[:-1] in _LEXICON:
        base = _LEXICON[word[:-1]]
        return base + ("z" if base[-1] in "aeiouɑæəɛɪʊbdgvðlmnŋɹ" else "s")
    out = ""
    i = 0
    w = word
    # silent final e lengthens the previous vowel (approximate)
    if len(w) > 3 and w.endswith("e") and w[-2] not in "aeiou":
        w = w[:-1]
    while i < len(w):
        for pat, rep in _LTS_RULES:
            if w.startswith(pat, i):
                out += rep
                i += len(pat)
                break
        else:
            out += w[i]
            i += 1
    return out


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


def english_to_ipa(text: str) -> str:
    """Main entry (reference english.py:69-85)."""
    text = text.replace("-", " ")
    text = _strip_accents(text).lower()
    text = expand_abbreviations(text)
    text = normalize_numbers_en(text)
    phonemes = _text_to_ipa_backend(text)
    phonemes = collapse_whitespace(phonemes)
    text = mark_dark_l(phonemes)
    for regex, replacement in _ipa_to_ipa2:
        text = regex.sub(replacement, text)
    return text.replace("...", "…")
