"""Model input symbol inventory — 71 ids (pad + punctuation + IPA + extras).

This is the model's vocabulary contract (reference text/symbols.py:5-14);
ids must match for checkpoint/text parity: pad `_`, punctuation, IPA letters
incl. tone/accent arrows, extras.
"""

_pad = "_"
_punctuation = ",.!?-~…"
_letters = "NQabdefghijklmnopstuvwxyzɑæʃʑçɯɪɔɛɹðəɫɥɸʊɾʒθβŋɦ⁼ʰ`^#*=ˈˌ→↓↑ "
_extra = "ˌ%$"

symbols = [_pad] + list(_punctuation) + list(_letters) + list(_extra)

SPACE_ID = symbols.index(" ")
