"""Porter stemmer — from-scratch, two modes.

This is METEOR's stage-2 matcher (the reference's nltk meteor_score uses
PorterStemmer for its stem-alignment stage, markdown_text_evaluator.py
:230). Implemented directly from the published sources; no external
corpora needed.

  mode="original": M.F. Porter, "An algorithm for suffix stripping",
    Program 14(3), 1980 — the published rule tables verbatim.
  mode="nltk" (default, matching the reference): nltk's PorterStemmer
    runs in NLTK_EXTENSIONS mode, which intentionally departs from the
    1980 paper. The deviations, mirrored from the public nltk source
    (nltk/stem/porter.py): an irregular-forms pool (sky/dying/news/...),
    'ies'->'ie' and 'ied'->'ie' for 4-letter words ('i' otherwise),
    step-1c y->i only after a consonant (not merely when the stem has a
    vowel), 'bli'->'ble' in place of 'abli'->'able' plus 'fulli'->'ful'
    and the alli-first re-application in step 2, and the 2-letter
    vowel-consonant CVC extension.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# NLTK_EXTENSIONS irregular-forms pool (nltk/stem/porter.py): these words
# bypass the rules entirely
_POOL: dict[str, str] = {}
for _stem, _words in {
    "sky": ["sky", "skies"], "die": ["dying"], "lie": ["lying"],
    "tie": ["tying"], "news": ["news"], "inning": ["innings", "inning"],
    "outing": ["outings", "outing"], "canning": ["cannings", "canning"],
    "howe": ["howe"], "proceed": ["proceed"], "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for _w in _words:
        _POOL[_w] = _stem


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel->consonant transitions."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i < n:
            m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str, nltk: bool = False) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w, x, y.
    NLTK extension: 2-letter vowel-consonant words also qualify."""
    if nltk and len(w) == 2:
        return not _is_cons(w, 0) and _is_cons(w, 1)
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


# (suffix, replacement) tables; within a step the LONGEST matching suffix
# is selected, then the measure condition is tested on its stem — no
# fallback to shorter suffixes (Porter 1980 §3).
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(w: str, rules) -> tuple[str, str] | None:
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def _step2(w: str, nltk: bool) -> str:
    if nltk and w.endswith("alli") and _measure(w[:-4]) > 0:
        # NLTK applies ALLI -> AL first and re-runs step 2 on the result
        return _step2(w[:-4] + "al", nltk)
    if nltk and w.endswith("logi") and _measure(w[:-3]) > 0:
        # NLTK's special LOGI -> LOG rule measures word[:-3] (not the
        # stem before the 4-char suffix) and fires before the rule table
        return w[:-3] + "og"
    rules = list(_STEP2)
    if nltk:
        rules = [("bli", "ble") if r == ("abli", "able") else r
                 for r in rules]
        rules.append(("fulli", "ful"))
    r = _longest_rule(w, rules)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        return w[: len(w) - len(r[0])] + r[1]
    return w


def porter_stem(word: str, mode: str = "nltk") -> str:
    nltk = mode == "nltk"
    w = word.lower()
    if nltk and w in _POOL:
        return _POOL[w]
    if len(w) <= 2:
        return w

    # Step 1a
    if nltk and w.endswith("ies") and len(w) == 4:
        w = w[:-3] + "ie"
    elif w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if nltk and w.endswith("ied"):
        w = w[:-3] + ("ie" if len(w) == 4 else "i")
    elif w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w, nltk):
            w += "e"

    # Step 1c (NLTK: y -> i only after a consonant, stem longer than 1)
    if w.endswith("y"):
        if nltk:
            if len(w) > 2 and _is_cons(w, len(w) - 2):
                w = w[:-1] + "i"
        elif _has_vowel(w[:-1]):
            w = w[:-1] + "i"

    # Step 2
    w = _step2(w, nltk)

    # Step 3
    r = _longest_rule(w, _STEP3)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        w = w[: len(w) - len(r[0])] + r[1]

    # Step 4
    r = _longest_rule(w, [(s, "") for s in _STEP4])
    if r:
        stem = w[: len(w) - len(r[0])]
        if _measure(stem) > 1:
            if r[0] != "ion" or (stem and stem[-1] in "st"):
                w = stem

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1], nltk)):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
