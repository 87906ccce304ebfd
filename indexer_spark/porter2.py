"""Snowball "English" (Porter2) stemmer — pure Python, from the public spec.

The reference stems alphabetic tokens with rust-stemmers'
``Algorithm::English`` (/root/reference/src/lexer.rs:93-96), which is the
Snowball-generated English ("Porter2") stemmer. No stemmer package exists
in this environment, so the algorithm is implemented here directly from the
published specification (snowballstem.org/algorithms/english/stemmer.html).

The reference constructs a fresh stemmer per token (a profiled hot spot,
SURVEY.md §6); we instead memoize stems per unique token (`stem_cached`),
which under a Zipfian vocabulary makes stemming O(unique tokens), not
O(total tokens).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # 'Y' (marked consonant-y) is NOT a vowel
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# Full-word exceptional forms (spec "exception1").
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# Words left invariant immediately after step 1a.
_EXCEPTIONS_1A = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

# (suffix, replacement) tables, ordered longest-first: the LONGEST matching
# suffix is selected and then its condition tested — no backtracking to a
# shorter suffix (this is what keeps "argument" from losing "ent").
_STEP2 = (
    ("ational", "ate"), ("ization", "ize"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("lessli", "less"), ("biliti", "ble"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"),
    ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"),
    ("li", ""),
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ness", ""),
    ("ful", ""),
)

_STEP4 = (
    ("ement", ""),
    ("ance", ""), ("ence", ""), ("able", ""), ("ible", ""), ("ment", ""),
    ("ant", ""), ("ent", ""), ("ism", ""), ("ate", ""), ("iti", ""),
    ("ous", ""), ("ive", ""), ("ize", ""), ("ion", ""),
    ("al", ""), ("er", ""), ("ic", ""),
)


def _r1_of(w: str) -> int:
    """Start index of R1: after the first non-vowel following a vowel.

    Special prefixes gener/commun/arsen pin R1 to the remainder (spec).
    """
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            return len(p)
    for i in range(len(w) - 1):
        if w[i] in _VOWELS and w[i + 1] not in _VOWELS:
            return i + 2
    return len(w)


def _r2_of(w: str, r1: int) -> int:
    """Start index of R2: R1-rule applied again inside R1."""
    for i in range(r1, len(w) - 1):
        if w[i] in _VOWELS and w[i + 1] not in _VOWELS:
            return i + 2
    return len(w)


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        # a vowel at the beginning of the word followed by a non-vowel
        return w[0] in _VOWELS and w[1] not in _VOWELS
    if n >= 3:
        # non-vowel, vowel, non-vowel(not w/x/Y)
        return (
            w[n - 3] not in _VOWELS
            and w[n - 2] in _VOWELS
            and w[n - 1] not in _VOWELS
            and w[n - 1] not in "wxY"
        )
    return False


def _is_short_word(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def stem(word: str) -> str:
    """Stem one (already lowercased) token. Non-letters are consonants."""
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]
    if len(word) <= 2:
        return word

    w = word
    if w.startswith("'"):
        w = w[1:]

    # Prelude: mark consonant-y as 'Y' (initial y, or y after a vowel),
    # left to right against the evolving string.
    if "y" in w:
        chars = list(w)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _VOWELS:
                chars[i] = "Y"
        w = "".join(chars)

    r1 = _r1_of(w)
    r2 = _r2_of(w, r1)

    # Step 0: longest of  '   's   's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a (longest match)
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        # replace by i if preceded by more than one letter, else by ie
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding part contains a vowel NOT immediately
        # before the s (gas/this keep it; gaps/kiwis lose it)
        if any(w[i] in _VOWELS for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w

    # Step 1b (longest match)
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            if suf in ("eed", "eedly"):
                if len(w) - len(suf) >= r1:
                    w = w[: -len(suf)] + "ee"
            else:
                stem_part = w[: -len(suf)]
                if any(c in _VOWELS for c in stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short_word(w, r1):
                        w += "e"
            break

    # Step 1c: y/Y -> i if preceded by a non-vowel which isn't the first char
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    # Step 2 (condition: suffix in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) >= 4 and w[-4] == "l":
                        w = w[:-1]  # ogi -> og
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDINGS:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3 (condition: suffix in R1; 'ative' additionally needs R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (condition: suffix in R2; 'ion' additionally needs s/t before)
    for suf, _rep in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        pos = len(w) - 1
        if pos >= r2 or (pos >= r1 and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l"):
        pos = len(w) - 1
        if pos >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    # Postlude
    if "Y" in w:
        w = w.replace("Y", "y")
    return w


_STEM_CACHE: dict[str, str] = {}


def stem_cached(token: str) -> str:
    """Memoized `stem` — the Zipf head dominates, so hit rate is ~99%."""
    s = _STEM_CACHE.get(token)
    if s is None:
        s = stem(token)
        _STEM_CACHE[token] = s
    return s
