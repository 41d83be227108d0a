"""Porter stemmer, implemented from the published specification.

Source of truth: M.F. Porter, "An algorithm for suffix stripping", Program
14(3) 1980, pp. 130-137 — the public algorithm description (steps 1a-5b,
the m() measure, and the *S/*v*/*d/*o conditions). This file is a clean-room
implementation of that spec; golden vectors in tests/test_porter.py are the
examples printed in the paper itself.

Why it exists: the reference engine analyzes English text with
StandardTokenizer -> EnglishPossessiveFilter -> LowerCase -> Stop -> KStEM
(hw5/QryEval/EnglishAnalyzerConfigurable.java:137-160). Krovetz (KSTEM) is a
dictionary-driven stemmer whose lexicon isn't public/redistributable here, so
the configurable English analyzer in this repo (tokenize.ENGLISH_TOKENIZER)
substitutes the fully-public Porter algorithm and documents the departure —
what matters for rank identity is that documents and queries share the exact
same pipeline, which they do by construction (one Tokenizer object drives
both sides).

Two deliberate choices, both documented behaviors of Porter's own maintained
implementation (and of common reimplementations), noted so the golden tests
are unambiguous:

- words of length <= 2 are returned unchanged (the 1980 paper's examples
  never shrink below length 2; the canonical C implementation guards
  `if (k <= k0+1) return;`);
- the two maintained-version revisions are NOT applied (we keep the paper's
  `(m>0) ABLI -> ABLE` and do not add `(m>0) LOGI -> LOG`): this file follows
  the 1980 text exactly.

Performance: stemming is applied at the *vocabulary* level (once per distinct
term per chunk, after dictionary encoding — see index/persist.py), never per
token, so a pure-Python implementation costs O(|vocab|) and stays off the
hot path.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    """Spec §2: a consonant is a letter other than a,e,i,o,u and other than
    y preceded by a consonant ('y' in "toy" is a vowel; in "syzygy" the y's
    alternate)."""
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the spec's [C](VC)^m[V] decomposition: the number of VC runs."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_consonant(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y (spec step 1b)."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace_suffix(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If `word` ends with `suffix` and m(stem) > min_m-? — conditions vary,
    so this helper checks m(stem) > min_m only when min_m >= 0; returns the
    rewritten word or None when the rule does not fire."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if min_m >= 0 and not _measure(stem) > min_m:
        return None
    return stem + repl


# (suffix, replacement) tables, longest-match-first exactly as the spec lists
# them; within each step at most ONE rule fires (match on suffix, then test m).
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-2]
    if word.endswith("ss"):
        return word
    if word.endswith("s"):
        return word[:-1]
    return word


def step1b(word: str) -> str:
    if word.endswith("eed"):
        # longest match is EED: when its m-condition fails nothing else in
        # the step may fire
        return word[:-1] if _measure(word[:-3]) > 0 else word
    fired = False
    if word.endswith("ed") and _contains_vowel(word[:-2]):
        word, fired = word[:-2], True
    elif word.endswith("ing") and _contains_vowel(word[:-3]):
        word, fired = word[:-3], True
    if fired:
        if word.endswith(("at", "bl", "iz")):
            word = word + "e"
        elif _ends_double_consonant(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word = word + "e"
    return word


def step1c(word: str) -> str:
    if word.endswith("y") and _contains_vowel(word[:-1]):
        return word[:-1] + "i"
    return word


def _table_step(word: str, table, min_m: int = 0) -> str:
    """Longest-suffix match, then the m-condition: if the matched rule's
    condition fails, NO rule in the step fires (the spec's 'longest S1')."""
    for suf, repl in sorted(table, key=lambda p: -len(p[0])):
        if word.endswith(suf):
            new = _replace_suffix(word, suf, repl, min_m)
            return new if new is not None else word
    return word


def step2(word: str) -> str:
    return _table_step(word, _STEP2)


def step3(word: str) -> str:
    return _table_step(word, _STEP3)


def step4(word: str) -> str:
    for suf in sorted(_STEP4, key=len, reverse=True):
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem[-1:] in ("s", "t")):
                return stem
            return word
    return word


def step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return word


def step5b(word: str) -> str:
    if _measure(word) > 1 and _ends_double_consonant(word) and word.endswith("l"):
        return word[:-1]
    return word


_STEPS = (step1a, step1b, step1c, step2, step3, step4, step5a, step5b)


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the 1980 spec. Non-alphabetic input is
    returned unchanged (the analyzer only feeds it [a-z']+ tokens anyway)."""
    if len(word) <= 2 or not word.isalpha():
        return word
    for step in _STEPS:
        word = step(word)
    return word


@lru_cache(maxsize=65536)
def porter_stem_cached(word: str) -> str:
    """Memoized twin for driver-side query tokenization and the Python-loop
    fallback kernel; the vectorized kernel stems each distinct vocab string
    once per chunk and doesn't need the cache."""
    return porter_stem(word)
