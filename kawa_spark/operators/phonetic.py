"""Phonetic + transliteration keys (F16) for candidate blocking.

The north star calls for "MinHash-LSH over character shingles plus
phonetic/transliteration keys on surface forms" (BASELINE.json:6).
Soundex is a Spark built-in (operators/blocking.py); this module adds:

* ``double_metaphone`` — clean-room implementation of the public
  Double Metaphone algorithm (L. Philips, 2000): primary + secondary
  codes, covering the major consonant rule groups. It is a practical
  subset — the full published rule table has hundreds of exceptional
  cases (proper-noun Slavic/Italian digraphs etc.); the subset keeps
  the property that matters for blocking: similar-sounding English
  spellings collide, and the secondary code catches the ambiguous
  CH/SCH/GN groups.
* ``latin_skeleton`` — transliteration to an ASCII skeleton: Unicode
  NFD accent strip plus a Cyrillic/Greek romanization table, so
  "Müller", "Mueller"-adjacent and "Мюллер" can share a key space.

Both run as Arrow-batched pandas UDFs (pure-Python per element, but
these feed BLOCKING keys — computed once per distinct surface form,
not per pair, so the per-row cost is O(surfaces) not O(pairs)).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

VOWELS = set("AEIOUY")


def _is_v(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def double_metaphone(word: str, max_len: int = 6) -> tuple[str, str]:
    """(primary, secondary) metaphone codes; secondary == primary when
    no ambiguous rule fired."""
    if not word:
        return "", ""
    s = "".join(
        c for c in unicodedata.normalize("NFD", word.upper())
        if unicodedata.category(c) != "Mn" and c.isalpha()
    )
    if not s:
        return "", ""
    p: list[str] = []  # primary
    q: list[str] = []  # secondary
    n = len(s)

    def add(a: str, b: str | None = None) -> None:
        p.append(a)
        q.append(a if b is None else b)

    i = 0
    # initial silent letters: GN, KN, PN, WR, PS
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X sounds like S
    if s[0] == "X":
        add("S")
        i = max(i, 1)
    elif s[0] in VOWELS:
        add("A")
        i = max(i, 1)

    while i < n and len(p) < max_len:
        c = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        nxt2 = s[i + 2] if i + 2 < n else ""
        if c in VOWELS:
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if nxt == "B" else 1
        elif c == "C":
            if nxt == "H":
                # CH: X (church) with K secondary (chemist/schism)
                if i == 0 or s[max(0, i - 1)] == "S":
                    add("K", "X")
                else:
                    add("X", "K")
                i += 2
            elif nxt == "C":
                add("K")
                i += 2
            elif nxt in ("I", "E", "Y"):
                if nxt == "I" and nxt2 in ("A", "O"):
                    add("X")  # -cia-, -cio-
                else:
                    add("S")
                i += 2
            elif nxt == "K":
                add("K")
                i += 2
            else:
                add("K")
                i += 1
        elif c == "D":
            if nxt == "G" and nxt2 in ("E", "I", "Y"):
                add("J")  # edge
                i += 3
            else:
                add("T")
                i += 2 if nxt in ("D", "T") else 1
        elif c == "F":
            add("F")
            i += 2 if nxt == "F" else 1
        elif c == "G":
            if nxt == "H":
                if i > 0 and not _is_v(s, i - 1):
                    add("K")
                elif i == 0:
                    add("K")
                # else silent (night, through)
                i += 2
            elif nxt == "N":
                add("K", "N")  # gnome-ish interiors vary
                i += 2
            elif nxt in ("E", "I", "Y"):
                add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if nxt == "G" else 1
        elif c == "H":
            # keep H only between vowel and vowel
            if _is_v(s, i - 1) and _is_v(s, i + 1):
                add("H")
            i += 1
        elif c == "J":
            add("J", "H")  # Jose/hallelujah ambiguity
            i += 2 if nxt == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if nxt == "K" else 1
        elif c == "L":
            add("L")
            i += 2 if nxt == "L" else 1
        elif c == "M":
            add("M")
            i += 2 if nxt == "M" else 1
        elif c == "N":
            add("N")
            i += 2 if nxt == "N" else 1
        elif c == "P":
            if nxt == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if nxt in ("P", "B") else 1
        elif c == "Q":
            add("K")
            i += 2 if nxt == "Q" else 1
        elif c == "R":
            add("R")
            i += 2 if nxt == "R" else 1
        elif c == "S":
            if nxt == "H":
                add("X")
                i += 2
            elif nxt == "I" and nxt2 in ("O", "A"):
                add("S", "X")  # -sio-, -sia-
                i += 1
            elif nxt == "C" and nxt2 == "H":
                add("X", "SK")  # sch-
                i += 3
            else:
                add("S")
                i += 2 if nxt in ("S", "Z") else 1
        elif c == "T":
            if nxt == "H":
                add("0")  # theta
                i += 2
            elif nxt == "I" and nxt2 in ("O", "A"):
                add("X")  # -tio-, -tia-
                i += 1
            else:
                add("T")
                i += 2 if nxt in ("T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if nxt == "V" else 1
        elif c == "W":
            if _is_v(s, i + 1):
                add("W", "F")
            i += 1
        elif c == "X":
            add("KS")
            i += 1
        elif c == "Z":
            add("S")
            i += 2 if nxt == "Z" else 1
        else:
            i += 1
    return "".join(p)[:max_len], "".join(q)[:max_len]


# Cyrillic + Greek romanization (common single-letter mappings; digraph
# outputs are fine — this is a blocking key, not an orthography)
_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
}
_GRK = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "i",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}
_TRANSLIT = {**_CYR, **_GRK}


def latin_skeleton(word: str) -> str:
    """ASCII skeleton: NFD accent strip + Cyrillic/Greek romanization;
    anything still non-ASCII is dropped. Lowercase output."""
    out = []
    for ch in unicodedata.normalize("NFD", word.lower()):
        if unicodedata.category(ch) == "Mn":
            continue
        mapped = _TRANSLIT.get(ch)
        if mapped is not None:
            out.append(mapped)
        elif ord(ch) < 128:
            out.append(ch)
    return "".join(out)


@F.pandas_udf(StringType())
def dm_primary_udf(words: pd.Series) -> pd.Series:
    return pd.Series([double_metaphone(w or "")[0] for w in words])


@F.pandas_udf(StringType())
def dm_secondary_udf(words: pd.Series) -> pd.Series:
    return pd.Series([double_metaphone(w or "")[1] for w in words])


@F.pandas_udf(StringType())
def latin_skeleton_udf(words: pd.Series) -> pd.Series:
    return pd.Series([latin_skeleton(w or "") for w in words])
