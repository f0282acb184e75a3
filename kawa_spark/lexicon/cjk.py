"""CJK script detection and a deterministic subword segmenter.

``cjk_detect``/``lang_is_cjk`` mirror the reference's script checks
(/root/reference/ontology/cjk.py:3-22) using the same public Unicode
ranges and priority order.

The reference pre-tokenizes CJK text with the mt5 sentencepiece model
(ontology_manager.py:631-653). Transformers/mt5 are not available in this
environment, so we substitute a deterministic segmenter with the same
*shape* (sentencepiece-style "▁" word-start marker, CJK split to single
characters, non-CJK runs kept whole) — the re-join semantics around it
reproduce the reference exactly. Because the oracle and the Spark
extraction share this module, the byte-identity invariant is
well-defined.
"""

from __future__ import annotations

import re

MT5_UNDERSCORE = "▁"  # ▁ sentencepiece word-start marker

_RANGES: list[tuple[re.Pattern, str]] = [
    (re.compile("[一-鿿]"), "zh"),
    (re.compile("[가-힣]"), "ko"),
    (re.compile("[぀-ヿ]"), "ja"),
    (re.compile("[ก-๛]"), "th"),
    (re.compile("[ꦀ-꧟]"), "jv_tr"),
]

_CJK_CHAR = re.compile(
    "[一-鿿가-힣぀-ヿก-๛ꦀ-꧟]"
)

_CJK_LANGS = frozenset(
    {"zh", "zh-classical", "zh-min-nan", "zh-yue", "ko", "ja", "th", "jv_tr"}
)


def cjk_detect(text: str) -> str | None:
    for pat, lang in _RANGES:
        if pat.search(text):
            return lang
    return None


def lang_is_cjk(lang: str) -> bool:
    return lang in _CJK_LANGS


def fake_mt5_tokenize(text: str) -> list[str]:
    """Deterministic sentencepiece-shaped tokenizer: every whitespace
    token starts with ▁; CJK characters become single-char tokens;
    non-CJK runs stay whole."""
    out: list[str] = []
    for piece in text.split():
        first = True
        run = ""
        for ch in piece:
            if _CJK_CHAR.match(ch):
                if run:
                    out.append((MT5_UNDERSCORE if first else "") + run)
                    first = False
                    run = ""
                out.append((MT5_UNDERSCORE if first else "") + ch)
                first = False
            else:
                run += ch
        if run:
            out.append((MT5_UNDERSCORE if first else "") + run)
    return out


def cjk_tokenize_word(word: str, connector: str = "_") -> str:
    """Reference cjk_tokenize_word (ontology_manager.py:624-628)."""
    return (
        "_".join(fake_mt5_tokenize(word))
        .replace(MT5_UNDERSCORE, "_")
        .replace("__", "_")
        .replace("__", "_")
        .strip("_")
    )


def cjk_tokenize_text(text: str, strip_chars_set: set[str]) -> str:
    """Reference cjk_tokenize_text (ontology_manager.py:631-653): tokenize,
    re-join consecutive non-CJK subtokens, restore spaces at ▁ markers."""
    words = fake_mt5_tokenize(text.replace("_", " ").replace("  ", " ").strip())
    words2: list[str] = []
    for word in words:
        if not words2:
            words2.append(word)
            continue
        if not cjk_detect(word):
            if not cjk_detect(words2[-1]):
                if words2[-1] in strip_chars_set:
                    words2[-1] += " " + word
                else:
                    words2[-1] += word
                continue
        words2.append(word)
    return (
        " ".join(words2)
        .replace(MT5_UNDERSCORE, " ")
        .replace("  ", " ")
        .replace("  ", " ")
        .strip()
    )
