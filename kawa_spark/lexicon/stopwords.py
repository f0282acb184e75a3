"""Per-language stopword sets.

The reference ships ~170 languages of stopwords
(/root/reference/ontology/stopwords.py:5); its data blob is proprietary-
sized, so we carry compact standard lists for the languages the synthetic
corpus exercises. Semantics mirror the reference's lookup
(ontology_manager.py:111): per-language set when a target language is
given, the union of all sets otherwise.
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("""a an the and or but if then else of in on at by for with to from as is are was
        were be been being do does did have has had it its this that these those he she they we you i
        not no so such there here when where which who whom what while will would can could should may
        might must about into over under again very own same than too s t just don now""".split()),
    "de": frozenset("""der die das ein eine einer eines dem den und oder aber wenn dann von im in auf
        an bei für mit zu aus als ist sind war waren sein es sie er wir ihr ich nicht kein so da wo
        wer was wie auch nur noch schon über unter um nach vor durch""".split()),
    "es": frozenset("""el la los las un una unos unas y o pero si de del en a por para con sin sobre
        es son era eran ser esta este estos estas eso ese que quien cual como donde cuando no ni ya
        muy mas menos tambien entre hasta desde""".split()),
    "fr": frozenset("""le la les un une des du de et ou mais si dans sur a au aux par pour avec sans
        sous est sont etait ce cette ces cela que qui quoi comme ou quand ne pas plus moins tres
        aussi entre vers chez""".split()),
    "zh": frozenset("的 了 和 是 在 我 有 他 这 中 大 来 上 国 个 到 说 们 为 子 与 也 就 不 人 都 一 一个 没有 我们 你们 他们".split()),
    "ja": frozenset("の に は を た が で て と し れ さ ある いる も する から な こと として".split()),
}

ALL_STOPWORDS: frozenset[str] = frozenset().union(*STOPWORDS.values())


def stopwords_for(lang: str | None) -> set[str]:
    """Per-language stopwords; union of all languages when lang is empty
    (mirrors ontology_manager.py:111)."""
    if lang:
        return set(STOPWORDS.get(lang, ()))
    return set(ALL_STOPWORDS)
