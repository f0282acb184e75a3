"""Per-language data files (S6).

The reference keeps one ``{lang}.json`` per language with name lists,
gender/pronoun maps, religion maps, and per-language NER regexes,
loaded by ``load_target_lang_data`` (ontology_manager.py:231-243) and
written by the builder (ontology_builder.py:1052-1072). Here the same
artifact is a plain JSON (or .gz) file; on Spark the dict rides one
broadcast per language and feeds the matcher's target-language lexicon
(J5) and the regex-NER pass (P10).
"""

from __future__ import annotations

import gzip
import json
import os

KNOWN_KEYS = (
    "FIRST_NAME_MALE",
    "FIRST_NAME_FEMALE",
    "LAST_NAME",
    "binary_gender_swap",
    "en_pronoun2gender",
    "person2religion",
    "ner_regexes",
    "lexicon",  # word -> label overrides (installed as target_lang_lexicon)
)


def _opener(path: str):
    return gzip.open if path.endswith(".gz") else open


def load_lang_data(data_dir: str, lang: str) -> dict:
    """{lang}.json / {lang}.json.gz -> dict ({} when absent, like the
    reference's missing-file behavior)."""
    for name in (f"{lang}.json", f"{lang}.json.gz"):
        path = os.path.join(data_dir, name)
        if os.path.exists(path):
            with _opener(path)(path, "rt", encoding="utf8") as f:
                return json.load(f)
    return {}


def save_lang_data(data_dir: str, lang: str, data: dict, compress: bool = False) -> str:
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"{lang}.json" + (".gz" if compress else ""))
    with _opener(path)(path, "wt", encoding="utf8") as f:
        json.dump(data, f, indent=1, ensure_ascii=False)
    return path


def apply_lang_data(matcher, data: dict) -> None:
    """Install the per-language artifacts a matcher consumes: the
    ``lexicon`` key becomes the probed-first target-language lexicon
    (J5, ontology_manager.py:556-563)."""
    lex = data.get("lexicon")
    if lex:
        matcher.set_target_lang_lexicon(dict(lex))


def broadcast_lang_data(spark, data_dir: str, langs: list[str]):
    """One driver-side load, one broadcast: {lang: data dict}. Executors
    read it per process — the reference's per-manager json load, made
    cluster-shaped."""
    return spark.sparkContext.broadcast(
        {lang: load_lang_data(data_dir, lang) for lang in langs}
    )
