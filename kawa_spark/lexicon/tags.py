"""Label hierarchy (upper ontology) and label rename map.

Semantics mirror the reference's label tables
(/root/reference/ontology/default_onto_tags.py:1,21-68): each label maps
to its ancestry chain (itself first), and a small rename map folds
variant labels. We derive the ancestry chains from a parent-edge map
instead of writing them out long-hand; the resulting dict is identical
in content and iteration order to the reference's.
"""

from __future__ import annotations

# Insertion order matters only for the stable per-label index; it mirrors
# the reference table's order.
_LABELS: list[str] = [
    "PERSON", "PUBLIC_FIGURE", "TITLE", "PERSON_PRONOUN",
    "LOC", "GPE", "FAC", "ADDRESS",
    "ORG", "NORP", "SOC_ECO_CLASS", "RACE", "POLITICAL_PARTY", "UNION",
    "RELIGION", "RELIGION_MEMBER", "POLITICAL_PARTY_MEMBER", "UNION_MEMBER",
    "LANGUAGE",
    "AGE", "DISEASE", "MEDICAL_SYMPTOM", "PRODUCT", "USER", "URL", "ID",
    "LICENSE_PLATE", "PHONE", "IP_ADDRESS",
    "ANIMAL", "FOOD", "PLANT", "GENDER", "JOB", "EVENT",
    "BIO_CHEM_ENTITY", "MEDICAL_THERAPY", "SUBSTANCE", "CHEMICAL_SUBSTANCE",
    "LAW", "ANAT", "QUANTITY", "DATE", "TIME", "MISC", "OTHER",
]

_PARENT: dict[str, str] = {
    "PUBLIC_FIGURE": "PERSON",
    "TITLE": "PERSON",
    "PERSON_PRONOUN": "PERSON",
    "GPE": "LOC",
    "FAC": "LOC",
    "ADDRESS": "LOC",
    "NORP": "ORG",
    "SOC_ECO_CLASS": "NORP",
    "RACE": "NORP",
    "POLITICAL_PARTY": "NORP",
    "UNION": "NORP",
    "RELIGION": "NORP",
    "RELIGION_MEMBER": "NORP",
    "POLITICAL_PARTY_MEMBER": "NORP",
    "UNION_MEMBER": "NORP",
    "LANGUAGE": "NORP",
    "MEDICAL_SYMPTOM": "DISEASE",
    "CHEMICAL_SUBSTANCE": "SUBSTANCE",
    "LICENSE_PLATE": "ID",
    "PHONE": "ID",
    "IP_ADDRESS": "ID",
}


def _ancestry(label: str) -> list[str]:
    chain = [label]
    while label in _PARENT:
        label = _PARENT[label]
        chain.append(label)
    return chain


DEFAULT_UPPER_ONTOLOGY: dict[str, list[str]] = {l: _ancestry(l) for l in _LABELS}

DEFAULT_LABEL2LABEL: dict[str, str] = {"LOCATION": "LOC"}


def upper_ontology_with_index(upper_ontology: dict | None = None) -> dict:
    """Key-uppercased map label -> [ancestry, stable_index]
    (reference load_upper_ontology, ontology_manager.py:147-159)."""
    if upper_ontology is None:
        upper_ontology = DEFAULT_UPPER_ONTOLOGY
    out: dict[str, list] = {}
    for key, val in upper_ontology.items():
        key = key.upper()
        if key not in out:
            out[key] = [val, len(out)]
        else:
            out[key] = [val, out[key][1]]
    return out
