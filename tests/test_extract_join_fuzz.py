"""Property-based pins for the join-extraction fallback
(operators/extract_join.py) — pure-Python, no Spark session. Two
properties carry the fallback's correctness argument:

1. **Probe faithfulness**: for ARBITRARY words (adversarial casing,
   punctuation, digits, stopwords, multi-token, connector collisions),
   the min-prio hit of the flattened-table lookup equals the real
   matcher's ``in_lexicon`` — the contract the Spark equi-join
   implements.
2. **Candidate superset**: every word the REAL sequential detector
   sends to ``in_lexicon`` on an arbitrary text appears in the
   fallback's candidate-window enumeration (instrumented matcher) —
   so no probe the broadcast path makes can be missing from the join.

Together with tests/test_extract_join.py's byte-identity checks these
pin the full decomposition: candidates ⊇ probes, probes resolve
identically, replay is the shared implementation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kawa_spark.config import PipelineConfig
from kawa_spark.lexicon.matcher import TRANNUM, KawaMatcher
from kawa_spark.operators.extract_join import (
    _probe_matcher,
    _probe_sequence,
    flatten_lexicon,
)
from kawa_spark.testgen import generate

_SETTINGS = settings(max_examples=200, deadline=None, derandomize=True)

_CORPUS = generate(n_docs=20, n_entities=16, seed=13)
_W2N = [list(r) for r in _CORPUS.word2ner]
_LEX_WORDS = [r[0] for r in _W2N]


def _matcher(lang: str) -> KawaMatcher:
    return KawaMatcher(lang, word2ner=[list(r) for r in _W2N])


_M_BY_LANG: dict[str, KawaMatcher] = {}
_TABLE_BY_LANG: dict[str, tuple] = {}


def _fixtures(lang: str):
    if lang not in _M_BY_LANG:
        m = _matcher(lang)
        rows, bounds, n_levels = flatten_lexicon(m, lang)
        table = {}
        for _, level, prefix, bucket, pattern, label, person in rows:
            table.setdefault((level, prefix, bucket, pattern), (label, person))
        _M_BY_LANG[lang] = m
        _TABLE_BY_LANG[lang] = (table, bounds, n_levels)
    return _M_BY_LANG[lang], *_TABLE_BY_LANG[lang]


def _join_probe(lang: str, word: str):
    m, table, _, n_levels = _fixtures(lang)
    pm = _probe_matcher(lang, PipelineConfig())
    best = None
    got = None
    for prio, level, prefix, bucket, pattern, caps_ok in _probe_sequence(
        pm, word, n_levels
    ):
        hit = table.get((level, prefix, bucket, pattern))
        if hit is None:
            continue
        label, person = hit
        if not caps_ok and person:
            continue
        if best is None or prio < best:
            best, got = prio, label
    return got


_word_piece = st.one_of(
    st.sampled_from(_LEX_WORDS),
    st.sampled_from([w.upper() for w in _LEX_WORDS[:12]]),
    st.sampled_from([w.lower() for w in _LEX_WORDS[:12]]),
    st.text(
        alphabet="abcdefgABCDEFG0123456789_-.,'\" ",
        min_size=0,
        max_size=12,
    ),
    st.sampled_from(["the", "The", "of", "", " ", "  ", "...", "123"]),
)
_word = st.builds(lambda parts: " ".join(parts),
                  st.lists(_word_piece, min_size=1, max_size=3))


@given(word=_word, lang=st.sampled_from(["en", "fr", ""]))
@_SETTINGS
def test_probe_join_matches_in_lexicon(word, lang):
    m, _, _, _ = _fixtures(lang)
    _, want = m.in_lexicon(word, suppress_cjk_tokenize=True)
    assert _join_probe(lang, word) == want


_text = st.builds(
    lambda parts: " ".join(parts),
    st.lists(_word_piece, min_size=0, max_size=12),
)


@given(text=_text, lang=st.sampled_from(["en", "fr"]))
@_SETTINGS
def test_candidates_superset_of_real_probes(text, lang):
    """Instrument the real matcher to record every word detect() sends
    to in_lexicon; the fallback's candidate enumeration must contain
    all of them."""
    import re

    text = re.sub(r"\s+", " ", text.strip())  # the byte-identity domain
    m, _, bounds, _ = _fixtures(lang)
    probed: list[str] = []
    orig = KawaMatcher.in_lexicon

    def spy(self, word, **kw):
        probed.append(word)
        return orig(self, word, **kw)

    try:
        KawaMatcher.in_lexicon = spy
        m.detect(text)
    finally:
        KawaMatcher.in_lexicon = orig

    # candidate enumeration: the python core of candidate_windows
    pm = _probe_matcher(lang, PipelineConfig())
    cands: set[str] = set()
    sent = text.strip().split()
    len_sent = len(sent)
    cutoff = pm.word_shingle_cutoff
    for i in range(len_sent - 1):
        start_word = sent[i].lower().lstrip(pm.strip_chars)
        if start_word in pm.stopwords:
            continue
        start_word = start_word.translate(TRANNUM).split(pm.connector)[0]
        if len(start_word) > cutoff:
            start_word = start_word[:cutoff]
        lo, hi = bounds.get(start_word, (-1, 100000))
        if lo > 0:
            for j in range(lo - 1, hi - 2, -1):
                if len_sent - i > j:
                    word_arr = sent[i : i + 1 + j]
                    if not pm._has_nonstopword(word_arr):
                        break
                    if word_arr[-1].lower() in pm.stopwords:
                        continue
                    cands.add(" ".join(word_arr).strip(pm.strip_chars))

    missing = [w for w in probed if w not in cands]
    assert not missing, (text, missing)
