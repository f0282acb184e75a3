"""Unit tests for the pure-Python oracle matcher (SURVEY.md §5.1).

Pin the reference semantics from ontology_manager.py including quirks
Q1-Q8 (SURVEY.md Appendix A) so "byte-identical" is well-defined.
"""

import pytest

from kawa_spark.lexicon.matcher import KawaMatcher, TRANNUM
from kawa_spark.testgen import generate


def mk(word2ner=None, lang="en", **kw):
    return KawaMatcher(lang, word2ner=word2ner, **kw)


class TestCanonicalWord:
    def test_basic_splice_and_strip(self):
        m = mk()
        word, arr = m.canonical_word("  Barack Obama! ")
        assert word == "Barack_Obama"
        assert arr == ["Barack", "Obama"]

    def test_leading_stopword_stripped_case_sensitive(self):
        m = mk()
        # lowercase stopword stripped; capitalized survives (reference
        # compares pre-lowercase tokens against lowercase stopwords)
        assert m.canonical_word("the hague")[0] == "hague"
        assert m.canonical_word("The Hague")[0] == "The_Hague"

    def test_all_stopwords_returns_orig(self):
        m = mk()
        word, arr = m.canonical_word("the of and")
        assert word == "the_of_and"

    def test_double_connector_collapse(self):
        m = mk()
        assert m.canonical_word("x__y  z")[0] == "x_y_z"


class TestShingles:
    def test_short_word_passthrough(self):
        m = mk()
        assert m._shingles(["Bob"]) == [["bob"]]

    def test_truncation_and_star_suffix(self):
        m = mk()
        shingles = m._shingles(["barack", "obama"])
        assert ["bar", "oba"] in shingles
        assert ["bar", "*ma"] in shingles

    def test_long_compound_two_variants_only(self):
        m = mk()
        # >compound_word_step: first-2+last and first+last-2; the starred
        # variants collapse onto the truncated ones (reference order of ops)
        shingles = m._shingles(["alpha", "beta", "gamma", "delta", "epsilon"])
        assert shingles == [["alp", "bet", "eps"], ["alp", "del", "eps"]]

    def test_cutoff_respected(self):
        m = mk()
        shingles = m._shingles(["barack", "obama"], cutoff=30)
        assert shingles == [["barack", "obama"]]


class TestLexiconBuild:
    def test_single_word_lookup(self):
        m = mk([["Acme", "ORG"]])
        assert m.in_lexicon("Acme")[1] == "ORG"
        assert m.in_lexicon("acme", check_person_org_gpe_caps=False)[1] == "ORG"

    def test_compound_lookup(self):
        m = mk([["Barack Obama", "PUBLIC_FIGURE"]])
        assert m.in_lexicon("Barack Obama")[1] == "PUBLIC_FIGURE"

    def test_caps_gate_person(self):
        m = mk([["Barack Obama", "PERSON"]])
        assert m.in_lexicon("barack obama")[1] is None  # Q5
        assert m.in_lexicon("barack obama", check_person_org_gpe_caps=False)[1] == "PERSON"

    def test_digit_folding_lookup_only(self):
        m = mk([["Area 51", "LOC"]])
        # lookup key digit-folded: any digits match (Q8)
        assert m.in_lexicon("Area 99")[1] == "LOC"

    def test_conflicting_labels_resolved_by_cascade(self):
        # same 3-char prefix pattern, different labels -> deeper levels or
        # the exact level must still label both correctly
        w2n = [
            ["Paris", "GPE"],
            ["Parish Council", "ORG"],
            ["Parker", "PERSON"],
            ["Parkway", "LOC"],
        ]
        m = mk([list(r) for r in w2n])
        for word, label in w2n:
            assert m.in_lexicon(word, check_person_org_gpe_caps=False)[1] == label, word

    def test_build_deterministic(self):
        corpus = generate(n_docs=10, n_entities=24)
        m1 = mk([list(r) for r in corpus.word2ner])
        m2 = mk([list(r) for r in corpus.word2ner])
        assert m1.ontology == m2.ontology


class TestDetect:
    def lex(self):
        return [
            ["Barack Obama", "PUBLIC_FIGURE"],
            ["Acme", "ORG"],
            ["New York", "GPE"],
            ["I.B.M.", "ORG"],
        ]

    def test_simple_detection_and_splice(self):
        m = mk(self.lex())
        out = m.tokenize("we met Barack Obama in town")
        assert out["text"] == "we met Barack_Obama in town"
        spans = list(out["chunk2ner"].items())
        assert spans[0][0][0] == "Barack_Obama"
        assert spans[0][1] == "PUBLIC_FIGURE"
        start = spans[0][0][1]
        assert "we met Barack Obama"[start:].startswith("Barack")

    def test_q1_last_token_never_matches(self):
        m = mk(self.lex())
        out = m.tokenize("the office of Acme")
        assert out["chunk2ner"] == {}  # Acme is final token -> untouched
        assert out["text"] == "the office of Acme"

    def test_q2_offsets_assume_single_space(self):
        m = mk(self.lex())
        text = "we met  Barack Obama in town"  # double space drifts offsets
        out = m.tokenize(text)
        # detection still fires; splice happens at drifted offsets
        assert "Barack_Obama" in out["text"]

    def test_stopword_start_never_matches(self):
        m = mk([["the hague", "GPE"]])
        out = m.tokenize("see the hague now")
        assert out["chunk2ner"] == {}

    def test_abbreviation_dot_q6(self):
        # the dot is stripped from the candidate window, matched against
        # "acme co", then restored because the last token is a 2-3 char
        # dot-terminated abbreviation (ontology_manager.py:709-712)
        m = mk([["Acme Co", "ORG"]])
        out = m.tokenize("visit Acme Co. today")
        chunks = [k[0] for k in out["chunk2ner"]]
        assert chunks == ["Acme_Co."]

    def test_greedy_longest_match(self):
        m = mk([["New York", "GPE"], ["New York City", "GPE"]])
        out = m.tokenize("visit New York City today")
        chunks = [k[0] for k in out["chunk2ner"]]
        assert chunks == ["New_York_City"]

    def test_detect_is_pure(self):
        m = mk(self.lex())
        text = "we met Barack Obama in town"
        assert m.tokenize(text) == m.tokenize(text)


class TestCJK:
    def test_cjk_doc_detection(self):
        m = KawaMatcher("zh", word2ner=[["北京大学", "ORG"]])
        out = m.tokenize("我 去 北京大学 上学 了")
        assert any("北" in k[0] for k in out["chunk2ner"]), out

    def test_cjk_word_canonical(self):
        m = KawaMatcher("zh")
        word, arr = m.canonical_word("北京大学")
        assert word == "北_京_大_学"


class TestOracleOnCorpus:
    def test_extraction_finds_planted_entities(self):
        corpus = generate(n_docs=40, n_entities=24)
        matchers = {}
        found = 0
        total_docs = 0
        for doc in corpus.documents:
            lang = doc["lang"]
            if lang not in matchers:
                matchers[lang] = KawaMatcher(
                    lang, word2ner=[list(r) for r in corpus.word2ner]
                )
            out = matchers[lang].tokenize(doc["text"])
            total_docs += 1
            for (chunk, _s, _e), _label in out["chunk2ner"].items():
                surface = chunk.replace("_", " ")
                if surface in corpus.truth or chunk in corpus.truth:
                    found += 1
        assert total_docs == 40
        assert found > 20, f"too few planted mentions recovered: {found}"


class TestPersistence:
    """S5: save/load the BUILT cascade (ontology_manager.py:176-229)."""

    def test_roundtrip_identical_ontology_and_probes(self, tmp_path):
        corpus = generate(n_docs=10, n_entities=40, seed=3)
        m = mk([list(r) for r in corpus.word2ner])
        path = str(tmp_path / "lexicon.json.gz")
        m.save(path)
        m2 = KawaMatcher.load(path)
        assert m2.ontology == m.ontology
        assert m2.connector == m.connector
        # probe parity on every seed word + some non-words
        for rec in corpus.word2ner:
            assert m2.in_lexicon(rec[0]) == m.in_lexicon(rec[0])
        for w in ("zzz_unknown", "the", "Barack Obama"):
            assert m2.in_lexicon(w) == m.in_lexicon(w)

    def test_tokenize_byte_identity_after_load(self, tmp_path):
        corpus = generate(n_docs=8, n_entities=30, seed=5)
        m = mk([list(r) for r in corpus.word2ner])
        path = str(tmp_path / "lex.json.gz")
        m.save(path)
        m2 = KawaMatcher.load(path)
        for doc in corpus.documents:
            a, b = m.tokenize(doc["text"]), m2.tokenize(doc["text"])
            assert a["text"] == b["text"]
            assert a["chunk2ner"] == b["chunk2ner"]

    def test_load_rejects_foreign_file(self, tmp_path):
        p = tmp_path / "x.json"
        p.write_text('{"something": 1}')
        with pytest.raises(ValueError):
            KawaMatcher.load(str(p))


class TestTargetLangLexicon:
    """J5: the per-language override lexicon is probed FIRST
    (ontology_manager.py:556-563)."""

    def test_override_beats_cascade(self):
        m = mk([["acme_corp", "ORG"], ["rivertown", "GPE"]])
        assert m.in_lexicon("Acme Corp")[1] == "ORG"
        m.set_target_lang_lexicon({"Acme Corp": "PRODUCT"})
        assert m.in_lexicon("Acme Corp")[1] == "PRODUCT"
        # untouched words still resolve through the cascade
        assert m.in_lexicon("Rivertown")[1] == "GPE"

    def test_digit_folded_probe(self):
        m = mk()
        m.set_target_lang_lexicon({"area 51": "LOCATION"})
        # the folded form (digit->1) is probed as word0
        assert m.in_lexicon("area 51")[1] == "LOCATION"

    def test_survives_save_load(self, tmp_path):
        m = mk([["acme_corp", "ORG"]])
        m.set_target_lang_lexicon({"acme corp": "PRODUCT"})
        path = str(tmp_path / "l.json.gz")
        m.save(path)
        m2 = KawaMatcher.load(path)
        assert m2.in_lexicon("acme corp")[1] == "PRODUCT"


class TestExactLevelCacheInvalidation:
    def test_probe_after_build_sees_exact_corrections(self):
        """The depth-1 exact level mutates the ontology after build
        probes populated the memo; the memo must not serve stale
        pre-correction labels (round-1 advice)."""
        # two records that collide on shingles with conflicting labels
        # force requeue down to the exact level
        w2n = [
            ["blue_falcon", "ORG"],
            ["blue_falcons", "PRODUCT"],
            ["blue_falconx", "EVENT"],
        ]
        m = mk([list(r) for r in w2n])
        for word, label, *_ in w2n:
            got = m.in_lexicon(word, check_person_org_gpe_caps=False)[1]
            assert got == label, (word, got, label)


class TestCollapseConsecutiveNer:
    """W3: adjacent same-label mentions merge into one span
    (reference tokenize collapse, ontology_manager.py:759-777)."""

    def test_adjacent_same_label_merge(self):
        m = mk([["alpha", "PRODUCT"], ["beta", "PRODUCT"], ["gamma", "EVENT"]])
        out = m.tokenize(
            "alpha beta gamma tail", collapse_consecutive_ner={"PRODUCT"}
        )
        assert out["chunk2ner"] == {
            ("alpha_beta", 0, 10): "PRODUCT",  # space joined by connector
            ("gamma", 11, 16): "EVENT",
        }

    def test_no_collapse_without_flag(self):
        m = mk([["alpha", "PRODUCT"], ["beta", "PRODUCT"]])
        out = m.tokenize("alpha beta tail")
        assert ("alpha", 0, 5) in out["chunk2ner"]
        assert ("beta", 6, 10) in out["chunk2ner"]

    def test_different_labels_not_merged(self):
        m = mk([["alpha", "PRODUCT"], ["gamma", "EVENT"]])
        out = m.tokenize(
            "alpha gamma tail", collapse_consecutive_ner={"PRODUCT", "EVENT"}
        )
        assert len(out["chunk2ner"]) == 2

    def test_label_not_in_collapse_set_kept_separate(self):
        m = mk([["alpha", "PRODUCT"], ["beta", "PRODUCT"]])
        out = m.tokenize(
            "alpha beta tail", collapse_consecutive_ner={"EVENT"}
        )
        assert len(out["chunk2ner"]) == 2
