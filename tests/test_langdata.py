"""S6 per-language data files + S4 TSV sink."""

import pytest

from kawa_spark.lexicon.langdata import (
    apply_lang_data,
    broadcast_lang_data,
    load_lang_data,
    save_lang_data,
)
from kawa_spark.lexicon.matcher import KawaMatcher
from kawa_spark.lexicon_etl import read_tsv, write_tsv


class TestLangData:
    def test_roundtrip_plain_and_gz(self, tmp_path):
        data = {
            "FIRST_NAME_MALE": ["diego", "josé"],
            "binary_gender_swap": {"he": "she"},
            "lexicon": {"acme corp": "ORG"},
        }
        save_lang_data(str(tmp_path), "es", data)
        assert load_lang_data(str(tmp_path), "es") == data
        save_lang_data(str(tmp_path), "fr", data, compress=True)
        assert load_lang_data(str(tmp_path), "fr") == data

    def test_missing_lang_empty(self, tmp_path):
        assert load_lang_data(str(tmp_path), "zz") == {}

    def test_apply_installs_target_lexicon(self, tmp_path):
        m = KawaMatcher("en", word2ner=[["acme_corp", "PRODUCT"]])
        apply_lang_data(m, {"lexicon": {"acme corp": "ORG"}})
        # the lang-file lexicon wins over the cascade (J5 probe order)
        assert m.in_lexicon("acme corp")[1] == "ORG"

    def test_broadcast(self, spark, tmp_path):
        save_lang_data(str(tmp_path), "es", {"LAST_NAME": ["garcía"]})
        bc = broadcast_lang_data(spark, str(tmp_path), ["es", "zz"])
        assert bc.value["es"]["LAST_NAME"] == ["garcía"]
        assert bc.value["zz"] == {}
        bc.unpersist()


class TestTsvSink:
    def test_sorted_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("b", 2), ("a", 1), ("c", 3)], "entity string, n int"
        )
        path = str(tmp_path / "out_tsv")
        write_tsv(df, path, sort_cols=["entity"])
        back = read_tsv(spark, path, "entity string, n int")
        assert [(r.entity, r.n) for r in back.orderBy("entity").collect()] == [
            ("a", 1), ("b", 2), ("c", 3)
        ]


class TestBuiltMultilingualMaps:
    def test_build_write_load_apply_roundtrip(self, spark, tmp_path):
        """create_multilingual_map port: artifacts BUILT by the Spark job
        (not handwritten) round-trip through save/load_lang_data, and the
        deterministic semantics hold: derived langs carry pivot-group
        members, 'en' carries exactly the normalized input."""
        from kawa_spark.lexicon_etl import build_multilingual_lang_data

        # synonym graph: en 'man' <-> de 'mann', en 'woman' <-> de 'frau',
        # en 'priest' <-> fr 'pretre'; plus an en<->en row (ignored by the
        # pivot) and a high-degree word to exercise the degree cut.
        edges = spark.createDataFrame(
            [
                ("Synonym", "en", "man", "de", "mann"),
                ("Synonym", "en", "woman", "de", "frau"),
                ("Synonym", "en", "priest", "fr", "pretre"),
                ("Synonym", "en", "man", "en", "man"),
            ],
            "rel string, lang_a string, word_a string, lang_b string, word_b string",
        )
        gender_pairs = spark.createDataFrame(
            [("man", "woman")], "word string, swap string"
        )
        p2g = spark.createDataFrame(
            [("male", "man")], "item string, en_word string"
        )
        p2r = spark.createDataFrame(
            [("priest", "priest")], "item string, en_word string"
        )
        out = str(tmp_path / "langdata")
        paths = build_multilingual_lang_data(
            spark, edges, gender_pairs, p2g, p2r, out
        )
        assert paths
        from kawa_spark.lexicon.langdata import load_lang_data

        de = load_lang_data(out, "de")
        # de members of man-group swap to de members of woman-group
        assert de["binary_gender_swap"] == {"mann": "frau"}
        assert de["en_pronoun2gender"] == {"male": ["mann"]}
        en = load_lang_data(out, "en")
        # 'en' rows are exactly the normalized input
        assert en["binary_gender_swap"] == {"man": "woman"}
        assert en["en_pronoun2gender"] == {"male": ["man"]}
        assert en["person2religion"] == {"priest": ["priest"]}
        fr = load_lang_data(out, "fr")
        assert fr["person2religion"] == {"priest": ["pretre"]}


class TestBuiltNameLists:
    def test_build_write_load_roundtrip(self, spark, tmp_path):
        """Name-list export (ontology_builder.py:954-1050): artifacts BUILT
        by the Spark job round-trip through save/load_lang_data, name keys
        are normalized, extras join word2lang with the ontology-disagrees
        rule, and static lists merge with existing per-lang data."""
        from kawa_spark.lexicon.langdata import load_lang_data, save_lang_data
        from kawa_spark.lexicon_etl import build_name_lang_data

        providers = spark.createDataFrame(
            [
                ("en_US", "FIRST_NAME_MALE", "John Paul"),
                ("en_GB", "FIRST_NAME_MALE", "John Paul"),  # dedup across locales
                ("de_DE", "LAST_NAME", "Mueller-Schmidt."),
            ],
            "locale string, key string, word string",
        )
        word2ner = spark.createDataFrame(
            [
                ("sie", "OTHER_PRONOUN"),   # pronoun: always included
                ("schmidt", "PERSON"),      # ontology agrees -> excluded
                ("berlin", "PERSON"),       # ontology says LOC -> included
                ("kohl", "PERSON"),         # not in ontology -> included
            ],
            "word string, label string",
        )
        word2lang = spark.createDataFrame(
            [("sie", "de"), ("schmidt", "de"), ("berlin", "de"), ("kohl", "de")],
            "word string, lang string",
        )
        ontology = spark.createDataFrame(
            [("schmidt", "PERSON"), ("berlin", "LOC")], "word string, label string"
        )
        out = str(tmp_path / "langdata")
        # pre-existing artifact: the merge must keep its other keys
        save_lang_data(out, "de", {"binary_gender_swap": {"mann": "frau"}})
        paths = build_name_lang_data(
            providers, word2ner, word2lang, str(out),
            ontology=ontology,
            static_names={"sw": {"LAST_NAME": ["Simba Lion"]}},
        )
        assert paths
        en = load_lang_data(out, "en")
        assert en["FIRST_NAME_MALE"] == ["john_paul"]  # normalized, deduped
        de = load_lang_data(out, "de")
        assert de["LAST_NAME"] == ["mueller_schmidt"]  # trailing '.' stripped
        assert de["OTHER_PRONOUN"] == ["sie"]          # verbatim (not a name key)
        assert de["PERSON"] == ["berlin", "kohl"]      # disagree/absent only
        assert de["binary_gender_swap"] == {"mann": "frau"}  # merge preserved
        sw = load_lang_data(out, "sw")
        assert sw["LAST_NAME"] == ["simba_lion"]       # static list normalized

    def test_static_names_drop_empty_after_normalize(self, spark, tmp_path):
        """A static name that normalizes to '' (e.g. '.') must be dropped,
        matching the distributed job's word != '' filter (the r03 ADVICE
        finding on the static_names path)."""
        from kawa_spark.lexicon.langdata import load_lang_data
        from kawa_spark.lexicon_etl import build_name_lang_data

        empty = spark.createDataFrame([], "locale string, key string, word string")
        empty_wn = spark.createDataFrame([], "word string, label string")
        empty_wl = spark.createDataFrame([], "word string, lang string")
        out = str(tmp_path / "langdata2")
        build_name_lang_data(
            empty, empty_wn, empty_wl, out,
            static_names={"sw": {"LAST_NAME": [".", "Simba Lion", "..."]}},
        )
        sw = load_lang_data(out, "sw")
        assert sw["LAST_NAME"] == ["simba_lion"]


class TestDriverCollectGuards:
    def test_build_word2ner_guard_raises(self, spark):
        from kawa_spark.lexicon_etl import build_word2ner

        df = spark.createDataFrame(
            [(f"w{i}", "PERSON") for i in range(11)],
            "word string, category string",
        )
        with pytest.raises(ValueError, match="map-side"):
            build_word2ner(df, max_rows=10)
        assert len(build_word2ner(df, max_rows=11)) == 11

    def test_collect_lang_maps_guard_raises(self, spark):
        from kawa_spark.lexicon_etl import collect_lang_maps

        df = spark.createDataFrame(
            [("en", f"item{i}", f"w{i}") for i in range(11)],
            "lang string, item string, word string",
        )
        with pytest.raises(ValueError, match="map-side"):
            collect_lang_maps(df, max_rows=10)
        out = collect_lang_maps(df, max_rows=11)
        assert sum(len(v) for v in out["en"].values()) == 11

    def test_collect_lang_maps_scalar_guard(self, spark):
        from kawa_spark.lexicon_etl import collect_lang_maps

        df = spark.createDataFrame(
            [("en", f"w{i}", f"s{i}") for i in range(11)],
            "lang string, word string, swap string",
        )
        with pytest.raises(ValueError, match="map-side"):
            collect_lang_maps(df, scalar=True, max_rows=10)
