"""S6 per-language data files + S4 TSV sink."""

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
