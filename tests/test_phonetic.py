"""F16: double-metaphone + transliteration blocking keys."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kawa_spark.config import PipelineConfig
from kawa_spark.operators.blocking import add_block_keys
from kawa_spark.operators.phonetic import double_metaphone, latin_skeleton


class TestDoubleMetaphone:
    def test_sound_alike_collisions(self):
        # the property blocking needs: sound-alike spellings collide
        assert double_metaphone("Smith")[0] == double_metaphone("Smyth")[0]
        assert double_metaphone("Katherine")[0] == double_metaphone("Catherine")[0]
        assert double_metaphone("Philip")[0] == double_metaphone("Filip")[0]
        assert double_metaphone("night")[0] == double_metaphone("nite")[0]
        assert double_metaphone("Jackson")[0] == double_metaphone("Jaxon")[0]

    def test_primary_secondary_ambiguity(self):
        # CH is X/K ambiguous: the two codes differ and cover both
        pri, sec = double_metaphone("chemist")
        assert pri != sec
        assert {pri[0], sec[0]} == {"K", "X"}

    def test_accents_and_nonalpha_stripped(self):
        assert double_metaphone("Müller") == double_metaphone("Muller")
        assert double_metaphone("o'brien") == double_metaphone("obrien")

    def test_empty_and_nonlatin(self):
        assert double_metaphone("") == ("", "")
        assert double_metaphone("北京") == ("", "")

    def test_distinct_names_do_not_collide(self):
        assert double_metaphone("Anderson")[0] != double_metaphone("Williams")[0]


class TestLatinSkeleton:
    def test_accent_strip(self):
        assert latin_skeleton("Müller") == "muller"
        assert latin_skeleton("café") == "cafe"

    def test_cyrillic_and_greek(self):
        assert latin_skeleton("Мюллер") == "myuller"
        assert latin_skeleton("Αθήνα") == "athina"

    def test_cjk_dropped(self):
        assert latin_skeleton("北京abc") == "abc"


class TestBlockingIntegration:
    def test_metaphone_keys_collide_soundalikes(self, spark):
        pdf = pd.DataFrame(
            {
                "mention_id": ["m1", "m2"],
                "norm": ["smith_jones", "smyth_jones"],
            }
        )
        cfg = PipelineConfig(metaphone_keys=True, translit_keys=True)
        keyed = add_block_keys(spark.createDataFrame(pdf), cfg)
        keys = {}
        for r in keyed.collect():
            keys.setdefault(r["mention_id"], set()).add(r["block_key"])
        dm_shared = {
            k for k in keys["m1"] & keys["m2"] if k.startswith(("dm1:", "dm2:"))
        }
        assert dm_shared, "sound-alike norms must share a metaphone key"

    def test_flags_off_means_no_udf_keys(self, spark):
        pdf = pd.DataFrame({"mention_id": ["m1"], "norm": ["smith"]})
        keyed = add_block_keys(spark.createDataFrame(pdf))
        assert not any(
            r["block_key"].startswith(("dm1:", "dm2:", "tr:"))
            for r in keyed.collect()
        )

    def test_non_latin_norms_get_no_degenerate_keys(self, spark):
        # double_metaphone / latin_skeleton return '' for surfaces with
        # no Latin letters; a shared bare 'dm1:'/'tr:' key would
        # cross-pair every CJK/Cyrillic-free surface (O(n^2) at web
        # scale). Empty codes must yield NO key, not an empty-payload one.
        pdf = pd.DataFrame(
            {
                "mention_id": ["m1", "m2", "m3"],
                "norm": ["北京", "上海", "smith"],
            }
        )
        cfg = PipelineConfig(metaphone_keys=True, translit_keys=True)
        keyed = add_block_keys(spark.createDataFrame(pdf), cfg)
        rows = keyed.collect()
        bad = [r for r in rows if r["block_key"] in ("dm1:", "dm2:", "tr:")]
        assert not bad, f"degenerate empty-payload keys: {bad}"
        # the Latin norm still gets its phonetic keys
        m3 = {r["block_key"] for r in rows if r["mention_id"] == "m3"}
        assert any(k.startswith("dm1:") for k in m3)
        assert any(k.startswith("tr:") for k in m3)
        # and the CJK norms never share a phonetic/translit bucket
        m1 = {r["block_key"] for r in rows if r["mention_id"] == "m1"}
        m2 = {r["block_key"] for r in rows if r["mention_id"] == "m2"}
        assert not {
            k for k in m1 & m2 if k.startswith(("dm1:", "dm2:", "tr:"))
        }
