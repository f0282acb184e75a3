"""S7/F15/A6: word2vec ingestion, vector resize, weighted merge
(reference: ontology_kb.py:1153-1395)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from kawa_spark.sources.embeddings import (
    embeddings_dict,
    merge_embeddings,
    read_word2vec_binary,
    read_word2vec_text,
    resize_vec,
)

VECS = {
    "apple": [1.0, 0.0, 0.0, 0.0],
    "Apple": [0.0, 1.0, 0.0, 0.0],
    "new-york": [0.0, 0.0, 1.0, 0.0],
    "bad@word.com": [1.0, 1.0, 1.0, 1.0],
    "zero": [0.0, 0.0, 0.0, 0.0],
}


@pytest.fixture()
def text_file(tmp_path):
    p = tmp_path / "emb.txt"
    lines = [f"{len(VECS)} 4"]
    for w, v in VECS.items():
        lines.append(w + " " + " ".join(str(x) for x in v))
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture()
def binary_file(tmp_path):
    p = tmp_path / "emb.bin"
    with open(p, "wb") as f:
        f.write(f"{len(VECS)} 4\n".encode())
        for w, v in VECS.items():
            f.write(w.encode() + b" ")
            f.write(struct.pack("<4f", *v))
    return str(p)


class TestReaders:
    def test_text_reader_parses_cleans_rejects(self, spark, text_file):
        df = read_word2vec_text(spark, text_file, min_cnt=1)
        rows = {r.word: (r.vec, r.cnt) for r in df.collect()}
        # case collapse -> two 'apple' rows; hyphen -> underscore;
        # email-ish and all-zero rows rejected
        assert sorted(rows) == ["apple", "new_york"]
        assert df.filter(F.col("word") == "apple").count() == 2
        # rank weight: first line gets vocab_size - 0 + 1... line 1 of 5
        cnts = sorted(r.cnt for r in df.filter(F.col("word") == "apple").collect())
        assert cnts == [4, 5]  # vocab=5: lines 1,2 -> 5-1+1=5, 5-2+1=4

    def test_binary_reader_matches_text(self, spark, text_file, binary_file):
        t = read_word2vec_text(spark, text_file, min_cnt=1)
        b = read_word2vec_binary(spark, binary_file, min_cnt=1)
        rt = sorted((r.word, tuple(r.vec), r.cnt) for r in t.collect())
        rb = sorted((r.word, tuple(r.vec), r.cnt) for r in b.collect())
        assert rt == rb

    def test_resize_tile_and_truncate(self, spark):
        df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "vec array<float>")
        up = df.select(resize_vec(F.col("vec"), 3, 7).alias("v")).collect()[0].v
        assert up == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 1.0]  # kb.py:1340-1343
        down = df.select(resize_vec(F.col("vec"), 3, 2).alias("v")).collect()[0].v
        assert down == [1.0, 2.0]  # kb.py:1344-1345


class TestWeightedMerge:
    def test_weighted_mean_and_count_rules(self, spark):
        rows = [
            ("apple", [1.0, 0.0], 3),
            ("apple", [0.0, 1.0], 1),
            ("the", [1.0, 1.0], 6),
            ("new_york_city", [2.0, 2.0], 9),
        ]
        df = spark.createDataFrame(rows, "word string, vec array<float>, cnt int")
        got = {
            r.word: (tuple(round(x, 6) for x in r.vec), r.cnt)
            for r in merge_embeddings(df, stopwords={"the"}, min_cnt=4).collect()
        }
        # weighted mean: (3*[1,0] + 1*[0,1]) / 4
        assert got["apple"][0] == (0.75, 0.25)
        assert got["apple"][1] == 4  # max(min_cnt, max_cnt/(0+1)) = max(4, 3)
        # stopword: cnt = max(min_cnt, 2*max_cnt)
        assert got["the"][1] == 12
        # compound downweight: 9 // 3 underscores+1 = 3 -> min_cnt floor 4
        assert got["new_york_city"][1] == 4

    def test_dict_for_scoring(self, spark):
        df = spark.createDataFrame(
            [("w", [0.5, 0.5], 1)], "word string, vec array<float>, cnt int"
        )
        d = embeddings_dict(df)
        assert isinstance(d["w"], np.ndarray)
        assert d["w"].dtype == np.float32


class TestSenses:
    """word#N multi-sense entries (ontology_kb.py:195-196;
    extract_word_embeddings.py:65-73 #idx disambiguation)."""

    @pytest.fixture()
    def sense_file(self, tmp_path):
        vecs = {
            "obama": [1.0, 0.0, 0.0, 0.0],
            "obama#2": [0.0, 1.0, 0.0, 0.0],
            "bush#1": [0.0, 0.0, 1.0, 0.0],
            "bush#2": [0.0, 0.0, 0.0, 1.0],
        }
        p = tmp_path / "senses.txt"
        lines = [f"{len(vecs)} 4"]
        for w, v in vecs.items():
            lines.append(w + " " + " ".join(str(x) for x in v))
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_default_folds_hash_to_digit(self, spark, sense_file):
        words = {
            r.word for r in read_word2vec_text(spark, sense_file).collect()
        }
        assert words == {"obama", "obama12", "bush11", "bush12"}

    def test_keep_senses_round_trip(self, spark, sense_file):
        df = read_word2vec_text(spark, sense_file, keep_senses=True)
        words = {r.word for r in df.collect()}
        assert words == {"obama", "obama#2", "bush#1", "bush#2"}

    def test_keep_senses_binary_matches_text(self, spark, sense_file, tmp_path):
        import struct as _struct

        text_rows = {
            r.word: r.vec
            for r in read_word2vec_text(
                spark, sense_file, keep_senses=True
            ).collect()
        }
        p = tmp_path / "senses.bin"
        with open(p, "wb") as f:
            lines = open(sense_file).read().strip().splitlines()
            f.write((lines[0] + "\n").encode())
            for line in lines[1:]:
                w, *v = line.split()
                f.write(w.encode() + b" ")
                f.write(_struct.pack("<4f", *map(float, v)))
        bin_rows = {
            r.word: r.vec
            for r in read_word2vec_binary(
                spark, str(p), keep_senses=True
            ).collect()
        }
        assert text_rows == bin_rows

    def test_resolve_first_sense(self, spark, sense_file):
        from kawa_spark.sources.embeddings import resolve_senses

        df = read_word2vec_text(spark, sense_file, keep_senses=True)
        out = {r.word: r.vec for r in resolve_senses(df, rule="first").collect()}
        # bare word = sense 0 wins over #2; no bare bush -> #1 wins
        assert set(out) == {"obama", "bush"}
        assert out["obama"] == [1.0, 0.0, 0.0, 0.0]
        assert out["bush"] == [0.0, 0.0, 1.0, 0.0]

    def test_resolve_best_cosine(self, spark, sense_file):
        from kawa_spark.sources.embeddings import resolve_senses

        df = read_word2vec_text(spark, sense_file, keep_senses=True)
        out = {
            r.word: r.vec
            for r in resolve_senses(
                df, rule="best", query_vec=[0.0, 0.0, 0.0, 1.0]
            ).collect()
        }
        # bush#2 is the unit vector along the query axis
        assert out["bush"] == [0.0, 0.0, 0.0, 1.0]

    def test_resolve_best_requires_query(self, spark, sense_file):
        from kawa_spark.sources.embeddings import resolve_senses

        df = read_word2vec_text(spark, sense_file, keep_senses=True)
        with pytest.raises(ValueError, match="query_vec"):
            resolve_senses(df, rule="best")


class TestDriverGuards:
    def test_embeddings_dict_guard_raises(self, spark):
        df = spark.createDataFrame(
            [(f"w{i}", [1.0]) for i in range(11)], "word string, vec array<float>"
        )
        with pytest.raises(ValueError, match="map-side join"):
            embeddings_dict(df, max_rows=10)

    def test_embeddings_dict_under_cap_ok(self, spark):
        df = spark.createDataFrame(
            [(f"w{i}", [1.0]) for i in range(10)], "word string, vec array<float>"
        )
        assert len(embeddings_dict(df, max_rows=10)) == 10
