"""Lexicon ETL stage tests against hand-computed expectations.

Reference semantics: /root/reference/ontology/ontology_builder.py
(create_rel 139-181, create_wn_cat 104-110, create_cn_ontology 192-243,
yago_step0-2 363-450, reconcile 637-648, BFS 1164-1185)."""

import pytest
from pyspark.sql import functions as F

from kawa_spark.lexicon_etl import (
    bfs_expand,
    build_word2ner,
    filter_relations,
    majority_group_category,
    parse_conceptnet_edges,
    parse_yago_triples,
    reconcile_cn_yago,
    relation_groups,
    wn_category_counts,
    word_category_map,
    yago_entity_categories,
)


def lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


class TestConceptNetParse:
    def test_parse_and_filter(self, spark):
        raw = lines_df(spark, [
            "/a/[/r/Synonym/,/c/en/dog/n,/c/es/perro/n]\t{...}",
            "/a/[/r/Antonym/,/c/en/hot/a,/c/en/cold/a]\t{...}",
            "/a/[/r/IsA/,/c/en/dog/n,/c/en/animal/n]\t{...}",
            "garbage line with no concepts\t{}",
        ])
        edges = parse_conceptnet_edges(raw)
        rows = {(r.rel, r.word_a, r.word_b) for r in edges.collect()}
        assert ("Synonym", "dog", "perro") in rows
        assert ("Antonym", "hot", "cold") in rows
        kept = filter_relations(edges)
        rels = {r.rel for r in kept.collect()}
        assert rels == {"Synonym", "IsA"}  # Antonym not in the grep list

    def test_self_edges_dropped(self, spark):
        raw = lines_df(spark, ["/a/[/r/Synonym/,/c/en/same/n,/c/de/same/n]\t{}"])
        assert parse_conceptnet_edges(raw).count() == 0


class TestCategoryStages:
    def test_top_percent_cut(self, spark):
        # 10 distinct categories; 'dog' appears 5x, 'cat' 3x, rest <=2
        rows = (["dog"] * 5 + ["cat"] * 3 + ["bird"] * 2
                + [f"rare{i}" for i in range(7)])
        df = spark.createDataFrame([(c,) for c in rows], "category string")
        # singletons (count==1) excluded entirely; keep top 34% of the
        # 3 surviving categories = 1
        top = wn_category_counts(df, keep_percentage=0.34)
        assert [r.category for r in top.collect()] == ["dog"]

    def test_word_category_conflict_star(self, spark):
        df = spark.createDataFrame(
            [("bank", "finance"), ("bank", "river"), ("dog", "animal")],
            "word string, category string",
        )
        m = {r.word: r.category for r in word_category_map(df).collect()}
        assert m == {"bank": "*", "dog": "animal"}

    def test_majority_group_category(self, spark):
        groups = spark.createDataFrame(
            [("a", "g1"), ("b", "g1"), ("c", "g1"),
             ("x", "g2"), ("y", "g2")],
            "word string, group_id string",
        )
        w2c = spark.createDataFrame(
            [("a", "ANIMAL"), ("b", "ANIMAL"), ("x", "PLACE")],
            "word string, category string",
        )
        out = {r.word: r.category
               for r in majority_group_category(groups, w2c).collect()}
        # g1: 2/3 ANIMAL >= 0.5 -> all members ANIMAL
        assert out["a"] == out["b"] == out["c"] == "ANIMAL"
        # g2: 1/2 PLACE >= 0.5 -> assigned
        assert out["x"] == out["y"] == "PLACE"

    def test_compound_fallback_votes(self, spark):
        groups = spark.createDataFrame(
            [("dog_house", "g"), ("cat_house", "g"), ("q", "g"), ("r", "g")],
            "word string, group_id string",
        )
        # neither compound is known exactly; head fallback labels both
        w2c = spark.createDataFrame(
            [("dog", "ANIMAL"), ("cat", "ANIMAL")], "word string, category string"
        )
        out = {r.word: r.category
               for r in majority_group_category(groups, w2c).collect()}
        assert out["q"] == "ANIMAL"  # 2/4 majority via head fallback


class TestRelationGroups:
    def test_transitive_groups(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")],
            "word_a string, word_b string",
        )
        out = {r.word: r.group_id for r in relation_groups(edges).collect()}
        assert out["a"] == out["b"] == out["c"] == "a"
        assert out["x"] == out["y"] == "x"


class TestYago:
    def test_parse_and_majority(self, spark):
        raw = lines_df(spark, [
            "<http://yago/Barack_Obama> <rdf:type> <http://yago/wordnet_PresidentOfTheUnitedStates_110467179> .",
            "<http://yago/Barack_Obama> <rdf:type> <http://yago/wordnet_PresidentOfTheUnitedStates_110467179> .",
            "<http://yago/Barack_Obama> <rdf:type> <http://yago/THING> .",
            "<http://yago/Paris%20City> <rdf:type> <http://yago/wikicat_CapitalCity_1> .",
        ])
        triples = parse_yago_triples(raw)
        ents = {r.entity for r in triples.collect()}
        assert "paris city" in ents  # url-decoded, lowercased
        cats = {r.entity: r.category
                for r in yago_entity_categories(triples).collect()}
        # majority non-THING category wins; camelCase -> SNAKE
        assert cats["barack_obama"] == "PRESIDENT_OF_THE_UNITED_STATES"
        assert cats["paris city"] == "CAPITAL_CITY"

    def test_thing_only_entity_keeps_thing(self, spark):
        raw = lines_df(spark, [
            "<http://yago/Mystery> <rdf:type> <http://yago/THING> .",
        ])
        cats = {r.entity: r.category
                for r in yago_entity_categories(parse_yago_triples(raw)).collect()}
        assert cats["mystery"] == "THING"


class TestReconcile:
    def test_conflict_rules(self, spark):
        cn = spark.createDataFrame(
            [("obama", "POLITICIAN"), ("paris", "CITY"), ("cnonly", "THING")],
            "word string, category string",
        )
        yago = spark.createDataFrame(
            [("obama", "PUBLIC_FIGURE"), ("paris", "LOCATION"),
             ("yagoonly", "EVENT")],
            "entity string, category string",
        )
        out = {r.word: r.category
               for r in reconcile_cn_yago(cn, yago).collect()}
        assert out["obama"] == "PUBLIC_FIGURE"  # yago wins on PUBLIC_FIGURE
        assert out["paris"] == "CITY"           # else CN wins on overlap
        assert out["cnonly"] == "THING"
        assert out["yagoonly"] == "EVENT"


class TestBfsExpand:
    def test_expansion_with_guards(self, spark):
        seeds = spark.createDataFrame([("alice", "PERSON")], "word string, label string")
        # alice - bob - carol chain; 'hub' connects to many unknowns
        edges = [("alice", "bob"), ("bob", "carol")]
        edges += [("hub", f"u{i}") for i in range(8)] + [("alice", "hub")]
        syn = spark.createDataFrame(edges, "word_a string, word_b string")
        out = {r.word for r in bfs_expand(seeds, syn, rounds=3).collect()}
        assert {"alice", "bob", "carol"} <= out
        assert "hub" not in out  # 8 unknown neighbors >= max_unknown guard

    def test_word2ner_build(self, spark):
        df = spark.createDataFrame(
            [("b", "X"), ("a", "Y"), ("b", "X"), ("c", None)],
            "word string, category string",
        )
        recs = build_word2ner(df)
        assert recs == [["a", "Y", 0.0, 0], ["b", "X", 0.0, 1]]


class TestSynonymPivot:
    """J2: create_eng2multilang_dict (ontology_builder.py:283-353)."""

    def _edges(self, spark):
        rows = [
            # (rel, lang_a, word_a, lang_b, word_b)
            ("Synonym", "en", "dog", "es", "perro"),
            ("Synonym", "fr", "chien", "en", "dog"),     # swapped orientation
            ("Synonym", "en", "dog", "en", "hound"),     # en-en: excluded
            ("Synonym", "es", "perro", "fr", "chien"),   # no en: excluded
            ("Synonym", "en", "Big Cat", "de", "Gross-Katze"),  # normalization
            ("IsA", "en", "dog", "es", "animal"),        # wrong rel
        ]
        return spark.createDataFrame(
            rows, "rel string, lang_a string, word_a string, lang_b string, word_b string"
        )

    def test_pivot_tables(self, spark):
        from kawa_spark.lexicon_etl import synonym_pivot_tables

        en_pivot, word2en, word2lang = synonym_pivot_tables(self._edges(spark))
        piv = {(r.en_word, r.word) for r in en_pivot.collect()}
        # en word is a member of its own group; normalized forms
        assert ("dog", "dog") in piv
        assert ("dog", "perro") in piv
        assert ("dog", "chien") in piv
        assert ("big_cat", "gross_katze") in piv
        assert ("dog", "hound") not in piv          # en-en excluded
        w2e = {(r.word, r.en_word) for r in word2en.collect()}
        assert ("perro", "dog") in w2e and ("chien", "dog") in w2e
        langs = {(r.word, r.lang) for r in word2lang.collect()}
        # word2lang is populated from BOTH sides before the en filter
        assert ("perro", "es") in langs and ("hound", "en") in langs

    def test_expand_labels(self, spark):
        from kawa_spark.lexicon_etl import (
            expand_labels_crosslingual,
            synonym_pivot_tables,
        )

        en_pivot, word2en, _ = synonym_pivot_tables(self._edges(spark))
        seeds = spark.createDataFrame([("dog", "ANIMAL")], "word string, label string")
        out = {
            (r.word, r.label)
            for r in expand_labels_crosslingual(seeds, en_pivot, word2en).collect()
        }
        # all members of dog's pivot group get the label (each has exactly
        # one en-pivot = dog, which is known -> 0 unknown -> accepted)
        assert ("perro", "ANIMAL") in out
        assert ("chien", "ANIMAL") in out
        assert ("dog", "ANIMAL") in out
        assert ("gross_katze", "ANIMAL") not in out

    def test_expand_respects_block_list(self, spark):
        from kawa_spark.lexicon_etl import (
            expand_labels_crosslingual,
            synonym_pivot_tables,
        )

        en_pivot, word2en, _ = synonym_pivot_tables(self._edges(spark))
        seeds = spark.createDataFrame([("dog", "ANIMAL")], "word string, label string")
        block = spark.createDataFrame([("dog",)], "word string")
        out = {
            (r.word, r.label)
            for r in expand_labels_crosslingual(
                seeds, en_pivot, word2en, block_list=block
            ).collect()
        }
        # every candidate's en-pivot set touches the blocked word ->
        # only the seed pivot itself survives
        assert ("perro", "ANIMAL") not in out
        assert ("dog", "ANIMAL") in out


class TestWikiannMerge:
    """J4: fix_and_enhance_word2ner override guard
    (ontology_builder.py:1263-1266)."""

    def test_override_and_keep_rules(self, spark):
        from kawa_spark.lexicon_etl import merge_wikiann_overrides

        built = spark.createDataFrame(
            [
                ("paris", "GPE"),          # LOCATION wikiann must NOT clobber
                ("acme", "PRODUCT"),       # ORG wikiann overrides
                ("esperanto", "LANGUAGE"), # ORG wikiann must NOT clobber
                ("only_built", "EVENT"),
            ],
            "word string, category string",
        )
        wikiann = spark.createDataFrame(
            [
                ("paris", "LOCATION"),
                ("acme", "ORG"),
                ("esperanto", "ORG"),
                ("only_wikiann", "PUBLIC_FIGURE"),
            ],
            "word string, category string",
        )
        got = {r.word: r.category for r in merge_wikiann_overrides(built, wikiann).collect()}
        assert got["paris"] == "GPE"
        assert got["acme"] == "ORG"
        assert got["esperanto"] == "LANGUAGE"
        assert got["only_built"] == "EVENT"
        assert got["only_wikiann"] == "PUBLIC_FIGURE"


class TestHypernymClosure:
    """G2: WordNet-style closure (ontology_builder.py:522,692-706)."""

    def _edges(self, spark):
        rows = [
            ("poodle", "dog"), ("beagle", "dog"), ("dog", "canine"),
            ("canine", "animal"), ("cat", "animal"), ("siamese", "cat"),
        ]
        return spark.createDataFrame(rows, "child string, parent string")

    def test_closure_depths(self, spark):
        from kawa_spark.lexicon_etl import hypernym_closure

        reach = {
            (r.descendant, r.ancestor): r.depth
            for r in hypernym_closure(self._edges(spark)).collect()
        }
        assert reach[("poodle", "dog")] == 1
        assert reach[("poodle", "canine")] == 2
        assert reach[("poodle", "animal")] == 3
        assert ("dog", "poodle") not in reach  # directed

    def test_leaf_descendants(self, spark):
        from kawa_spark.lexicon_etl import leaf_descendants

        roots = spark.createDataFrame([("animal",)], "root string")
        leaves = {
            r.leaf for r in leaf_descendants(self._edges(spark), roots).collect()
        }
        # leaves only: dog/cat/canine are parents themselves
        assert leaves == {"poodle", "beagle", "siamese"}

    def test_max_depth_bound(self, spark):
        from kawa_spark.lexicon_etl import hypernym_closure

        chain = spark.createDataFrame(
            [(f"n{i}", f"n{i+1}") for i in range(6)], "child string, parent string"
        )
        reach = {
            (r.descendant, r.ancestor)
            for r in hypernym_closure(chain, max_depth=3).collect()
        }
        assert ("n0", "n3") in reach
        assert ("n0", "n4") not in reach
