"""Lexicon ETL: the reference builder pipeline re-expressed Spark-first.

The reference (ontology_builder.py) builds its lexicon with shell-outs
(wget/grep/sort), sequential dict merges, and driver-side Counters:

* grep relation pre-filter        -> ontology_builder.py:97-98,123-138
* ConceptNet uri parsing          -> ontology_builder.py:146-170
* sequential neighbor merge (G1)  -> ontology_builder.py:139-181
* top-percent category cut (A3)   -> ontology_builder.py:104-110
* word->category map w/ conflicts -> ontology_builder.py:192-201
* majority-vote group category    -> ontology_builder.py:206-243
* Yago NT parse + group-adjacent  -> ontology_builder.py:363-450
* CN/Yago reconciliation (J3)     -> ontology_builder.py:637-648
* bounded BFS expansion (G3)      -> ontology_builder.py:1164-1185

Here every stage is a DataFrame transformation: the grep becomes a
pushed-down ``contains`` filter, the external sort + group-adjacent scan
becomes ``groupBy``, the order-dependent sequential merge becomes true
connected components (operators/cc.py), and the Counters become
``groupBy().count()`` with ``max_by`` majority votes. All stages are
pure column expressions — no Python row UDFs — so they survive 100 TB
inputs on partitioning alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.cc import connected_components

# ConceptNet relations the reference greps for (ontology_builder.py:123-138)
DEFAULT_RELATIONS = (
    "Synonym", "SimilarTo", "DerivedFrom", "EtymologicallyRelatedTo",
    "EtymologicallyDerivedFrom", "RelatedTo", "FormOf", "IsA",
)


def parse_conceptnet_edges(raw: DataFrame, line_col: str = "value") -> DataFrame:
    """Raw assertion lines -> (rel, lang_a, word_a, lang_b, word_b).

    Mirrors the uri split at ontology_builder.py:146-160: the first TSV
    field is ``/a/[/r/REL/,/c/lang/word/...,/c/lang/word/...]``. Kept
    fully native (split/regexp) so Catalyst can pipeline it with the
    relation filter; rows without two concepts are dropped as the
    reference does (``len(rel) < 2: continue``)."""
    uri = F.split(F.col(line_col), "\t").getItem(0)
    rel = F.regexp_extract(uri, r"/r/([A-Za-z]+)/", 1)
    concepts = F.expr(
        f"filter(split(btrim(split({line_col}, '\t')[0], ']'), ',/c/'),"
        " (x, i) -> i > 0)"
    )
    a = F.try_element_at(concepts, F.lit(1))
    b = F.try_element_at(concepts, F.lit(2))
    split_a, split_b = F.split(a, "/"), F.split(b, "/")
    out = (
        raw.select(
            rel.alias("rel"),
            F.try_element_at(split_a, F.lit(1)).alias("lang_a"),
            F.try_element_at(split_a, F.lit(2)).alias("word_a"),
            F.try_element_at(split_b, F.lit(1)).alias("lang_b"),
            F.try_element_at(split_b, F.lit(2)).alias("word_b"),
        )
        .filter(
            F.col("word_a").isNotNull()
            & F.col("word_b").isNotNull()
            & (F.col("word_a") != F.col("word_b"))
        )
    )
    return out


def filter_relations(edges: DataFrame, relations=DEFAULT_RELATIONS) -> DataFrame:
    """The grep pre-filter (S2): a pushed-down IN predicate."""
    return edges.filter(F.col("rel").isin(list(relations)))


def wn_category_counts(
    wn_concepts: DataFrame, keep_percentage: float = 0.01
) -> DataFrame:
    """Top-percent WordNet category cut (A3, ontology_builder.py:104-110).

    wn_concepts: (category) one row per occurrence. Keeps categories with
    count > 1, ranked by frequency, top ``keep_percentage`` fraction.

    Plan note: the cut is orderBy + limit — Spark executes that as
    TakeOrdered (per-partition top-k + driver merge), fully parallel. A
    ``row_number`` over an unpartitioned window would funnel every
    category row through ONE task (the round-1 review's finding)."""
    counts = (
        wn_concepts.groupBy("category")
        .count()
        .filter(F.col("count") > 1)
        .filter(~F.col("category").rlike("^[0-9]"))
        .localCheckpoint(eager=True)  # reused by count() and the top-k
    )
    total = counts.count()
    keep = max(1, int(total * keep_percentage))
    return (
        counts.orderBy(F.desc("count"), "category")
        .limit(keep)
        .select("category", "count")
    )


def word_category_map(word_cats: DataFrame) -> DataFrame:
    """word -> single category, '*' on conflict
    (ontology_builder.py:192-201)."""
    return word_cats.groupBy("word").agg(
        F.when(F.count_distinct("category") > 1, F.lit("*"))
        .otherwise(F.first("category"))
        .alias("category")
    )


def relation_groups(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(word_a, word_b) -> (word, group_id) via true connected components.

    Replaces the reference's sequential, insertion-order-dependent
    neighbor merge (ontology_builder.py:139-181) with
    large-star/small-star CC — deterministic under any partitioning;
    group_id = lexicographic min member (the reference keys groups by
    the shortest member — equivalent up to a rename, which is what
    cluster-level F1 measures)."""
    comp = connected_components(
        edges.select("word_a", "word_b"), src="word_a", dst="word_b",
        max_iter=max_iter,
    )
    members = comp.select(F.col("node").alias("word"), F.col("component").alias("group_id"))
    singles = (
        edges.select(F.col("word_a").alias("word"))
        .union(edges.select("word_b"))
        .distinct()
        .join(members, "word", "left_anti")
        .withColumn("group_id", F.col("word"))
    )
    return members.unionByName(singles)


def _with_cat_fallback(words: DataFrame, word2cat: DataFrame) -> DataFrame:
    """J1: word -> category with first/last-component fallback
    (ontology_builder.py:206-208): exact word, else head of compound,
    else tail."""
    w2c = word2cat.select("word", "category")
    head = F.element_at(F.split(F.col("word"), "_"), 1)
    tail = F.element_at(F.split(F.col("word"), "_"), -1)
    exact = w2c.withColumnRenamed("category", "cat_exact")
    by_head = w2c.select(
        F.col("word").alias("head_word"), F.col("category").alias("cat_head")
    )
    by_tail = w2c.select(
        F.col("word").alias("tail_word"), F.col("category").alias("cat_tail")
    )
    return (
        words.withColumn("head", head)
        .withColumn("tail", tail)
        .join(F.broadcast(exact), "word", "left")
        .join(F.broadcast(by_head), F.col("head") == F.col("head_word"), "left")
        .join(F.broadcast(by_tail), F.col("tail") == F.col("tail_word"), "left")
        .withColumn("category", F.coalesce("cat_exact", "cat_head", "cat_tail"))
        .drop("head", "tail", "head_word", "tail_word",
              "cat_exact", "cat_head", "cat_tail")
    )


def majority_group_category(
    groups: DataFrame, word2cat: DataFrame, min_majority: float = 0.5
) -> DataFrame:
    """Group-majority category inference (A1/A4,
    ontology_builder.py:206-243): a group whose top non-'*' category
    covers >= ``min_majority`` of members assigns it to every member.

    Native plan: broadcast category lookup -> two-level groupBy
    (map-side partial aggregation) -> max_by."""
    labeled = _with_cat_fallback(groups, word2cat)
    cat_counts = (
        labeled.filter(F.col("category").isNotNull() & (F.col("category") != "*"))
        .groupBy("group_id", "category")
        .count()
    )
    sizes = groups.groupBy("group_id").agg(F.count("*").alias("group_size"))
    top = (
        cat_counts.groupBy("group_id")
        .agg(F.max_by("category", F.struct("count", "category")).alias("top_cat"),
             F.max(F.struct("count", "category")).alias("_m"))
        .select("group_id", "top_cat", F.col("_m.count").alias("top_count"))
    )
    winners = top.join(sizes, "group_id").filter(
        F.col("top_count") >= F.col("group_size") * min_majority
    )
    return (
        groups.join(F.broadcast(winners.select("group_id", "top_cat")), "group_id", "left")
        .withColumnRenamed("top_cat", "category")
    )


def parse_yago_triples(raw: DataFrame, line_col: str = "value") -> DataFrame:
    """Yago NT lines -> (entity, category) (S3/F8/F9,
    ontology_builder.py:363-385): split on '>', url-decode the entity,
    camelCase -> snake_case upper for the category."""
    parts = F.split(F.col(line_col), ">")
    ent_uri = F.regexp_extract(F.element_at(parts, 1), r"/([^/<]+)$", 1)
    cat_uri = F.regexp_extract(F.element_at(parts, 3), r"/(?:wordnet_|wikicat_)?([^/<]+)$", 1)
    entity = F.lower(F.url_decode(ent_uri))
    category = F.upper(
        F.regexp_replace(F.regexp_replace(cat_uri, r"_\d+$", ""),
                         r"(?<=[a-z0-9])(?=[A-Z])", "_")
    )
    return (
        raw.select(entity.alias("entity"), category.alias("category"))
        .filter((F.col("entity") != "") & (F.col("category") != ""))
    )


def yago_entity_categories(triples: DataFrame) -> DataFrame:
    """Majority non-THING category per entity (A4,
    ontology_builder.py:402-450). The reference shells out to
    ``sort --parallel=32`` then streams group-adjacent rows; the
    equivalent relational plan is a partial-aggregating groupBy — the
    exchange performs the same external sort, minus the temp files."""
    return (
        triples.groupBy("entity", "category")
        .count()
        .withColumn("pref", F.when(F.col("category") == "THING", 0).otherwise(1))
        .groupBy("entity")
        .agg(
            F.max_by("category", F.struct("pref", "count", "category")).alias("category"),
            F.sum("count").alias("n_mentions"),
        )
    )


def reconcile_cn_yago(cn: DataFrame, yago: DataFrame) -> DataFrame:
    """Full-outer reconciliation with the reference's conflict rule
    (J3, ontology_builder.py:637-648): overlap keeps the ConceptNet
    label unless Yago says PUBLIC_FIGURE (gold for people)."""
    c = cn.select(F.col("word"), F.col("category").alias("cn_cat"))
    y = yago.select(F.col("entity").alias("word"), F.col("category").alias("yago_cat"))
    return (
        c.join(y, "word", "full_outer")
        .withColumn(
            "category",
            F.when(F.col("yago_cat") == "PUBLIC_FIGURE", F.col("yago_cat"))
            .otherwise(F.coalesce("cn_cat", "yago_cat")),
        )
        .select("word", "category", "cn_cat", "yago_cat")
    )


def bfs_expand(
    seeds: DataFrame,
    syn_edges: DataFrame,
    rounds: int = 3,
    max_unknown: int = 5,
    max_ratio: float = 0.5,
) -> DataFrame:
    """Bounded BFS synonym expansion with precision guards (G3,
    ontology_builder.py:1164-1185): up to ``rounds`` hops; a frontier
    word is accepted only if it connects to fewer than ``max_unknown``
    unlabeled words and the unknown/known ratio stays below
    ``max_ratio``. Per-round localCheckpoint truncates the plan.

    seeds: (word, label); syn_edges: (word_a, word_b) undirected."""
    sym = syn_edges.select("word_a", "word_b").union(
        syn_edges.select(F.col("word_b").alias("word_a"), F.col("word_a").alias("word_b"))
    ).distinct()
    degree = sym.groupBy("word_a").agg(F.count("*").alias("degree"))

    known = seeds.select("word", "label").distinct().localCheckpoint(eager=True)
    frontier = known
    for _ in range(rounds):
        cand = (
            sym.join(frontier.withColumnRenamed("word", "word_a"), "word_a")
            .select(F.col("word_b").alias("word"), "label")
            .join(known.select("word"), "word", "left_anti")
        )
        known_deg = (
            sym.join(known.select(F.col("word").alias("word_b")), "word_b")
            .groupBy("word_a").agg(F.count("*").alias("known_degree"))
        )
        guarded = (
            cand.groupBy("word")
            .agg(F.first("label").alias("label"), F.count("*").alias("votes"))
            .join(degree.withColumnRenamed("word_a", "word"), "word", "left")
            .join(known_deg.withColumnRenamed("word_a", "word"), "word", "left")
            .withColumn("known_degree", F.coalesce("known_degree", F.lit(0)))
            .withColumn("unknown", F.col("degree") - F.col("known_degree"))
            .filter(
                (F.col("unknown") < max_unknown)
                & (F.col("unknown") <= F.col("degree") * max_ratio)
            )
            .select("word", "label")
        )
        frontier = guarded.localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        known = known.union(frontier).distinct().localCheckpoint(eager=True)
    return known


def write_tsv(df: DataFrame, path: str, sort_cols: list[str] | None = None) -> None:
    """S4 — the reference's sorted-TSV artifact sink
    (``entity\\tcat`` + ``sort --parallel=32``,
    ontology_builder.py:367,387,451): the external sort becomes the
    exchange's range-partitioned sort; files land sorted within and
    across partitions."""
    out = df.sort(*sort_cols) if sort_cols else df
    out.write.mode("overwrite").option("sep", "\t").option("header", False).csv(path)


def read_tsv(spark, path: str, schema: str) -> DataFrame:
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def normalize_word(col):
    """The reference's word normalizer applied before every dict insert
    (ontology_builder.py:313-314): space/hyphen -> connector, lowercase,
    strip trailing/leading dots. Pure column expression."""
    return F.trim(
        F.translate(F.lower(col), " -", "__"), trim=F.lit(".")
    )


def synonym_pivot_tables(
    edges: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """J2 — the cross-lingual synonym dictionary
    (create_eng2multilang_dict, ontology_builder.py:283-353) as three
    DataFrames instead of three driver-side dicts:

    * ``en_pivot``  (en_word, word)  — the reference's ``en`` dict:
      every Synonym pair with exactly one English side, keyed by the
      English word; the English word itself is a member of its own group
      (the reference appends ``val = [a, b]`` with a = the en side).
    * ``word2en``   (word, en_word)  — the inverse probe table.
    * ``word2lang`` (word, lang)     — language memberships from BOTH
      sides of every Synonym row (before the en filter, as the
      reference populates word2lang first).

    Input: parsed ConceptNet edges (rel, lang_a, word_a, lang_b, word_b)
    from :func:`parse_conceptnet_edges`. All-native; the mt5 CJK
    re-segmentation (ontology_builder.py:322-326) is replaced by the
    repo's deterministic segmenter convention (SURVEY Appendix B D4 —
    transformers is unavailable), which the matcher applies uniformly.

    Scale shape: groupBy/distinct only — no driver dict; at full
    ConceptNet (~30M assertion rows) each output is a shuffled distinct
    over a few hundred MB."""
    syn = edges.filter(F.col("rel") == "Synonym").select(
        "lang_a",
        normalize_word(F.col("word_a")).alias("word_a"),
        "lang_b",
        normalize_word(F.col("word_b")).alias("word_b"),
    )
    word2lang = (
        syn.select(F.col("word_a").alias("word"), F.col("lang_a").alias("lang"))
        .unionByName(
            syn.select(F.col("word_b").alias("word"), F.col("lang_b").alias("lang"))
        )
        .distinct()
    )
    # exactly one side English; orient en -> other (the reference swap)
    one_en = syn.filter(
        (F.col("word_a") != F.col("word_b"))
        & ((F.col("lang_a") == "en") != (F.col("lang_b") == "en"))
    )
    oriented = one_en.select(
        F.when(F.col("lang_a") == "en", F.col("word_a"))
        .otherwise(F.col("word_b"))
        .alias("en_word"),
        F.when(F.col("lang_a") == "en", F.col("word_b"))
        .otherwise(F.col("word_a"))
        .alias("word"),
    )
    en_pivot = (
        oriented.select("en_word", "word")
        .unionByName(oriented.select("en_word", F.col("en_word").alias("word")))
        .distinct()
    )
    word2en = en_pivot.select("word", "en_word").distinct()
    return en_pivot, word2en, word2lang


def expand_labels_crosslingual(
    seeds: DataFrame,
    en_pivot: DataFrame,
    word2en: DataFrame,
    block_list: DataFrame | None = None,
    rounds: int = 3,
    cut_off_abs: int = 5,
    cut_off_per: float = 0.5,
) -> DataFrame:
    """J2 consumer — per-label multilingual expansion over the en-pivot
    graph (create_multilingual_examples, ontology_builder.py:1172-1207),
    all labels in one distributed job instead of one driver loop per
    label.

    Per round, mirroring the reference exactly:

    1. candidate synonyms = en_pivot members of accepted en pivots;
    2. drop any candidate whose word2en set touches the (label-scoped)
       block list (``has_any``);
    3. accept a candidate iff its UNKNOWN en-pivots (not yet accepted
       for that label) number < ``cut_off_abs`` AND are < ``cut_off_per``
       of its en-pivot set;
    4. unknown en-pivots seen >1 time become next round's accepted
       pivots (the reference's ``Counter(added2) > 1`` vote).

    seeds: (word, label) English seed words; block_list: (word, label)
    or (word) applied to every label. Returns (word, label) distinct —
    the union of accepted synonyms and accepted en pivots."""
    seeds = seeds.select(
        normalize_word(F.col("word")).alias("en_word"), "label"
    ).distinct()
    if block_list is None:
        blocked = None
    else:
        cols = block_list.columns
        blocked = block_list.select(
            normalize_word(F.col("word")).alias("en_word"),
            *( [F.col("label")] if "label" in cols else [] ),
        ).distinct()

    # per-word en-pivot degree (denominator of the unknown ratio)
    en_degree = word2en.groupBy("word").agg(F.count("*").alias("en_degree"))
    # words whose en-pivot set touches the block list are never accepted
    if blocked is not None:
        if "label" in blocked.columns:
            word_blocked = word2en.join(blocked, "en_word").select(
                "word", "label"
            ).distinct()
        else:
            word_blocked = word2en.join(blocked, "en_word").select("word").distinct()
    else:
        word_blocked = None

    accepted_en = seeds.localCheckpoint(eager=True)  # (en_word, label)
    frontier = accepted_en
    out_words = None  # (word, label) accepted synonyms
    for _ in range(rounds):
        cand = (
            en_pivot.join(frontier, "en_word")
            .select("word", "label")
            .distinct()
        )
        if word_blocked is not None:
            on = ["word", "label"] if "label" in word_blocked.columns else ["word"]
            cand = cand.join(word_blocked, on, "left_anti")
        # unknown en-pivots per (candidate word, label)
        pivots = cand.join(word2en, "word")  # (word, label, en_word)
        unknown = pivots.join(accepted_en, ["en_word", "label"], "left_anti")
        unk_counts = unknown.groupBy("word", "label").agg(
            F.count("*").alias("n_unknown")
        )
        stats = (
            cand.join(unk_counts, ["word", "label"], "left")
            .withColumn("n_unknown", F.coalesce("n_unknown", F.lit(0)))
            .join(en_degree, "word")
        )
        ok = stats.filter(
            (F.col("n_unknown") < cut_off_abs)
            & (F.col("n_unknown") < F.col("en_degree") * cut_off_per)
        ).select("word", "label")
        ok = ok.localCheckpoint(eager=True)
        out_words = ok if out_words is None else out_words.unionByName(ok).distinct()

        # next frontier: unknown en-pivots of ACCEPTED words with >1 vote
        votes = (
            unknown.join(ok, ["word", "label"], "left_semi")
            .groupBy("en_word", "label")
            .agg(F.count("*").alias("votes"))
            .filter(F.col("votes") > 1)
            .select("en_word", "label")
        )
        frontier = votes.join(accepted_en, ["en_word", "label"], "left_anti")
        frontier = frontier.localCheckpoint(eager=True)
        if not frontier.take(1):
            break
        accepted_en = (
            accepted_en.unionByName(frontier).distinct().localCheckpoint(eager=True)
        )
    result = accepted_en.select(F.col("en_word").alias("word"), "label")
    if out_words is not None:
        result = result.unionByName(out_words)
    return result.distinct()


# J4 — wikiann gold-merge override guard (fix_and_enhance_word2ner,
# ontology_builder.py:1263-1266): a wikiann label overrides the built
# lexicon's label UNLESS the existing label is a finer-grained type the
# wikiann coarse type would clobber.
WIKIANN_KEEP_EXISTING = {
    "LOCATION": ("FAC", "GPE"),
    "ORG": (
        "LANGUAGE", "RACE", "RELIGION", "NORP", "UNION",
        "SOC_ECO_CLASS", "POLITICAL_PARTY",
    ),
}


def merge_wikiann_overrides(
    word2cat: DataFrame, wikiann: DataFrame
) -> DataFrame:
    """J4: (word, category) built lexicon x (word, category) wikiann gold
    -> merged (word, category) with the reference's keep-existing guard.
    Broadcast-sized right side (wikiann is ~10^5 rows/lang)."""
    keep_cond = F.lit(False)
    for wk_cat, existing in WIKIANN_KEEP_EXISTING.items():
        keep_cond = keep_cond | (
            (F.col("wk_cat") == wk_cat) & F.col("category").isin(list(existing))
        )
    wk = wikiann.select("word", F.col("category").alias("wk_cat"))
    return (
        word2cat.join(wk, "word", "full_outer")
        .withColumn(
            "category",
            F.when(F.col("wk_cat").isNull(), F.col("category"))
            .when(F.col("category").isNull(), F.col("wk_cat"))
            .when(keep_cond, F.col("category"))
            .otherwise(F.col("wk_cat")),
        )
        .select("word", "category")
    )


def hypernym_closure(
    edges: DataFrame, max_depth: int = 8
) -> DataFrame:
    """G2 — transitive hypernym/hyponym closure
    (wn.synset(...).closure(hyponyms), ontology_builder.py:522,692-706)
    as iterative DataFrame doubling instead of an in-memory graph walk.

    edges: (child, parent) direct edges. Returns (descendant, ancestor,
    depth) for every ancestor within ``max_depth`` hops — path doubling
    (reach(2k) = reach(k) JOIN reach(k)) needs only ceil(log2(depth))
    shuffles, so a depth-8 taxonomy closes in 3 joins. Used to expand a
    category seed set to all leaf descendants (the reference collects
    lemmas of leaf hyponyms)."""
    reach = (
        edges.select(
            F.col("child").alias("descendant"),
            F.col("parent").alias("ancestor"),
            F.lit(1).alias("depth"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hops = 1
    while hops < max_depth:
        nxt = (
            reach.alias("a")
            .join(
                reach.alias("b"),
                F.col("a.ancestor") == F.col("b.descendant"),
            )
            .select(
                F.col("a.descendant").alias("descendant"),
                F.col("b.ancestor").alias("ancestor"),
                (F.col("a.depth") + F.col("b.depth")).alias("depth"),
            )
            .filter(F.col("depth") <= max_depth)
        )
        merged = (
            reach.unionByName(nxt)
            .groupBy("descendant", "ancestor")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if merged.count() == reach.count():
            reach = merged
            break
        reach = merged
        hops *= 2
    return reach


def leaf_descendants(edges: DataFrame, roots: DataFrame, max_depth: int = 8) -> DataFrame:
    """Leaves under each root category — the reference's
    ``closure(hyponyms) if not d.hyponyms()`` filter: descendants of the
    root that are not themselves parents."""
    closure = hypernym_closure(edges, max_depth)
    parents = edges.select(F.col("parent").alias("descendant")).distinct()
    return (
        closure.join(roots.select(F.col("root").alias("ancestor")), "ancestor")
        .join(parents, "descendant", "left_anti")
        .select(F.col("ancestor").alias("root"), F.col("descendant").alias("leaf"))
        .distinct()
    )


def build_word2ner(words: DataFrame, max_rows: int = 20_000_000) -> list[list]:
    """(word, category) DataFrame -> [word, label, weight, idx] records
    (the matcher seed format, ontology_manager.py:395-411). Collects to
    the driver — the lexicon is the SMALL side by design (broadcast to
    every matcher worker), so this is the one sanctioned collect.

    ``max_rows`` guards the full-scale run: past it the limit+1 probe
    raises instead of streaming an unbounded lexicon through the driver
    (at the reference's 8.5M surface forms this path is already hundreds
    of MB; an unguarded collect OOMs late and silently). The alternative
    at that scale is the map-side join sanctioned by SURVEY §1.1/§1.5:
    keep the lexicon AS a DataFrame and equi-join mentions on the
    normalized surface form instead of broadcasting a python list."""
    rows = (
        words.filter(F.col("category").isNotNull())
        .select("word", "category")
        .distinct()
        .orderBy("word")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"build_word2ner: lexicon exceeds max_rows={max_rows}; "
            "driver-side collect would risk an OOM. Use the map-side "
            "join path (join mentions to the word table on the "
            "normalized form) instead of a broadcast list."
        )
    return [[r["word"], r["category"], 0.0, i] for i, r in enumerate(rows)]


def _expand_en_candidates(
    ex: DataFrame,
    en_pivot: DataFrame,
    word2en: DataFrame,
    word2lang: DataFrame,
    cut_off_abs: int,
) -> DataFrame:
    """Shared expansion step of the reference's create_multilingual_map
    (ontology_builder.py:1095-1170): for each input English word, the
    per-language member words of its en-pivot group.

    ex: (item, key2) with key2 already normalized. Returns
    (item, key2, lang, word) where word is a kept candidate with a
    word2lang membership — the 'en' fallback/override is applied by the
    callers (the reference handles 'en' specially in every branch).

    Candidate rule (mirroring the reference, including its precedence
    quirk): word in en_pivot[key2] + [key2], kept when word == key2,
    when word has no word2en entry (the reference's `(w in word2en and
    len(word2en[w])) <= cut_off` evaluates False <= cut_off = True for
    missing words), or when its en-pivot degree <= cut_off_abs."""
    pivot_cand = (
        ex.join(en_pivot, ex["key2"] == en_pivot["en_word"])
        .select("item", "key2", en_pivot["word"].alias("cand"))
    )
    self_cand = ex.select("item", "key2", F.col("key2").alias("cand"))
    cands = pivot_cand.unionByName(self_cand).distinct()

    en_degree = word2en.groupBy("word").agg(F.count("*").alias("deg"))
    kept = (
        cands.join(en_degree, cands["cand"] == en_degree["word"], "left")
        .filter(
            (F.col("cand") == F.col("key2"))
            | F.col("deg").isNull()
            | (F.col("deg") <= cut_off_abs)
        )
        .select("item", "key2", "cand")
    )
    return (
        kept.join(word2lang, kept["cand"] == word2lang["word"])
        .select("item", "key2", "lang", word2lang["word"].alias("word"))
        .distinct()
    )


def multilingual_map(
    en_examples: DataFrame,
    en_pivot: DataFrame,
    word2en: DataFrame,
    word2lang: DataFrame,
    cut_off_abs: int = 4,
) -> DataFrame:
    """The list branch of the reference's create_multilingual_map
    (ontology_builder.py:1122-1139) as one distributed job: English
    example words per item -> per-language example words per item.

    en_examples: (item, en_word) — the exploded form of the reference's
    {item: [english words]} dict (en_pronoun2gender, person2religion).
    Returns (lang, item, word) distinct, where the 'en' rows are exactly
    the normalized input list (the reference's lang2words['en'] = words
    override; divergence: the reference keeps the RAW input strings for
    'en' — here they are normalized like every other row, documented in
    README).

    Consumers (ontology_builder.py:919-951) persist the grouped result
    per language via langdata.save_lang_data."""
    ex = en_examples.select(
        "item", normalize_word(F.col("en_word")).alias("key2")
    ).distinct()
    derived = _expand_en_candidates(ex, en_pivot, word2en, word2lang, cut_off_abs)
    non_en = derived.filter(F.col("lang") != "en").select("lang", "item", "word")
    en_rows = ex.select(F.lit("en").alias("lang"), "item", F.col("key2").alias("word"))
    return non_en.unionByName(en_rows).distinct()


def multilingual_swap_map(
    en_pairs: DataFrame,
    en_pivot: DataFrame,
    word2en: DataFrame,
    word2lang: DataFrame,
    cut_off_abs: int = 4,
) -> DataFrame:
    """The scalar (word -> word) branch of create_multilingual_map
    (ontology_builder.py:1141-1170) — binary_gender_swap — as one
    distributed job: per language, every member word of the LHS group
    maps to a member word of the RHS group.

    en_pairs: (word, swap) English pairs. Returns (lang, word, swap)
    where swap = the lexicographically smallest RHS-group member != word
    in that language (DETERMINISTIC divergence: the reference picks
    random.choice with one retry — any member is an equally valid swap
    target, so the port pins the minimum; when several input pairs give
    the same (lang, word) the minimum across them wins, where the
    reference would keep the last-processed pair). The reference's 'en'
    override (lang2words['en'] = [key]) is mirrored: 'en' rows are
    exactly the normalized input pairs."""
    pairs = en_pairs.select(
        normalize_word(F.col("word")).alias("k1"),
        normalize_word(F.col("swap")).alias("k2"),
    ).distinct().withColumn(
        "pair_id", F.concat_ws(" ", "k1", "k2")
    )
    lhs = _expand_en_candidates(
        pairs.select(F.col("pair_id").alias("item"), F.col("k1").alias("key2")),
        en_pivot, word2en, word2lang, cut_off_abs,
    ).filter(F.col("lang") != "en").select(
        F.col("item").alias("pair_id"), "lang", F.col("word").alias("w1")
    )
    rhs = _expand_en_candidates(
        pairs.select(F.col("pair_id").alias("item"), F.col("k2").alias("key2")),
        en_pivot, word2en, word2lang, cut_off_abs,
    ).filter(F.col("lang") != "en").select(
        F.col("item").alias("pair_id"), "lang", F.col("word").alias("w2")
    )
    derived = (
        lhs.join(rhs, ["pair_id", "lang"])
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("lang", F.col("w1").alias("word"))
        .agg(F.min("w2").alias("swap"))
    )
    en_rows = pairs.filter(F.col("k1") != F.col("k2")).select(
        F.lit("en").alias("lang"),
        F.col("k1").alias("word"),
        F.col("k2").alias("swap"),
    ).groupBy("lang", "word").agg(F.min("swap").alias("swap"))
    return derived.unionByName(en_rows).distinct()


def collect_lang_maps(
    mapped: DataFrame, scalar: bool = False, max_rows: int = 5_000_000
) -> dict:
    """(lang, item, word) -> {lang: {item: sorted [words]}} (or, with
    scalar=True over (lang, word, swap) rows, {lang: {word: swap}}).
    Driver-side materialization of the SMALL per-language artifacts the
    matcher broadcasts (langdata.save_lang_data consumers) — the one
    sanctioned collect, same argument as build_word2ner.

    ``max_rows`` is the loud-failure guard (see build_word2ner): a map
    past it raises instead of OOMing the driver; at that scale keep the
    rows AS a DataFrame and join on (lang, word) map-side."""

    def _bounded_rows() -> list:
        rows = mapped.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"collect_lang_maps: map exceeds max_rows={max_rows}; "
                "driver-side collect would risk an OOM. Keep the map as "
                "a DataFrame and equi-join on (lang, word) map-side "
                "(SURVEY §1.1/§1.5) instead of materializing a dict."
            )
        return rows

    out: dict = {}
    if scalar:
        for r in _bounded_rows():
            out.setdefault(r["lang"], {})[r["word"]] = r["swap"]
        return out
    for r in _bounded_rows():
        out.setdefault(r["lang"], {}).setdefault(r["item"], []).append(r["word"])
    for lang in out:
        for item in out[lang]:
            out[lang][item] = sorted(set(out[lang][item]))
    return out


def build_multilingual_lang_data(
    spark,
    edges: DataFrame,
    gender_pairs: DataFrame,
    pronoun2gender: DataFrame,
    person2religion: DataFrame,
    data_dir: str,
    cut_off_abs: int = 4,
) -> list[str]:
    """The builder stage the reference runs at ontology_builder.py:946-951:
    from parsed ConceptNet edges, build the three per-language artifacts
    (binary_gender_swap, en_pronoun2gender, person2religion) and write
    one {lang}.json per language via langdata.save_lang_data. Returns
    the written paths."""
    from .lexicon.langdata import load_lang_data, save_lang_data

    en_pivot, word2en, word2lang = synonym_pivot_tables(edges)
    swap = collect_lang_maps(
        multilingual_swap_map(gender_pairs, en_pivot, word2en, word2lang, cut_off_abs),
        scalar=True,
    )
    p2g = collect_lang_maps(
        multilingual_map(pronoun2gender, en_pivot, word2en, word2lang, cut_off_abs)
    )
    p2r = collect_lang_maps(
        multilingual_map(person2religion, en_pivot, word2en, word2lang, cut_off_abs)
    )
    paths = []
    for lang in sorted(set(swap) | set(p2g) | set(p2r)):
        data = load_lang_data(data_dir, lang)
        if lang in swap:
            data["binary_gender_swap"] = swap[lang]
        if lang in p2g:
            data["en_pronoun2gender"] = p2g[lang]
        if lang in p2r:
            data["person2religion"] = p2r[lang]
        paths.append(save_lang_data(data_dir, lang, data))
    return paths


# The per-language name-list keys the reference normalizes at merge time
# (ontology_builder.py:1052-1059): only these get the word normalizer;
# extra labels (e.g. OTHER_PRONOUN) are stored verbatim.
NAME_LIST_KEYS = (
    "FIRST_NAME_MALE",
    "FIRST_NAME_FEMALE",
    "FIRST_NAME",
    "LAST_NAME_MALE",
    "LAST_NAME_FEMALE",
    "LAST_NAME",
    "PREFIX_MALE",
    "PREFIX_FEMALE",
    "SUFIX_MALE",
    "SUFIX_FEMALE",
)


def name_list_tables(
    providers: DataFrame,
    word2ner: DataFrame,
    word2lang: DataFrame,
    ontology: DataFrame | None = None,
) -> DataFrame:
    """S6 builder side — the per-language name-list export
    (ontology_builder.py:954-1050) as one distributed job.

    The reference walks faker locale providers on the driver, folding
    each provider's first/last-name lists into ``lang2person`` keyed by
    the locale's language prefix, then merges in "extra" words from
    ``word2ner``: OTHER_PRONOUN rows always join their word's languages;
    any other label joins only when the ontology disagrees with it
    (``in_ontology(word) != label``, ontology_builder.py:1028-1041).
    faker is absent from this environment, so the provider walk becomes
    a *table*: ``providers`` is (locale, key, word) rows — the exact
    information the driver loop extracts — and everything downstream is
    joins + distinct.

    Inputs:
      * providers (locale, key, word) — e.g. ('en_US', 'FIRST_NAME_MALE', 'John')
      * word2ner  (word, label)
      * word2lang (word, lang) — from :func:`synonym_pivot_tables`
      * ontology  (word, label) — the in_ontology view; None = empty.
        PRECONDITION: functional — at most one label per word, like the
        reference's in_ontology single answer (ontology_manager.py:550).
        With several labels per word this left join includes the word
        when ANY label disagrees, where the reference's behavior would
        depend on the one label its lookup returns.

    Output: (lang, key, word) distinct, with :func:`normalize_word`
    applied exactly to the reference's name keys (NAME_LIST_KEYS) and
    not to extra labels.

    Documented divergence from the reference: its 'sw' bantu-surname
    insert writes into the *previous* loop iteration's dict (the ``ret``
    rebind at ontology_builder.py:1044 happens after the insert) — a
    driver-loop aliasing bug we do not reproduce; static surname lists
    belong to the caller (see build_name_lang_data's static_names).

    Scale shape: providers and word2ner are lexicon-small (broadcast
    side); word2lang is the big side and is touched once with an
    equi-join on word — no driver loop, no collect until the artifact
    write."""
    prov = providers.select(
        F.split(F.col("locale"), "_").getItem(0).alias("lang"),
        F.col("key"),
        F.col("word"),
    )
    joined = word2ner.join(word2lang, "word")
    pron = joined.filter(F.col("label") == "OTHER_PRONOUN").select(
        "lang", F.col("label").alias("key"), "word"
    )
    other = joined.filter(F.col("label") != "OTHER_PRONOUN")
    if ontology is not None:
        onto = ontology.select(
            "word", F.col("label").alias("onto_label")
        ).distinct()
        other = other.join(onto, "word", "left").filter(
            F.col("onto_label").isNull() | (F.col("onto_label") != F.col("label"))
        )
    extras = other.select("lang", F.col("label").alias("key"), "word")
    allrows = prov.unionByName(pron).unionByName(extras)
    name_key = F.col("key").isin(*NAME_LIST_KEYS)
    return (
        allrows.select(
            "lang",
            "key",
            F.when(name_key, normalize_word(F.col("word")))
            .otherwise(F.col("word"))
            .alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )


def build_name_lang_data(
    providers: DataFrame,
    word2ner: DataFrame,
    word2lang: DataFrame,
    data_dir: str,
    ontology: DataFrame | None = None,
    static_names: dict | None = None,
) -> list[str]:
    """Materialize :func:`name_list_tables` into the per-language
    ``{lang}.json`` artifacts (the json.dump loop at
    ontology_builder.py:1040-1072), merging with any keys already
    present (e.g. the gender/pronoun/religion maps written by
    :func:`build_multilingual_lang_data`). ``static_names`` is
    {lang: {key: [words]}} for static lists like the reference's bantu
    surnames; they pass through the same name-key normalizer."""
    from .lexicon.langdata import load_lang_data, save_lang_data

    out: dict = {}
    for r in name_list_tables(providers, word2ner, word2lang, ontology).collect():
        out.setdefault(r["lang"], {}).setdefault(r["key"], []).append(r["word"])
    for lang, keys in (static_names or {}).items():
        for key, words in keys.items():
            if key in NAME_LIST_KEYS:
                # drop words that normalize to empty (e.g. "."), matching
                # the distributed job's word != '' filter and the oracle
                words = [
                    w2
                    for w2 in (
                        w.replace(" ", "_").replace("-", "_").lower().strip(".")
                        for w in words
                    )
                    if w2
                ]
            out.setdefault(lang, {}).setdefault(key, []).extend(words)
    paths = []
    for lang in sorted(out):
        data = load_lang_data(data_dir, lang)
        for key in sorted(out[lang]):
            data[key] = sorted(set(data.get(key, []) + out[lang][key]))
        paths.append(save_lang_data(data_dir, lang, data))
    return paths
