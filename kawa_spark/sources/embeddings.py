"""word2vec / GloVe embedding ingestion (S7) + vector ops (F15, A6).

The reference loads embeddings driver-side into a memmapped KB
(load_word2vec_glove_format, /root/reference/ontology/ontology_kb.py:
1153-1395). Here ingestion lands a DataFrame (word, vec, cnt):

* text format  — distributed parse: one native pass over spark.read.text
  with rank-derived frequency surrogates (the reference's
  ``vocab_size - line_no + 1`` weight, kb.py:1225).
* binary format — the record stream has no splittable boundaries
  (length-prefixed by a header only), so the byte walk is a sequential
  generator; rows land in Arrow batches and every downstream op is
  distributed. At 10^7 vocab this is an ingest-once artifact.
* cleanup      — the reference's cleanup_word (kb.py:1160-1181) as pure
  column expressions, plus its URL/email reject list (kb.py:1191).
* resize (F15) — tile-and-truncate to the target dim (kb.py:1340-1345).
* merge (A6)   — count-weighted mean across duplicate rows per word
  (save_part, kb.py:1252-1265) as an ``applyInPandas`` grouped UDAF:
  the declared Spark shape for the reference's dict-side accumulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANNUM_SRC = "0123456789"
TRANNUM_DST = "1111111111"

# substrings that reject a word outright (kb.py:1191)
_URLISH = (".co", ".org", ".gov", ".edu", "www", "http:", ".net", ".uk", ".ca")

# trailing multi-sense marker: word#N (ontology_kb.py:195-196 — patterns
# whose embeddings differ enough are stored as geo*_bu*#1 / geo*_bu*#2;
# extract_word_embeddings.py:65-73 appends #idx on short-key collisions)
_SENSE_RE = r"#(\d+)$"


def clean_embed_word(col, keep_senses: bool = False) -> "F.Column":
    """cleanup_word (kb.py:1160-1181), natively: # -> 1, -|= -> _,
    collapse __ runs, collapse .... runs, strip _, digit-fold words
    longer than 4 that start AND end with a digit.

    ``keep_senses=True`` preserves a trailing ``#N`` multi-sense marker
    (the reference's word#1/word#2 entries, ontology_kb.py:195-196)
    through the cleanup instead of folding it into a digit: the stem is
    cleaned as usual and the sense suffix re-attached verbatim. Senses
    are resolved at lookup time by :func:`resolve_senses`."""
    if keep_senses:
        stem = clean_embed_word(F.regexp_replace(col, _SENSE_RE, ""))
        suffix = F.regexp_extract(col, r"(#\d+)$", 1)
        return F.concat(stem, suffix)
    c = F.translate(col, "#", "1")
    c = F.translate(c, "-|=", "___")
    c = F.regexp_replace(c, "_{2,}", "_")
    c = F.regexp_replace(c, r"\.{4,}", r"...")
    c = F.trim(c, trim=F.lit("_"))
    folded = F.translate(c, TRANNUM_SRC, TRANNUM_DST)
    digitish = (
        (F.length(c) > 4)
        & F.substring(c, 1, 1).rlike("[0-9]")
        & F.substring(c, -1, 1).rlike("[0-9]")
    )
    return F.when(digitish, folded).otherwise(c)


def reject_embed_word(col) -> "F.Column":
    """True for words the reference drops (kb.py:1191): empty,
    email-shaped, or URL-ish."""
    cond = (col.isNull()) | (F.length(col) == 0)
    cond = cond | (col.contains("@") & col.contains("."))
    for frag in _URLISH:
        cond = cond | col.contains(frag)
    return cond


def resize_vec(vec, from_dim: int, target_dim: int):
    """F15 (kb.py:1340-1345): smaller vectors tile then truncate the
    remainder; larger vectors truncate. Pure column expression."""
    if from_dim == target_dim:
        return vec
    if from_dim > target_dim:
        return F.slice(vec, 1, target_dim)
    reps = (target_dim + from_dim - 1) // from_dim
    return F.slice(F.flatten(F.array_repeat(vec, reps)), 1, target_dim)


def read_word2vec_text(
    spark: SparkSession,
    path: str,
    target_dim: int | None = None,
    min_cnt: int = 4,
    collapse_all_cases: bool = True,
    max_word_size: int = 100,
    keep_senses: bool = False,
) -> DataFrame:
    """word2vec TEXT format -> (word, vec array<float>, cnt int).

    ``keep_senses=True`` preserves trailing ``#N`` sense markers through
    the cleanup (see :func:`clean_embed_word` / :func:`resolve_senses`).

    Line 0 is ``<vocab_size> <vector_size>``; each following line is
    ``word v1 .. vD``. The parse is one native pass; the rank weight
    cnt = max(min_cnt, vocab_size - line_no + 1) needs line numbers, so
    the one non-DataFrame step is an RDD zipWithIndex (a single
    distributed pass; order = file order, the format's contract)."""
    first = spark.read.text(path).limit(1).collect()[0][0]
    vocab_size, vector_size = map(int, first.split())

    indexed = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .filter(lambda t: t[1] > 0)
        .map(lambda t: (t[0], t[1]))
    )
    df = spark.createDataFrame(indexed, "line string, line_no long")

    parts = F.split(F.col("line"), " ")
    word = F.element_at(parts, 1)
    vec = F.transform(
        F.slice(parts, 2, vector_size), lambda x: x.cast("float")
    )
    out = df.select(
        word.alias("raw_word"),
        vec.alias("vec"),
        F.greatest(
            F.lit(min_cnt), F.lit(vocab_size) - F.col("line_no") + 1
        ).cast("int").alias("cnt"),
    )
    out = out.filter(F.size("vec") == vector_size)
    # the reference skips all-zero vectors (kb.py:1347)
    out = out.filter(
        F.aggregate("vec", F.lit(0.0), lambda a, x: a + F.abs(x)) != 0.0
    )
    w = clean_embed_word(
        F.substring(F.col("raw_word"), 1, max_word_size), keep_senses
    )
    if collapse_all_cases:
        w = F.lower(w)
    out = out.withColumn("word", w).filter(~reject_embed_word(F.col("word")))
    if target_dim is not None and target_dim != vector_size:
        out = out.withColumn("vec", resize_vec(F.col("vec"), vector_size, target_dim))
    return out.select("word", "vec", "cnt")


def _iter_word2vec_binary(path: str):
    """Sequential record walk of the binary format: header line, then
    per record ``word<space>`` + dim * float32 little-endian."""
    with open(path, "rb") as f:
        header = f.readline()
        vocab_size, dim = map(int, header.split())
        binary_len = 4 * dim
        for _ in range(vocab_size):
            chars = []
            while True:
                ch = f.read(1)
                if ch == b" ":
                    break
                if ch == b"":
                    raise EOFError("truncated word2vec binary file")
                if ch != b"\n":
                    chars.append(ch)
            word = b"".join(chars).decode("utf8", errors="replace")
            vec = np.frombuffer(f.read(binary_len), dtype="<f4")
            yield word, vec
    return


def read_word2vec_binary(
    spark: SparkSession,
    path: str,
    target_dim: int | None = None,
    min_cnt: int = 4,
    collapse_all_cases: bool = True,
    batch_rows: int = 50_000,
    keep_senses: bool = False,
) -> DataFrame:
    """word2vec BINARY format -> (word, vec, cnt). The byte walk is
    sequential by format design; batches land as Arrow frames and the
    cleanup/resize runs as the same native plan as the text reader."""
    with open(path, "rb") as f:
        vocab_size, vector_size = map(int, f.readline().split())

    rows: list[tuple] = []
    frames: list[pd.DataFrame] = []
    # start=1: record k corresponds to text-format line k (line 0 is the
    # header), keeping the rank weights identical across both readers
    for line_no, (word, vec) in enumerate(_iter_word2vec_binary(path), start=1):
        if float(np.abs(vec).sum()) == 0.0:
            continue
        rows.append((word, vec.tolist(), max(min_cnt, vocab_size - line_no + 1)))
        if len(rows) >= batch_rows:
            frames.append(pd.DataFrame(rows, columns=["raw_word", "vec", "cnt"]))
            rows = []
    if rows:
        frames.append(pd.DataFrame(rows, columns=["raw_word", "vec", "cnt"]))
    if not frames:
        return spark.createDataFrame([], "word string, vec array<float>, cnt int")
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf, "raw_word string, vec array<float>, cnt int")
    w = clean_embed_word(F.col("raw_word"), keep_senses)
    if collapse_all_cases:
        w = F.lower(w)
    out = df.withColumn("word", w).filter(~reject_embed_word(F.col("word")))
    if target_dim is not None and target_dim != vector_size:
        out = out.withColumn("vec", resize_vec(F.col("vec"), vector_size, target_dim))
    return out.select("word", "vec", "cnt")


def merge_embeddings(
    df: DataFrame,
    stopwords: set[str] | None = None,
    min_cnt: int = 4,
) -> DataFrame:
    """A6 — count-weighted mean across duplicate words (save_part,
    kb.py:1252-1265): vec = sum(v_i * cnt_i) / sum(cnt_i); the merged
    count is max(cnt) doubled for stopwords else divided by
    (compound_len) — the reference's downweighting of compounds.

    ``applyInPandas`` grouped-map: each group is one word's duplicate
    rows (case collapse, cleanup collisions, multi-source loads), so
    groups are tiny and the shuffle is by word — the same partitioning
    the broadcast-dict consumer needs."""
    stop = frozenset(stopwords or ())

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        word = key[0]
        vecs = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
        cnts = pdf["cnt"].to_numpy(dtype=np.float64)
        total = cnts.sum()
        vec = (vecs * (cnts / total)[:, None]).sum(axis=0)
        y = int(cnts.max())
        if word in stop:
            cnt = max(min_cnt, 2 * y)
        else:
            cnt = max(min_cnt, int(y / (word.count("_") + 1)))
        return pd.DataFrame(
            {"word": [word], "vec": [vec.astype(np.float32).tolist()], "cnt": [cnt]}
        )

    return df.groupBy("word").applyInPandas(
        merge, schema="word string, vec array<float>, cnt int"
    )


def resolve_senses(
    df: DataFrame,
    rule: str = "first",
    query_vec: "np.ndarray | list[float] | None" = None,
) -> DataFrame:
    """Collapse multi-sense rows (``word#N``, kept by the readers'
    ``keep_senses=True``) to ONE row per base word.

    Rules (documented resolution policy — the reference never resolves;
    its KB keeps all senses and callers pick by embedding distance,
    ontology_kb.py:195-196):

    * ``first`` — the lowest sense index wins; the bare word counts as
      sense 0 (extract_word_embeddings.py inserts the bare key first and
      only appends #idx on collision, so sense 0/lowest-N is the primary
      entry). Ties on index break on the full word string ascending.
    * ``best`` — the sense with the highest cosine similarity to
      ``query_vec`` wins (ties: lowest sense index). This is the
      reference's "different enough embeddings" discrimination turned
      into a lookup: pass the context embedding you are disambiguating
      against.

    One partial-aggregated shuffle on the base word (``min_by``/
    ``max_by``) — no window sort, no driver collect. Output schema is
    unchanged: (word, vec, cnt) with ``word`` = the base form.
    """
    base = F.regexp_replace(F.col("word"), _SENSE_RE, "")
    idx = F.coalesce(
        F.nullif(F.regexp_extract(F.col("word"), _SENSE_RE, 1), F.lit(""))
        .cast("int"),
        F.lit(0),
    )
    d = df.withColumn("_base", base).withColumn("_idx", idx)
    row = F.struct(F.col("vec").alias("vec"), F.col("cnt").alias("cnt"))
    if rule == "first":
        picked = d.groupBy("_base").agg(
            F.min_by(row, F.struct(F.col("_idx"), F.col("word"))).alias("_row")
        )
    elif rule == "best":
        if query_vec is None:
            raise ValueError("resolve_senses(rule='best') needs query_vec")
        q = [float(x) for x in np.asarray(query_vec, dtype=np.float32)]
        qcol = F.array(*[F.lit(x).cast("double") for x in q])
        dot = F.aggregate(
            F.zip_with(F.col("vec"), qcol, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        vnorm = F.sqrt(
            F.aggregate(
                F.col("vec"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        cos = F.when(vnorm == 0.0, F.lit(-2.0)).otherwise(dot / vnorm)
        picked = (
            d.withColumn("_cos", cos)
            .groupBy("_base")
            .agg(
                F.max_by(
                    row, F.struct(F.col("_cos"), (-F.col("_idx")).alias("_ni"))
                ).alias("_row")
            )
        )
    else:
        raise ValueError(f"unknown sense rule: {rule!r}")
    return picked.select(
        F.col("_base").alias("word"),
        F.col("_row.vec").alias("vec"),
        F.col("_row.cnt").alias("cnt"),
    )


def embeddings_dict(df: DataFrame, max_rows: int = 5_000_000) -> dict[str, np.ndarray]:
    """(word, vec, ...) -> {word: float32 array} for the scoring
    broadcast (scoring.make_cosine_udf). The embedding table is the
    SMALL side by design — this is the sanctioned collect.

    ``max_rows`` is the loud-failure guard for the full-scale run: a
    vocabulary past it (e.g. the reference's 8.5M-surface-form lexicon
    with high-dim vectors) would stream hundreds of MB through the
    driver and risk an OOM long after launch. The limit+1 probe bounds
    driver memory to the cap — past it, raise and point the caller at
    the map-side alternative: JOIN the mention table to the embedding
    DataFrame on ``word`` (broadcast only if Spark's own threshold
    allows), which needs no driver materialization at any scale."""
    rows = df.select("word", "vec").limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"embeddings_dict: vocabulary exceeds max_rows={max_rows}; "
            "a driver-side dict this large risks an OOM. Join mentions "
            "to the embedding DataFrame on `word` instead of "
            "broadcasting a dict (map-side join, SURVEY §1.1/§1.5)."
        )
    return {r["word"]: np.asarray(r["vec"], dtype=np.float32) for r in rows}
