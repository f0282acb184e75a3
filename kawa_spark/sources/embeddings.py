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


def clean_embed_word(col) -> "F.Column":
    """cleanup_word (kb.py:1160-1181), natively: # -> 1, -|= -> _,
    collapse __ runs, collapse .... runs, strip _, digit-fold words
    longer than 4 that start AND end with a digit."""
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
) -> DataFrame:
    """word2vec TEXT format -> (word, vec array<float>, cnt int).

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
    w = clean_embed_word(F.substring(F.col("raw_word"), 1, max_word_size))
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
    w = clean_embed_word(F.col("raw_word"))
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


def embeddings_dict(df: DataFrame) -> dict[str, np.ndarray]:
    """(word, vec, ...) -> {word: float32 array} for the scoring
    broadcast (scoring.make_cosine_udf). The embedding table is the
    SMALL side by design — this is the sanctioned collect."""
    return {
        r["word"]: np.asarray(r["vec"], dtype=np.float32)
        for r in df.select("word", "vec").collect()
    }
