"""Pure-Python lexicon matcher — the behavioral oracle for extraction.

Clean-room, Spark-free reimplementation of the reference matcher
semantics (ontocord/kawa, /root/reference/ontology/ontology_manager.py):

* ``canonical_word``             <- ontology_manager.py:333-359
* shingle generation             <- ontology_manager.py:258-294
* cascade lexicon build          <- ontology_manager.py:361-548
* membership probe (in_lexicon)  <- ontology_manager.py:550-622
* greedy detect / tokenize       <- ontology_manager.py:656-779

This module is imported both by the Spark extraction operator (inside
``mapInPandas`` batches, one matcher per executor process) and by the
tests' single-process oracle, so "byte-identical extracted text per url"
(BASELINE.json:15) is defined by exactly one implementation.

Behavioral quirks Q1-Q8 (SURVEY.md Appendix A) are reproduced
deliberately. Documented divergences from the reference, all required
for determinism or because the reference code path is unrunnable
(SURVEY.md Appendix B):

* D1: a seeded ``random.Random`` replaces the reference's unseeded
  ``random.sample`` in the cascade requeue (ontology_manager.py:481).
* D2: requeued indices are drained in sorted order (the reference
  iterates a ``set`` of ints, order unspecified; ontology_manager.py:518).
* D3: lexicon state is per-instance, not class-global.
* D4: the mt5 subword tokenizer is replaced by the deterministic
  segmenter in ``lexicon/cjk.py`` (transformers unavailable here).
* D5: only string labels are supported (the reference's list-label
  branch references undefined variables; ontology_manager.py:446-453).
"""

from __future__ import annotations

import gzip
import itertools
import json
import math
import random
from collections import Counter, OrderedDict

from .cjk import cjk_detect, cjk_tokenize_text, cjk_tokenize_word, lang_is_cjk
from .stopwords import stopwords_for
from .tags import DEFAULT_LABEL2LABEL, upper_ontology_with_index

TRANNUM = str.maketrans("0123456789", "1111111111")

# Reference default_strip_chars (ontology_manager.py:85).
DEFAULT_STRIP_CHARS = "-,~`.?!@#$%^&*(){}[]|\\/-_+=<>;'\" ,،、“”《》«»!:;?。…．"

_PERSON_LIKE = ("PUBLIC_FIGURE", "PERSON", "ORG", "GPE")


class KawaMatcher:
    """Prefix-shingle cascade lexicon + greedy maximal-munch tagger."""

    base_name = "base"

    def __init__(
        self,
        target_lang: str = "",
        word2ner: list | None = None,
        *,
        stopwords: set[str] | None = None,
        upper_ontology: dict | None = None,
        label2label: dict | None = None,
        tag_type: set[str] | None = None,
        connector: str = "_",
        compound_word_step: int = 3,
        word_shingle_cutoff: int = 3,
        strip_chars: str | None = None,
        seed: int = 42,
    ):
        self.target_lang = target_lang
        # -1: sniff per string; 1/0: fixed by target language
        # (ontology_manager.py:107)
        self.is_cjk = -1 if target_lang == "" else (1 if lang_is_cjk(target_lang) else 0)
        self.stopwords = stopwords_for(target_lang) if stopwords is None else set(stopwords)
        self.connector = connector
        self.compound_word_step = compound_word_step
        self.word_shingle_cutoff = word_shingle_cutoff
        self.strip_chars = DEFAULT_STRIP_CHARS if strip_chars is None else strip_chars
        self.strip_chars_set = set(self.strip_chars)
        self.label2label = dict(DEFAULT_LABEL2LABEL if label2label is None else label2label)
        self.upper_ontology = upper_ontology_with_index(upper_ontology)
        self.tag_type = tag_type
        self.target_lang_lexicon: dict[str, str] = {}
        self.ontology: OrderedDict[str, dict] = OrderedDict()
        self._max_idx = 0
        self._rng = random.Random(seed)
        # read-path memos (invalidated on lexicon mutation): candidate
        # windows and prefixes repeat massively across a corpus, so the
        # probe/bounds work runs once per distinct key per process
        self._bounds_cache: dict[str, tuple[int, int]] = {}
        self._probe_cache: dict[tuple, tuple[str, str | None]] = {}
        if word2ner:
            self.add_word2ner([list(r) for r in word2ner])

    # ------------------------------------------------------------------
    # normalization
    # ------------------------------------------------------------------

    def level_cutoff(self, level: int) -> int:
        """Cascade shingle cutoffs 3, 6, 15, 30 (ontology_manager.py:329-331)."""
        return self.word_shingle_cutoff * (1 + level * level)

    def canonical_word(
        self,
        word: str,
        connector: str | None = None,
        suppress_cjk_tokenize: bool = False,
        do_lower: bool = False,
        do_trannum: bool = False,
    ) -> tuple[str, list[str]]:
        """Connector splice + strip + leading-stopword pop
        (ontology_manager.py:333-359). Stopword comparison is
        case-sensitive on purpose (quirk: "The" survives, "the" is
        stripped)."""
        if connector is None:
            connector = self.connector
        is_cjk = cjk_detect(word) if self.is_cjk < 0 else self.is_cjk
        if not suppress_cjk_tokenize and is_cjk:
            word = cjk_tokenize_word(word, connector)
        orig_word = word = (
            word.replace(" ", connector)
            .replace(connector + connector, connector)
            .strip(self.strip_chars + connector)
            .replace("__", connector)
        )
        if do_lower:
            word = word.lower()
        if do_trannum:
            word = word.translate(TRANNUM)
        word_arr = word.split(connector)
        while word_arr and word_arr[0] in self.stopwords:
            word_arr = word_arr[1:]
        word = connector.join(word_arr).replace("__", connector).replace(
            connector + connector, connector
        )
        if not word:
            return orig_word, orig_word.split(connector)
        return word, word_arr

    def _has_nonstopword(self, word_arr: list[str]) -> bool:
        return any(w.strip(self.strip_chars) not in self.stopwords for w in word_arr)

    def _shingles(
        self, word_arr: list[str], cutoff: int | None = None, more_shingles: bool = True
    ) -> list[list[str]]:
        """Prefix/suffix pattern variants (ontology_manager.py:258-294).
        Note: in the >compound_word_step branch the reference star-suffixes
        an already-truncated word, so the "more" variants are identical to
        the base ones — reproduced here via the same operation order."""
        n = len(word_arr)
        word_arr = [w.lower() for w in word_arr]
        if cutoff is None:
            cutoff = self.word_shingle_cutoff
        step = self.compound_word_step

        def trunc(arr: list[str]) -> list[str]:
            return [w if len(w) <= cutoff else w[:cutoff] for w in arr]

        def star_tail(arr: list[str]) -> list[str]:
            arr = list(arr)
            last = arr[-1]
            if len(last) > cutoff:
                arr[-1] = "*" + last[len(last) - cutoff + 1 :]
            return arr

        out: OrderedDict[tuple, int] = OrderedDict()
        if n > step:
            a1 = trunc(word_arr[: step - 1] + [word_arr[-1]])
            a2 = trunc([word_arr[0]] + word_arr[1 - step :])
            out[tuple(a1)] = 1
            out[tuple(a2)] = 1
            if more_shingles:
                out[tuple(trunc(star_tail(a1)))] = 1
                out[tuple(trunc(star_tail(a2)))] = 1
        else:
            out[tuple(trunc(word_arr))] = 1
            if n > 1 and more_shingles:
                out[tuple(trunc(star_tail(word_arr)))] = 1
        return [list(t) for t in out]

    # ------------------------------------------------------------------
    # lexicon build (precision cascade)
    # ------------------------------------------------------------------

    def add_word2ner(
        self,
        word2ner: list[list],
        word_shingle_cutoff: int | None = None,
        onto_name: str | None = None,
        keep_idx: bool = False,
        full_word2ner: list[list] | None = None,
        depth: int = 4,
        max_depth: int = 4,
        weight_factors: dict | None = None,
    ) -> None:
        """Build one cascade level from ``[word, label, weight?, idx?]``
        records, requeue conflicting records to the next level, and store
        stragglers in a final exact-match level
        (ontology_manager.py:361-548).

        ``idx`` must be the record's position in the full word2ner list
        (the reference indexes ``full_word2ner[idx]``)."""
        if weight_factors is None:
            weight_factors = {"PERSON": 5}
        if onto_name is None:
            onto_name = self.base_name
        if word_shingle_cutoff is None:
            word_shingle_cutoff = self.level_cutoff(len(self.ontology))
        level_key = onto_name + str(max_depth - depth)
        ontology = self.ontology.setdefault(level_key, {})
        self._bounds_cache.clear()
        self._probe_cache.clear()
        step = self.compound_word_step
        connector = self.connector

        for rec in word2ner:
            if len(rec) >= 4:
                self._max_idx = max(self._max_idx, rec[3])
        for rec in word2ner:
            word, _ = self.canonical_word(rec[0], connector, do_lower=True)
            rec[0] = word
            if len(rec) >= 4:
                continue
            if len(rec) == 3:
                rec.append(self._max_idx)
                self._max_idx += 1
            elif len(rec) == 2:
                rec.extend([0.0, self._max_idx])
                self._max_idx += 1

        if full_word2ner is None:
            full_word2ner = word2ner

        lexicon: dict[tuple[str, int], list] = {}
        for word, label, orig_weight, idx in word2ner:
            label = label.upper()
            # digit folding for the lookup key only (quirk Q8)
            lookup = word.translate(TRANNUM)
            word_arr = lookup.split(connector)
            orig_lens = len(lookup) + len(word_arr)
            # surrogate frequency weight (ontology_manager.py:428-432)
            if orig_weight:
                weight = orig_weight + 1 / (1.0 + math.sqrt(orig_lens))
            else:
                weight = 1 + 1 / (1.0 + math.sqrt(orig_lens))
                weight *= weight_factors.get(label, 1.0)
            n = len(word_arr)
            bucket = n // (step + 1)
            if n == 0:
                continue
            for shingle in self._shingles(
                word_arr, cutoff=word_shingle_cutoff, more_shingles=idx % 5 == 0
            ):
                if not shingle:
                    continue
                key = (connector.join(shingle), bucket)
                entry = lexicon.get(key)
                if entry is None:
                    entry = lexicon[key] = [[label], {}, {}]
                entry[1][label] = entry[1].get(label, []) + [idx]
                entry[2][label] = entry[2].get(label, 0.0) + weight
                # ngram scan bounds per first-shingle-word
                # (ontology_manager.py:460-462)
                prev = ontology.get(shingle[0], [1, 100])
                ontology[shingle[0]] = [
                    max(n, prev[0]),
                    2 if n == 2 else min(max(n - 1, 1), prev[1]),
                ]

        # majority vote per shingle key; losers requeue to the next level
        # (ontology_manager.py:467-493)
        requeue: list[int] = []
        drop_keys: list[tuple] = []
        for key, entry in lexicon.items():
            cnt = entry[2]
            if not cnt:
                continue
            label = Counter(cnt).most_common(1)[0][0]
            entry[0] = [label]
            right_idx = entry[1][label]
            wrong_idx = list(
                itertools.chain(*[v for k, v in entry[1].items() if k != label])
            )
            if len(wrong_idx) > len(right_idx):
                requeue.extend(right_idx + wrong_idx)
                drop_keys.append(key)
            elif wrong_idx:
                requeue.extend(wrong_idx + self._rng.sample(right_idx, len(wrong_idx)))
                lexicon[key] = entry[:2] if keep_idx else entry[:1]
            else:
                lexicon[key] = entry[:2] if keep_idx else entry[:1]
        for key in drop_keys:
            del lexicon[key]

        # attach surviving patterns under their prefix record
        # (ontology_manager.py:495-510)
        for (word_shingle, bucket), val in lexicon.items():
            prefix = word_shingle.split(connector, 1)[0]
            rec = ontology.get(prefix)
            if rec is None:
                continue
            if len(rec) == 2:
                rec.extend([{}, {}, {}, {}])
            if connector in word_shingle:
                pattern = "*" + connector + word_shingle.split(connector, 1)[1]
            else:
                pattern = "*"
            rec[2 + min(3, bucket)][pattern] = val

        # prune prefixes that kept only scan bounds
        # (ontology_manager.py:512-516)
        for key in [k for k, v in ontology.items() if len(v) <= 2]:
            del ontology[key]

        requeue_set = set(requeue)
        if depth > 1:
            if len(requeue_set) > len(word2ner) / 2:
                # too noisy: reset this level, retry everything deeper
                self.ontology[level_key] = {}
                next_word2ner = word2ner
            else:
                next_word2ner = [full_word2ner[i] for i in sorted(requeue_set)]
            self.add_word2ner(
                next_word2ner,
                onto_name=onto_name,
                full_word2ner=full_word2ner,
                depth=depth - 1,
                max_depth=max_depth,
            )
        if depth == 1:
            # final exact-match level for everything still mislabeled
            # (ontology_manager.py:528-547)
            wrong: list[list] = []
            wrong_none: list[list] = []
            for rec in full_word2ner:
                _, found = self.in_lexicon(rec[0], check_person_org_gpe_caps=False)
                if rec[1] != found:
                    (wrong_none if not found else wrong).append(rec)
            if wrong or wrong_none:
                exact: dict[str, list] = {}
                for rec in wrong + wrong_none:
                    if keep_idx:
                        exact[rec[0]] = [0, 0, {"*": [[rec[1]], rec[-1]]}]
                    else:
                        exact[rec[0]] = [0, 0, {"*": [[rec[1]]]}]
                for rec in wrong + wrong_none:
                    folded = rec[0].translate(TRANNUM)
                    if keep_idx:
                        exact[folded] = [0, 0, {"*": [[rec[1]], rec[-1]]}]
                    else:
                        exact[folded] = [0, 0, {"*": [[rec[1]]]}]
                self.ontology[onto_name + str(max_depth)] = exact
                # the in_lexicon probes above memoized PRE-correction
                # results; the exact level exists precisely to change
                # them, so the caches must not outlive this mutation
                self._bounds_cache.clear()
                self._probe_cache.clear()

    # ------------------------------------------------------------------
    # lexicon persistence (S5) + target-language lexicon (J5)
    # ------------------------------------------------------------------

    def set_target_lang_lexicon(self, word2label: dict[str, str]) -> None:
        """Install the per-language override lexicon probed FIRST by
        in_lexicon (ontology_manager.py:556-563): keys are canonical
        lowercase forms (digit-folded variants are added automatically,
        matching the word/word0 probe pair). Clears the probe memo —
        this changes probe results."""
        lex: dict[str, str] = {}
        for word, label in word2label.items():
            w, _ = self.canonical_word(word, do_lower=True)
            lex[w] = label
            lex[w.translate(TRANNUM)] = label
        self.target_lang_lexicon = lex
        self._probe_cache.clear()
        self._bounds_cache.clear()

    def save(self, path: str) -> None:
        """Persist the BUILT cascade as gzip JSON — the reference's
        ontology.json.gz artifact (ontology_manager.py:219-229) with the
        build config alongside, so a load skips the full add_word2ner
        rebuild (at ~10^7 surface forms the rebuild is a real per-job
        cost) and still reproduces probe-identical behavior."""
        state = {
            "format": "kawa_spark_lexicon_v1",
            "target_lang": self.target_lang,
            "connector": self.connector,
            "compound_word_step": self.compound_word_step,
            "word_shingle_cutoff": self.word_shingle_cutoff,
            "strip_chars": self.strip_chars,
            "max_idx": self._max_idx,
            "target_lang_lexicon": self.target_lang_lexicon,
            "ontology": self.ontology,
        }
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wt", encoding="utf8") as f:
            json.dump(state, f)

    @classmethod
    def load(cls, path: str, **overrides) -> "KawaMatcher":
        """Inverse of save (ontology_manager.py:176-217). The cascade is
        installed as-is; no rebuild. ``overrides`` pass through to the
        constructor (stopwords, tag_type, ...)."""
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf8") as f:
            state = json.load(f)
        if state.get("format") != "kawa_spark_lexicon_v1":
            raise ValueError(f"{path}: not a kawa_spark lexicon file")
        m = cls(
            overrides.pop("target_lang", state["target_lang"]),
            connector=state["connector"],
            compound_word_step=state["compound_word_step"],
            word_shingle_cutoff=state["word_shingle_cutoff"],
            strip_chars=state["strip_chars"],
            **overrides,
        )
        m.ontology = OrderedDict(state["ontology"])
        m.target_lang_lexicon = dict(state["target_lang_lexicon"])
        m._max_idx = state["max_idx"]
        return m

    # ------------------------------------------------------------------
    # membership probe
    # ------------------------------------------------------------------

    @staticmethod
    def _person_like(label: list) -> bool:
        return any(l in label for l in _PERSON_LIKE)

    def in_lexicon(
        self,
        word: str,
        connector: str | None = None,
        suppress_cjk_tokenize: bool = False,
        check_person_org_gpe_caps: bool = True,
    ) -> tuple[str, str | None]:
        """Probe target-language lexicon, then cascade levels deepest-first
        (ontology_manager.py:550-622). Returns (word, label|None).

        Results are memoized per exact argument tuple — the probe is a
        pure function of the (immutable-between-builds) lexicon."""
        key = (word, connector, suppress_cjk_tokenize, check_person_org_gpe_caps)
        hit = self._probe_cache.get(key)
        if hit is not None:
            return hit
        out = self._in_lexicon(
            word, connector, suppress_cjk_tokenize, check_person_org_gpe_caps
        )
        if len(self._probe_cache) >= 1_000_000:  # bound worker memory
            self._probe_cache.clear()
        self._probe_cache[key] = out
        return out

    def _in_lexicon(
        self,
        word: str,
        connector: str | None = None,
        suppress_cjk_tokenize: bool = False,
        check_person_org_gpe_caps: bool = True,
    ) -> tuple[str, str | None]:
        orig_word = word
        step = self.compound_word_step
        if connector is None:
            connector = self.connector
        is_cjk = cjk_detect(word) if self.is_cjk < 0 else self.is_cjk
        word, word_arr = self.canonical_word(
            word, connector, suppress_cjk_tokenize, do_lower=False
        )
        if not word_arr or not word_arr[0] or not word_arr[-1]:
            return word, None
        # caps gate evaluated on the pre-lowercase form (quirk Q5)
        is_caps = (
            word_arr[0][0] == word_arr[0][0].upper()
            and word_arr[-1][0] == word_arr[-1][0].upper()
        )
        word = word.lower()
        word0 = word.translate(TRANNUM)
        word1 = word2 = None
        for probe in (word, word0):
            if probe in self.target_lang_lexicon:
                return orig_word, self.target_lang_lexicon[probe]
        if is_cjk:
            word1 = word.replace(connector, "")
            word2 = word1.translate(TRANNUM)
            for probe in (word1, word2):
                if probe in self.target_lang_lexicon:
                    return orig_word, self.target_lang_lexicon[probe]

        n_levels = len(self.ontology)
        lookup_len = len(word_arr) // (step + 1)
        for level, ontology in reversed(list(enumerate(self.ontology.values()))):
            if not ontology:
                continue
            if level == n_levels - 1:
                # exact-word probe on the deepest level; for CJK only the
                # connector-stripped variants are probed (reference
                # operator-precedence quirk, ontology_manager.py:589)
                exact_probes = [[word], [word0]] if not is_cjk else [[word1], [word2]]
                for sh in exact_probes:
                    if sh and sh[0] in ontology:
                        dat = ontology[sh[0]][2].get("*", (None, None))
                        label = dat[0]
                        if label is not None:
                            if (
                                check_person_org_gpe_caps
                                and not is_caps
                                and self._person_like(label)
                            ):
                                continue
                            return word, label[0]
            for sh in self._shingles(
                word_arr, cutoff=self.level_cutoff(level), more_shingles=not is_cjk
            ):
                if sh and sh[0] in ontology:
                    rec = ontology[sh[0]]
                    if len(rec) < 2 + min(3, lookup_len) + 1:
                        continue
                    lex = rec[2 + min(3, lookup_len)]
                    if len(sh) > 1:
                        pattern = "*" + connector + connector.join(sh[1:])
                    else:
                        pattern = "*"
                    dat = lex.get(pattern, (None, None))
                    label = dat[0]
                    if label is not None:
                        if (
                            check_person_org_gpe_caps
                            and not is_caps
                            and self._person_like(label)
                        ):
                            continue
                        return word, label[0]
        return orig_word, None

    # ------------------------------------------------------------------
    # greedy detection + splice
    # ------------------------------------------------------------------

    def _ngram_bounds(self, start_word: str) -> tuple[int, int]:
        """Zone-map-style scan bounds for compounds starting with a prefix
        (ontology_manager.py:656-663). Memoized per prefix."""
        hit = self._bounds_cache.get(start_word)
        if hit is not None:
            return hit
        lo, hi = -1, 100000
        for ontology in self.ontology.values():
            rec = ontology.get(start_word, [lo, hi])
            lo, hi = max(lo, rec[0]), min(hi, rec[1])
        self._bounds_cache[start_word] = (lo, hi)
        return lo, hi

    def cjk_text(self, text: str) -> str:
        return cjk_tokenize_text(text, self.strip_chars_set)

    def detect(
        self,
        text: str,
        connector: str | None = None,
        suppress_cjk_tokenize: bool = False,
        check_person_org_gpe_caps: bool = True,
        collapse_consecutive_ner: set[str] | None = None,
    ) -> dict[tuple, str]:
        """Greedy maximal-munch tagging (ontology_manager.py:665-756).
        Returns {(chunk, start, end): label}. Offsets assume single-space
        joining (quirk Q2); the final token never starts a match (Q1)."""
        cutoff = self.word_shingle_cutoff
        labels: list[list] = []
        if connector is None:
            connector = self.connector
        if not suppress_cjk_tokenize and cjk_detect(text):
            text = self.cjk_text(text)
        sent: list = text.strip().split()
        len_sent = len(sent)
        pos = 0
        for i in range(len_sent - 1):
            if sent[i] is None:
                continue
            start_word = sent[i].lower().lstrip(self.strip_chars)
            if start_word in self.stopwords:
                pos += len(sent[i]) + 1
                continue
            start_word = start_word.translate(TRANNUM).split(connector)[0]
            if len(start_word) > cutoff:
                start_word = start_word[:cutoff]
            lo, hi = self._ngram_bounds(start_word)
            if lo > 0:
                for j in range(lo - 1, hi - 2, -1):
                    if len_sent - i > j:
                        word_arr = sent[i : i + 1 + j]
                        new_word = " ".join(word_arr).strip(self.strip_chars)
                        if not self._has_nonstopword(word_arr):
                            break
                        if word_arr[-1].lower() in self.stopwords:
                            continue
                        _, label = self.in_lexicon(
                            new_word,
                            connector=connector,
                            suppress_cjk_tokenize=True,
                            check_person_org_gpe_caps=check_person_org_gpe_caps,
                        )
                        if label is None:
                            continue
                        # abbreviation dot restore (quirk Q6)
                        last = sent[i + j]
                        if last[-1] == "." and 1 < len(last) <= 3:
                            new_word = new_word + "."
                        label = self.label2label.get(label, label)
                        if (
                            self.tag_type is None or label in self.tag_type
                        ) and label in self.upper_ontology:
                            new_word = new_word.replace(" ", connector)
                            if new_word not in self.stopwords:
                                sent[i] = new_word
                                labels.append(
                                    [[new_word, pos, pos + len(new_word)], label]
                                )
                                for k in range(i + 1, i + j + 1):
                                    sent[k] = None
                                break
                        else:
                            # unlabeled hits still fuse tokens (quirk Q7)
                            if len(new_word) < 20 and new_word.count(" ") < 3:
                                if new_word not in self.stopwords:
                                    sent[i] = new_word
                                    for k in range(i + 1, i + j + 1):
                                        sent[k] = None
                                    break
            pos += len(sent[i]) + 1

        if collapse_consecutive_ner is not None:
            prev = None
            merged: list[list] = []
            for lab in labels:
                if (
                    prev
                    and lab[1] == prev[1]
                    and prev[1] in collapse_consecutive_ner
                    and (prev[0][2] == lab[0][1] or prev[0][2] == lab[0][1] - 1)
                ):
                    if prev[0][2] == lab[0][1] - 1:
                        ch = text[lab[0][1] - 1]
                        merged[-1][0][0] += (connector if ch == " " else ch) + lab[0][0]
                    else:
                        merged[-1][0][0] += lab[0][0]
                    merged[-1][0][2] = lab[0][2]
                    prev = lab
                    continue
                prev = lab
                merged.append(lab)
            labels = merged

        return dict([(tuple(a), b) for a, b in labels])

    def tokenize(
        self,
        text: str,
        connector: str | None = None,
        suppress_cjk_tokenize: bool = False,
        return_dict: bool = True,
        check_person_org_gpe_caps: bool = True,
        collapse_consecutive_ner: set[str] | None = None,
    ):
        """Splice detected chunks back into the *original* text at the
        detector's offsets (ontology_manager.py:758-779; quirks Q2/Q3).
        The returned text is the byte-identity target."""
        ner = self.detect(
            text,
            connector=connector,
            suppress_cjk_tokenize=suppress_cjk_tokenize,
            check_person_org_gpe_caps=check_person_org_gpe_caps,
            collapse_consecutive_ner=collapse_consecutive_ner,
        )
        if connector is None:
            connector = self.connector
        parts: list[str] = []
        prev = 0
        for span in ner:
            chunk = span[0].replace(" ", connector)
            if span[1] > 0:
                parts.append(text[prev : span[1]])
            parts.append(chunk)
            prev = span[2]
        parts.append(text[prev:])
        text2 = "".join(parts)
        if return_dict:
            return {"text": text2, "chunk2ner": ner}
        return text2
