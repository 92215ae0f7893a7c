"""Text analysis: normalize -> tokenize -> stop-filter -> lemmatize.

Reference pipeline parity (LemmaFinderImpl.java:19-39):
  T1 normalize (lowercase, ё->е, strip non-letters to space, split \\s+,
     LemmaFinderImpl.java:111-118)
  P2 stop-particle filter (LemmaFinderImpl.java:92-98)
  T2 lemmatize to first normal form (LemmaFinderImpl.java:26-31)

The reference uses a Russian dictionary morphology (Lucene
RussianLuceneMorphology); no morphology libraries exist in this sandbox, so
we vendor a deterministic lemmatizer for English-ish transcript text: an
IRREGULARS dictionary (the direct analog of the reference's
dictionary-lookup morphology) backed by a suffix-rule table. What we
preserve is the *pipeline semantics* — normalize, tokenize, stop-filter,
map each surface form to one canonical lemma, count — not the Russian
dictionary.

ONE rule table drives FOUR implementations guaranteed identical:
  * ``analyze_text``     — pure Python (driver-side query analysis, oracle)
  * ``analyze_series``   — pandas-vectorized (inside Arrow UDFs)
  * ``terms_col``        — Spark Column expression (JVM, whole-stage codegen
                           — the preferred hot path: zero Python)
  * ``lemma_case_sql`` / ``tokens_cte_sql`` — ANSI SQL for the DuckDB oracle

Identity across the four is property-tested in tests/test_analyzer.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Stop-words (analog of the reference's particle filter,
# LemmaFinderImpl.java:13: МЕЖД/ПРЕДЛ/СОЮЗ — interjections, prepositions,
# conjunctions). Fixed, frozen; never change without bumping index_version.
# --------------------------------------------------------------------------
STOPWORDS: tuple[str, ...] = (
    "a", "an", "the", "and", "or", "but", "if", "then", "else", "of",
    "in", "on", "at", "to", "for", "by", "with", "from", "as", "is",
    "are", "was", "were", "be", "been", "it", "its", "this", "that",
    "these", "those", "i", "you", "he", "she", "we", "they", "not",
    "no", "do", "does", "did", "so", "than", "too", "very", "can",
    "will", "just", "into", "over", "under", "again",
)
_STOPSET = frozenset(STOPWORDS)

# Rule table: (suffix, min_total_len, n_chars_dropped, appended, excluded_suffixes)
# First matching rule wins (ONE rule per token, no cascading); no match ->
# token unchanged. Order matters: plural/verb endings, then comparative /
# superlative / adverb endings (r3: -iest/-ier/-est/-er/-ally/-ily/-ly).
_RULES: tuple[tuple[str, int, int, str, tuple[str, ...]], ...] = (
    ("ies", 5, 3, "y", ()),
    ("iest", 7, 4, "y", ()),
    ("ier", 6, 3, "y", ()),
    ("sses", 5, 2, "", ()),
    ("s", 4, 1, "", ("ss", "us", "is")),
    ("ing", 6, 3, "", ()),
    ("ed", 5, 2, "", ()),
    ("est", 6, 3, "", ()),
    ("ally", 7, 2, "", ()),   # usually -> usual, typically -> typical
    ("ily", 6, 3, "y", ()),   # easily -> easy ('daily' len 5 < 6: unchanged)
    ("ly", 6, 2, "", ()),     # quickly -> quick, really -> real
    ("er", 6, 2, "", ()),     # smaller -> small, builder -> build
)

# Irregular surface form -> lemma (the analog of the reference's DICTIONARY
# morphology, LemmaFinderImpl.java:26-31 — a lookup beats any suffix rule).
# Exact-token match applied BEFORE the suffix rules; stop-words never appear
# here (they are filtered earlier). Frozen like the rule table: changing it
# changes index semantics (ANALYZER_VERSION below must be bumped).
# Four sections: (1) irregular verb forms -> base, (2) irregular plurals,
# (3) e-final / doubled-consonant comparatives the -er/-est rules cannot
# stem, (4) agentive -er nouns -> verb, and (5) IDENTITY entries — words
# a suffix rule would mis-stem (request !-> requ, customer !-> custom);
# mapping a word to itself is how a dictionary-first morphology expresses
# "this surface form IS a lemma", exactly the reference's dictionary-miss
# behavior.
IRREGULARS: dict[str, str] = {
    # -- irregular verb forms ------------------------------------------
    "went": "go", "gone": "go", "ran": "run", "saw": "see",
    "took": "take", "taken": "take", "gave": "give", "given": "give",
    "made": "make", "found": "find", "built": "build", "bought": "buy",
    "brought": "bring", "thought": "think", "held": "hold", "kept": "keep",
    "left": "leave", "lost": "lose", "met": "meet", "paid": "pay",
    "said": "say", "sold": "sell", "told": "tell", "wrote": "write",
    "written": "write",
    "began": "begin", "begun": "begin", "broke": "break", "broken": "break",
    "came": "come", "chose": "choose", "chosen": "choose", "done": "do",
    "drew": "draw", "drawn": "draw", "drove": "drive", "driven": "drive",
    "ate": "eat", "eaten": "eat", "fell": "fall", "fallen": "fall",
    "felt": "feel", "flew": "fly", "flown": "fly", "forgot": "forget",
    "forgotten": "forget", "got": "get", "gotten": "get", "grew": "grow",
    "grown": "grow", "heard": "hear", "hid": "hide", "hidden": "hide",
    "knew": "know", "known": "know", "led": "lead", "lent": "lend",
    "meant": "mean", "rode": "ride", "ridden": "ride", "rose": "rise",
    "risen": "rise", "sang": "sing", "sung": "sing", "sat": "sit",
    "sent": "send", "shook": "shake", "shaken": "shake", "shot": "shoot",
    "shown": "show", "slept": "sleep", "spoke": "speak", "spoken": "speak",
    "spent": "spend", "stood": "stand", "stole": "steal", "stolen": "steal",
    "stuck": "stick", "swam": "swim", "swum": "swim", "taught": "teach",
    "threw": "throw", "thrown": "throw", "understood": "understand",
    "woke": "wake", "woken": "wake", "wore": "wear", "worn": "wear",
    "won": "win", "bound": "bind", "bred": "breed", "caught": "catch",
    "dealt": "deal", "dug": "dig", "fed": "feed", "fled": "flee",
    "froze": "freeze", "frozen": "freeze", "hung": "hang", "laid": "lay",
    "sought": "seek", "sped": "speed", "spun": "spin", "sprang": "spring",
    "sprung": "spring", "struck": "strike", "swore": "swear",
    "sworn": "swear", "tore": "tear", "torn": "tear", "wound": "wind",
    # -- irregular plurals ---------------------------------------------
    "mice": "mouse", "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "people": "person",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "analyses": "analysis", "crises": "crisis", "theses": "thesis",
    "criteria": "criterion", "phenomena": "phenomenon", "wolves": "wolf",
    "knives": "knife", "halves": "half", "selves": "self", "oxen": "ox",
    # -- comparatives/superlatives the -er/-est rules cannot stem ------
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "larger": "large", "largest": "large", "later": "late",
    "latest": "late", "nicer": "nice", "nicest": "nice", "safer": "safe",
    "safest": "safe", "closer": "close", "closest": "close",
    "simpler": "simple", "simplest": "simple", "wider": "wide",
    "widest": "wide", "finer": "fine", "finest": "fine", "rarer": "rare",
    "rarest": "rare", "truer": "true", "truest": "true", "bigger": "big",
    "biggest": "big", "hotter": "hot", "hottest": "hot",
    "thinner": "thin", "thinnest": "thin",
    # -- agentive -er nouns -> underlying verb -------------------------
    "parser": "parse", "compiler": "compile", "scheduler": "schedule",
    "handler": "handle", "manager": "manage", "consumer": "consume",
    "producer": "produce", "encoder": "encode", "decoder": "decode",
    "analyzer": "analyze", "tokenizer": "tokenize", "wrapper": "wrap",
    "runner": "run", "planner": "plan", "writer": "write",
    # -- identity lemmas (dictionary shields against rule mis-stems) ---
    "customer": "customer", "number": "number", "server": "server",
    "buffer": "buffer", "cluster": "cluster", "filter": "filter",
    "folder": "folder", "header": "header", "master": "master",
    "member": "member", "docker": "docker", "worker": "worker",
    "logger": "logger", "driver": "driver", "counter": "counter",
    "pointer": "pointer", "trigger": "trigger", "container": "container",
    "broker": "broker", "register": "register", "character": "character",
    "chapter": "chapter", "water": "water", "matter": "matter",
    "letter": "letter", "winter": "winter", "summer": "summer",
    "answer": "answer", "integer": "integer", "parameter": "parameter",
    "transfer": "transfer", "gather": "gather", "deliver": "deliver",
    "consider": "consider", "remember": "remember", "corner": "corner",
    "differ": "differ", "prefer": "prefer", "proper": "proper",
    "whether": "whether", "either": "either", "neither": "neither",
    "rather": "rather", "together": "together", "another": "another",
    "further": "further", "weather": "weather", "render": "render",
    "request": "request", "digest": "digest", "suggest": "suggest",
    "interest": "interest", "manifest": "manifest", "forest": "forest",
    "honest": "honest", "invest": "invest", "protest": "protest",
    "contest": "contest",
    "supply": "supply", "multiply": "multiply", "assembly": "assembly",
    "anomaly": "anomaly", "monopoly": "monopoly", "family": "family",
}

# Bump whenever STOPWORDS / _RULES / IRREGULARS change: an index built with
# a different analyzer version cannot be incrementally extended (documents
# would tokenize differently than the postings they join against).
ANALYZER_VERSION = "a3"

_NONWORD_RE = re.compile(r"[^a-z0-9]+")


# --------------------------------------------------------------------------
# Pure Python (driver-side: query analysis; also the pandas oracle)
# --------------------------------------------------------------------------
def lemmatize_token(w: str) -> str:
    hit = IRREGULARS.get(w)
    if hit is not None:
        return hit
    for suffix, minlen, drop, add, excl in _RULES:
        if len(w) >= minlen and w.endswith(suffix) and not any(
            w.endswith(e) for e in excl
        ):
            return w[: len(w) - drop] + add
    return w


def analyze_text(text: str | None) -> list[str]:
    """text -> list of lemmas (duplicates preserved — callers count tf)."""
    if not text:
        return []
    normalized = _NONWORD_RE.sub(" ", text.lower()).strip()
    if not normalized:
        return []
    return [
        lemmatize_token(t)
        for t in normalized.split(" ")
        if t and t not in _STOPSET
    ]


# --------------------------------------------------------------------------
# pandas-vectorized (used inside Arrow-batched UDFs — no per-row Python
# beyond the initial tokenization split, which is C-backed in pandas)
# --------------------------------------------------------------------------
def lemmatize_series(tokens: pd.Series) -> pd.Series:
    """Vectorized lemmatizer over a flat Series of tokens."""
    s = tokens.astype(str)
    mapped = s.map(IRREGULARS)  # NaN where not an irregular form
    lengths = s.str.len()
    conds, stems = [], []
    claimed = pd.Series(False, index=s.index)
    for suffix, minlen, drop, add, excl in _RULES:
        m = (lengths >= minlen) & s.str.endswith(suffix) & ~claimed
        for e in excl:
            m &= ~s.str.endswith(e)
        conds.append(m.to_numpy())
        claimed |= m
        stemmed = s.str.slice(0, -drop)
        if add:
            stemmed = stemmed + add
        stems.append(stemmed.to_numpy())
    ruled = np.select(conds, stems, default=s.to_numpy())
    return pd.Series(
        np.where(mapped.notna().to_numpy(), mapped.to_numpy(), ruled),
        index=s.index,
    )


def analyze_series(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] — vectorized analyzer for UDFs.
    The list rebuild is np.split at bincount boundaries (C path), not a
    python-level groupby-agg — this is the hot loop of the index build."""
    if len(texts) == 0:
        # np.split(empty, []) would yield ONE part for zero rows — a
        # zero-row Arrow batch must return a zero-row Series
        return pd.Series([], index=texts.index, dtype=object)
    s = texts.fillna("").astype(str).str.lower()
    s = s.str.replace(_NONWORD_RE, " ", regex=True).str.strip()
    s = s.reset_index(drop=True)
    exploded = s.str.split(" ").explode()
    mask = exploded.notna() & (exploded != "") & ~exploded.isin(_STOPSET)
    kept = exploded[mask]
    if len(kept):
        kept = lemmatize_series(kept)
    counts = np.bincount(kept.index.to_numpy(np.int64), minlength=len(s))
    parts = np.split(kept.to_numpy(), np.cumsum(counts)[:-1])
    return pd.Series([p.tolist() for p in parts], index=texts.index)


# --------------------------------------------------------------------------
# Spark Column expression (JVM-side, whole-stage codegen — zero Python)
# --------------------------------------------------------------------------
def _lemma_col(t: Column) -> Column:
    expr = t
    # build the when-chain from the last rule backwards so first rule wins
    for suffix, minlen, drop, add, excl in reversed(_RULES):
        cond = (F.length(t) >= F.lit(minlen)) & t.endswith(suffix)
        for e in excl:
            cond = cond & ~t.endswith(e)
        stemmed = t.substr(F.lit(1), F.length(t) - F.lit(drop))
        if add:
            stemmed = F.concat(stemmed, F.lit(add))
        expr = F.when(cond, stemmed).otherwise(expr)
    # Irregular lookup wins over every suffix rule (NULL miss -> rules).
    # Catalyst evaluates element_at on a literal map as a LINEAR scan
    # (ArrayBasedMapData has no hash index), and at ~250 dictionary entries
    # a flat map measurably halved analyzer-stage throughput (12.1s ->
    # 6.4s over 720k turns at local[8]); dispatching on the first
    # character caps the scan at ~26 outer + ~15 inner comparisons.
    # element_at(NULL, t) is NULL, so a first-char miss falls through to
    # the rule chain exactly like a flat-map miss — output-identical
    # (enforced by the 4-way identity tests).
    by_first: dict[str, list[tuple[str, str]]] = {}
    for k, v in IRREGULARS.items():
        by_first.setdefault(k[0], []).append((k, v))
    outer: list[Column] = []
    for c in sorted(by_first):
        inner = F.create_map(
            *[F.lit(x) for kv in by_first[c] for x in kv]
        )
        outer.extend([F.lit(c), inner])
    irr = F.element_at(
        F.element_at(F.create_map(*outer), F.substring(t, 1, 1)), t
    )
    return F.coalesce(irr, expr)


def terms_col(text: Column) -> Column:
    """text column -> array<string> of lemmas; pure Catalyst expressions."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    toks = F.split(norm, " ")
    toks = F.filter(toks, lambda t: (t != F.lit("")) & ~t.isin(*STOPWORDS))
    toks = F.transform(toks, _lemma_col)
    return F.coalesce(toks, F.array().cast("array<string>"))


# --------------------------------------------------------------------------
# ANSI SQL (DuckDB oracle — generated from the same rule table)
# --------------------------------------------------------------------------
def lemma_case_sql(var: str = "tok") -> str:
    """CASE expression applying irregular lookup + the rule chain to SQL
    variable ``var`` — generated from the same tables as the other three
    implementations."""
    irr = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in IRREGULARS.items()
    )
    whens = []
    for suffix, minlen, drop, add, excl in _RULES:
        cond = f"length({var}) >= {minlen} AND {var} LIKE '%{suffix}'"
        for e in excl:
            cond += f" AND {var} NOT LIKE '%{e}'"
        result = f"substr({var}, 1, length({var}) - {drop})"
        if add:
            result += f" || '{add}'"
        whens.append(f"WHEN {cond} THEN {result}")
    rules = "CASE " + " ".join(whens) + f" ELSE {var} END"
    return f"CASE {var} {irr} ELSE {rules} END"


def stopword_sql_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def lemmas_list_sql(text_col: str = "text") -> str:
    """DuckDB expression producing one row's lemma LIST — the SQL twin of
    ``terms_col`` with element ORDER preserved, for positional operators
    (phrase/proximity). Generated from the same rule tables; NULL text
    yields NULL (callers' >=1-occurrence filters drop it, matching
    terms_col's empty array)."""
    return f"""list_transform(
        list_filter(
            string_split(trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g')), ' '),
            tok -> tok <> '' AND tok NOT IN ({stopword_sql_list()})),
        tok -> {lemma_case_sql('tok')})"""


def tokens_cte_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text", extra_cols: str = "") -> str:
    """A CTE body producing (id_col, term) rows — one per token occurrence —
    identical to Spark's explode(terms_col(text)). DuckDB dialect."""
    extra = f", {extra_cols}" if extra_cols else ""
    return f"""
    SELECT {id_col}{extra}, {lemma_case_sql('tok')} AS term
    FROM (
        SELECT {id_col}{extra},
               unnest(string_split(
                   trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g')),
                   ' ')) AS tok
        FROM {table}
    )
    WHERE tok <> '' AND tok NOT IN ({stopword_sql_list()})
    """
