"""Single-node pandas oracle implementing the reference semantics.

Used only by tests (SURVEY.md §5): given a transcript table, compute the
documents/term_stats/doc_stats/corpus_stats tables and answer top-k
queries under both scoring modes, exactly as the distributed engine must.

Semantics preserved from the reference (SURVEY.md §1.2):
- document = one turn, key (conv_id, turn_idx); doc_id dense in that order
- only rows with non-blank text are indexed (P1, EntitySaver.java:51 analog)
- df = distinct docs containing the lemma (EntitySaver.java:88-101)
- tf = raw count within the doc (LemmaFinderImpl.java:31-36)
- relevance_ref = SUM(tf)/max_page_sum (IndexRepository.java:14-20)
- ordering: score DESC, doc_id ASC (deterministic tie-break — documented
  deviation from the reference's HashSet nondeterminism, SURVEY.md §7.5)
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from .functions.analyzer import analyze_text

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    documents: pd.DataFrame  # doc_id, conv_id, turn_idx, role, tool, ts, text, dl
    postings: dict[str, list[tuple[int, int]]]  # term -> [(doc_id, tf)] sorted
    term_stats: pd.DataFrame  # term, df, cf
    n_docs: int = 0
    avgdl: float = 0.0
    max_tf_sum: float = 0.0
    doc_dl: dict[int, int] = field(default_factory=dict)


def build_oracle_index(transcripts: pd.DataFrame) -> OracleIndex:
    t = transcripts.copy()
    # explicit class — python str.strip() would also strip unicode spaces
    # that the Spark/DuckDB predicates (index_build.BLANK_CLASS) keep
    t["_blank"] = t["text"].isna() | (
        t["text"].astype(str).str.strip(" \t\n\r\f\x0b") == ""
    )
    kept = t[~t["_blank"]].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    kept["doc_id"] = kept.index.astype("int64")

    postings: dict[str, list[tuple[int, int]]] = {}
    dls: list[int] = []
    for row in kept.itertuples():
        terms = analyze_text(row.text)
        dls.append(len(terms))
        for term, tf in sorted(Counter(terms).items()):
            postings.setdefault(term, []).append((row.doc_id, tf))

    kept["dl"] = pd.Series(dls, dtype="int64")
    # drop docs that analyzed to zero tokens? NO — reference keeps pages even
    # if they contribute no lemmas; they still count for N and have dl=0.
    term_rows = [
        (term, len(pl), sum(tf for _, tf in pl)) for term, pl in sorted(postings.items())
    ]
    term_stats = pd.DataFrame(term_rows, columns=["term", "df", "cf"])

    n_docs = len(kept)
    avgdl = float(kept["dl"].mean()) if n_docs else 0.0
    max_tf_sum = float(kept["dl"].max()) if n_docs else 0.0

    docs = kept[
        ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text", "dl"]
    ].reset_index(drop=True)
    return OracleIndex(
        documents=docs,
        postings=postings,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        max_tf_sum=max_tf_sum,
        doc_dl=dict(zip(docs["doc_id"], docs["dl"])),
    )


def bm25_idf(n_docs: int, df: int) -> float:
    # Robertson-Sparck-Jones idf with +1 smoothing (never negative)
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    offset: int = 0,
    mode: str = "bm25",
    max_df: int | None = None,
    conjunctive: bool = True,
) -> pd.DataFrame:
    """Top-k search; returns (doc_id, score) rank-identical contract.

    conjunctive=True reproduces the reference's ALL-terms intersection
    (SearchServiceImpl.java:155-168); max_df reproduces the df>=250 prune
    (SearchServiceImpl.java:169-178) when set.
    """
    empty = pd.DataFrame(columns=["doc_id", "score"]).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    q_terms = sorted(set(analyze_text(query)))
    stats = idx.term_stats.set_index("term")
    if conjunctive and any(t not in stats.index for t in q_terms):
        # a missing term means empty result under ALL-terms semantics
        # (reference: error "lemma not found", SearchServiceImpl.java:60-62)
        return empty
    present = [t for t in q_terms if t in stats.index]
    if max_df is not None:
        present = [t for t in present if int(stats.loc[t, "df"]) < max_df]
    if not present:
        return empty

    # rarest-first ordering (O1, LemmaRepository.java:20)
    present.sort(key=lambda t: (int(stats.loc[t, "df"]), t))

    # accumulate scores doc-at-a-time in fixed term order
    scores: dict[int, float] = {}
    seen_count: dict[int, int] = {}
    for t in present:
        df_t = int(stats.loc[t, "df"])
        idf_t = bm25_idf(idx.n_docs, df_t)  # per-term, not per-posting
        for doc_id, tf in idx.postings[t]:
            if mode == "bm25":
                dl = idx.doc_dl[doc_id]
                denom = tf + K1 * (1 - B + B * dl / idx.avgdl)
                s = idf_t * (tf * (K1 + 1)) / denom
            else:  # relevance_ref: SUM(tf)/max_tf_sum (IndexRepository.java:14-20)
                s = tf / idx.max_tf_sum
            scores[doc_id] = scores.get(doc_id, 0.0) + s
            seen_count[doc_id] = seen_count.get(doc_id, 0) + 1

    if conjunctive:
        need = len(present)
        scores = {d: s for d, s in scores.items() if seen_count[d] == need}

    out = pd.DataFrame(
        sorted(scores.items(), key=lambda kv: (-kv[1], kv[0])),
        columns=["doc_id", "score"],
    ).astype({"doc_id": "int64", "score": "float64"})
    return out.iloc[offset : offset + k].reset_index(drop=True)
