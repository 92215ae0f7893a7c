"""Adversarial-corpus tests for the newest training-data pipeline entries.

The driver gate (sf0.01) never exercises ngram_dup_pairs' hot-shingle cap
(max shingle df there is 8 vs SHINGLE_DF_CAP=50), so these tests build the
corpus that DOES: shared boilerplate across >cap documents. Each test also
re-checks Spark == DuckDB bit-exactly on the adversarial corpus, i.e. the
same contract the gate enforces, on inputs the gate never sees.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from search_engine_spark import entry_queries as EQ

BOILER = ("alpha bravo charlie delta echo foxtrot golf hotel "
          "india juliet kilo lima")


def _write_docs(tmp_path, texts, sources=None):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": sources if sources is not None else "src0",
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def _oracle(tmp_path, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con.execute(EQ.ORACLES[name]).df()


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(str(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )


def _assert_matches_oracle(spark_df, tmp_path, name):
    got = spark_df.toPandas()
    want = _oracle(tmp_path, name)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want)
    return got


def test_ngram_cap_drops_boilerplate_pairs(spark, tmp_path):
    """62 docs share a 12-word boilerplate prefix (shingle df=62 >
    SHINGLE_DF_CAP=50): every boilerplate shingle must be dropped before
    the candidate join, so docs related ONLY through boilerplate produce
    no pair, while the one genuinely near-duplicate pair (shared rare
    tail) survives with the kept-universe jaccard."""
    assert EQ.SHINGLE_DF_CAP < 62
    tail = "uniqa uniqb uniqc uniqd uniqe uniqf uniqg uniqh uniqi uniqj"
    texts = [f"{BOILER} tail{i}w tail{i}x tail{i}y tail{i}z"
             for i in range(60)]
    texts.append(f"{BOILER} {tail}")               # doc 60
    texts.append(f"{BOILER} {tail} zextra")        # doc 61: one extra word
    sf_dir = _write_docs(tmp_path, texts)

    got = _assert_matches_oracle(
        EQ.q_ngram_dup_pairs(spark, sf_dir), sf_dir, "ngram_dup_pairs"
    )
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert pairs == {(60, 61)}
    # doc 60 kept shingles: 2 boundary + (10-3+1) tail = 10; doc 61 adds
    # one (A ⊂ B, |B| = |A| + 1) -> jaccard = 10 / 11 exactly
    j = float(got["jaccard"].iloc[0])
    assert j == pytest.approx(10 / 11, abs=0)


def test_ngram_no_cap_keeps_rare_pairs_only(spark, tmp_path):
    """Below the cap nothing is dropped: disjoint docs yield no pairs."""
    texts = [f"one{i} two{i} three{i} four{i}" for i in range(10)]
    sf_dir = _write_docs(tmp_path, texts)
    got = _assert_matches_oracle(
        EQ.q_ngram_dup_pairs(spark, sf_dir), sf_dir, "ngram_dup_pairs"
    )
    assert len(got) == 0


def test_repetition_stats_exact_values(spark, tmp_path):
    texts = [
        "kodo zena\nkodo zena\nmira",   # dup line; top bigram 2/4
        "kodo zena mira",               # no dup; top bigram 1/2
        "",                             # no lines, no bigrams
        "solo",                         # one line, <2 lemmas
    ]
    sf_dir = _write_docs(tmp_path, texts)
    got = _assert_matches_oracle(
        EQ.q_repetition_stats(spark, sf_dir), sf_dir, "repetition_stats"
    ).set_index("doc_id").sort_index()
    assert got.loc[0, "n_lines"] == 3
    assert got.loc[0, "dup_line_frac"] == pytest.approx(1 / 3, abs=0)
    assert got.loc[0, "top_bigram_frac"] == pytest.approx(0.5, abs=0)
    assert got.loc[1, "n_lines"] == 1
    assert got.loc[1, "dup_line_frac"] == 0.0
    assert got.loc[1, "top_bigram_frac"] == pytest.approx(0.5, abs=0)
    assert got.loc[2, "n_lines"] == 0
    assert got.loc[2, "dup_line_frac"] == 0.0
    assert got.loc[2, "top_bigram_frac"] == 0.0
    assert got.loc[3, "n_lines"] == 1
    assert got.loc[3, "top_bigram_frac"] == 0.0


def test_source_cap_sample_caps_and_is_deterministic(spark, tmp_path):
    sources = (["big"] * 30) + (["mid"] * 10) + (["tiny"] * 5)
    texts = [f"text {i}" for i in range(len(sources))]
    sf_dir = _write_docs(tmp_path, texts, sources=sources)
    got = _assert_matches_oracle(
        EQ.q_source_cap_sample(spark, sf_dir), sf_dir, "source_cap_sample"
    )
    by_src = got.groupby("source")["doc_id"].count().to_dict()
    assert by_src == {"big": EQ.SOURCE_CAP, "mid": 10, "tiny": 5}
    assert got["rk"].max() <= EQ.SOURCE_CAP
    # deterministic: a second run picks the identical survivor set
    again = EQ.q_source_cap_sample(spark, sf_dir).toPandas()
    assert _rows(got) == _rows(again)


def _write_embeddings(tmp_path, vecs):
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    return str(tmp_path)


def _oracle_emb(tmp_path, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    return con.execute(EQ.ORACLES[name]).df()


def test_ann_recall_measures_probe_misses(spark, tmp_path):
    """ann_recall must actually measure recall LOSS: vectors whose sign
    bucket differs from the query's in >= 2 bits are outside the 9-probe
    set, so high-cosine vectors placed there are found by the exact
    top-k but missed by the ANN. The driver-gate corpus (sf0.01) happens
    to give recall 1.0, so this corpus is the one that exercises the
    metric's discriminating case — and Spark == DuckDB must still hold
    bit-exactly on it."""
    q = [1.0] * 8
    # two high-sim vectors with TWO sign flips (tiny magnitudes): cosine
    # ~0.86 but Hamming-2 from the query bucket -> unreachable by probes
    missed = [[1, 1, 1, 1, 1, 1, -0.01, -0.01],
              [1, 1, 1, 1, -0.01, -0.01, 1, 1]]
    # nine all-positive (same-bucket) vectors with decreasing similarity:
    # mostly mass on one axis, a shrinking uniform component elsewhere
    in_bucket = [
        [0.5 - 0.05 * i] * 7 + [10.0] for i in range(9)
    ]
    sf_dir = _write_embeddings(tmp_path, [q] + missed + in_bucket)

    got = EQ.q_ann_recall(spark, sf_dir).toPandas()
    want = _oracle_emb(sf_dir, "ann_recall")
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want)

    # exact top-10 of 12 vectors: query (sim 1.0) + both missed (~0.86)
    # + the 7 most-similar in-bucket vectors; the ANN candidate set is
    # the 10 all-positive vectors -> overlap = 8 of 10
    row = got.iloc[0]
    assert int(row["k"]) == EQ.TOPK
    assert int(row["n_hit"]) == 8
    assert row["recall"] == pytest.approx(0.8, abs=0)


def test_decontaminate_flags_eval_overlap(spark, tmp_path):
    """doc 0 is the synthetic eval doc (doc_id % DECONTAM_EVAL_MOD == 0);
    doc 1 copies one of its 3-gram spans verbatim, doc 2 shares nothing.
    The flag must hit exactly {0, 1}, the hit counts must equal the
    number of distinct shared shingles, and Spark == DuckDB bit-exactly."""
    texts = [
        "alpha bravo charlie delta echo",        # eval doc: 3 shingles
        "zonly alpha bravo charlie yonly xonly",  # copies 'alpha bravo charlie'
        "uniqa uniqb uniqc uniqd uniqe",          # clean
        "tiny",                                   # < n lemmas: zero shingles
    ]
    sf_dir = _write_docs(tmp_path, texts)
    got = _assert_matches_oracle(
        EQ.q_decontaminate(spark, sf_dir), sf_dir, "decontaminate"
    ).set_index("doc_id")
    assert bool(got.loc[0, "contaminated"]) and bool(got.loc[1, "contaminated"])
    assert not bool(got.loc[2, "contaminated"])
    assert not bool(got.loc[3, "contaminated"])
    assert int(got.loc[0, "n_hits"]) == 3          # whole doc is eval
    assert int(got.loc[1, "n_hits"]) == 1          # one shared 3-gram
    assert int(got.loc[3, "n_shingles"]) == 0


def test_pii_scrub_detects_and_redacts(spark, tmp_path):
    """doc 0 receives ALL THREE injected PII kinds (0 mod 7/11/13 == 0);
    doc 1 carries NATURAL pii-shaped text that must also be caught; a
    clean doc stays untouched. Counts are pre-redaction, the redacted
    text carries the placeholders, and Spark == DuckDB bit-exactly."""
    texts = [
        "plain words here",
        "mail bob@test.org or hit 192.168.0.1 then call 555-1234 twice",
        "nothing sensitive at all",
    ]
    sf_dir = _write_docs(tmp_path, texts)
    got = _assert_matches_oracle(
        EQ.q_pii_scrub(spark, sf_dir), sf_dir, "pii_scrub"
    ).set_index("doc_id")
    # injected: doc 0 gets email+phone+ip appended
    assert (int(got.loc[0, "n_emails"]), int(got.loc[0, "n_ips"]),
            int(got.loc[0, "n_phones"])) == (1, 1, 1)
    for tag in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tag in got.loc[0, "clean_text"]
    assert "@" not in got.loc[0, "clean_text"]
    # natural: doc 1 has one of each in its own text
    assert (int(got.loc[1, "n_emails"]), int(got.loc[1, "n_ips"]),
            int(got.loc[1, "n_phones"])) == (1, 1, 1)
    assert "bob@test.org" not in got.loc[1, "clean_text"]
    # clean doc passes through verbatim
    assert got.loc[2, "clean_text"] == "nothing sensitive at all"


def test_chunk_dedup_identical_docs(spark, tmp_path):
    """All-identical multi-chunk docs: only the FIRST doc keeps its
    chunks; every later copy drops all of them (its windows are exact
    duplicates of doc 0's). Spark == DuckDB on the adversarial corpus."""
    # 70 distinct filler words -> 3 chunks of 32/32/6 tokens per doc
    words = " ".join(f"w{i}x" for i in range(70))
    sf = _write_docs(tmp_path, [words] * 5)
    got = _assert_matches_oracle(
        EQ.QUERIES["chunk_dedup"](spark, sf), sf, "chunk_dedup"
    )
    by_doc = {int(r.doc_id): (int(r.n_chunks), int(r.kept_chunks))
              for r in got.itertuples(index=False)}
    # docs 0 and 4 carry the planted boilerplate header (doc_id % 4 ==
    # 0). The header is exactly CHUNK_SIZE tokens, so it occupies doc
    # 0's window 0 whole and the shared text's windows stay ALIGNED
    # across all five docs — doc 0 is the first occurrence of every
    # window (header + all three text windows) and every other doc,
    # headered or not, keeps nothing.
    assert by_doc == {
        0: (4, 4),  # header + text windows, all first occurrences
        1: (3, 0),  # text windows == doc 0's windows 1-3
        2: (3, 0),
        3: (3, 0),
        4: (4, 0),  # duplicate of doc 0 exactly
    }


def test_chunk_dedup_all_unique_keeps_everything(spark, tmp_path):
    """Disjoint vocabularies -> zero cross-doc duplication: every chunk
    survives except the planted boilerplate header duplicates."""
    texts = [
        " ".join(f"w{d}q{i} " for i in range(40)) for d in range(8)
    ]
    sf = _write_docs(tmp_path, texts)
    got = _assert_matches_oracle(
        EQ.QUERIES["chunk_dedup"](spark, sf), sf, "chunk_dedup"
    )
    by_doc = {int(r.doc_id): (int(r.n_chunks), int(r.kept_chunks))
              for r in got.itertuples(index=False)}
    # docs 0 and 4 carry the planted header; 0 keeps it, 4 drops ONE
    assert by_doc[4][0] - by_doc[4][1] == 1
    assert all(kept == n for d, (n, kept) in by_doc.items() if d != 4)


def test_sample_mix_deterministic_and_exact(spark, tmp_path):
    """The mixing ledger is a pure function of (source, doc_id): two
    runs agree row-for-row, rates stay on the 4-step ladder, and the
    kept count equals a direct recount of the keep predicate."""
    texts = [f"doc number {i} filler words" for i in range(60)]
    sources = [f"s{i % 3}" for i in range(60)]
    sf = _write_docs(tmp_path, texts, sources)
    got = _assert_matches_oracle(
        EQ.QUERIES["sample_mix"](spark, sf), sf, "sample_mix"
    )
    again = EQ.QUERIES["sample_mix"](spark, sf).toPandas()
    assert _rows(got) == _rows(again)
    assert set(got["rate_bp"]) <= {2500, 4375, 6250, 8125}
    assert (got["n_kept"] <= got["n_docs"]).all()
    assert int(got["n_docs"].sum()) == 60
