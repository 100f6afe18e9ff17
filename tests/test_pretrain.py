"""Invariant tests for the pretraining-corpus operators
(`operators/pretrain.py`). Oracle parity (hash-exact vs DuckDB) is
covered by `test_oracle_parity.py`; these pin the semantic guarantees
the hashes alone don't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_can_bigdata_spark.operators import pretrain as P


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        # two docs sharing a 7-token run (>= w+k-1 = 6) => winnowing
        # MUST give them a common fingerprint
        (1, "alpha beta gamma delta epsilon zeta eta unique1 tail1", "s0"),
        (2, "head2 alpha beta gamma delta epsilon zeta eta other2", "s0"),
        # a doc with no overlap
        (3, "one two three four five six seven eight nine ten", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def _with_docs(spark, df, fn, sf_dir):
    """Run a registered query with `documents` swapped for a fixture."""
    import reddit_can_bigdata_spark.operators.common as C

    orig = C.load_tables

    def patched(spark_, sf_dir_):
        out = orig(spark_, sf_dir_)
        out["documents"] = df
        return out

    C.load_tables = patched
    try:
        return fn(spark, sf_dir)
    finally:
        C.load_tables = orig


def test_winnowing_guarantee(spark, docs_df, sf_dir):
    """Docs sharing a run of >= w+k-1 tokens share a fingerprint hash
    (the winnowing paper's core guarantee), and a disjoint doc shares
    none."""
    out = _with_docs(
        spark, docs_df, P.pretrain_winnowing, sf_dir
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.khash)
    assert by_doc[1] & by_doc[2], "overlapping docs must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_chunks_cover_every_token(spark, docs_df, sf_dir):
    """Chunk windows cover position 0..n-1 of every doc, and each
    chunk's token count matches its slice bounds."""
    chunks = _with_docs(spark, docs_df, P.pretrain_doc_chunks, sf_dir)
    rows = chunks.collect()
    n_toks = {r.doc_id: len(r.text.split(" ")) for r in docs_df.collect()}
    covered = {}
    for r in rows:
        assert 1 <= r.n_chunk_tokens <= P.CHUNK_TOKENS
        assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens
        covered.setdefault(r.doc_id, set()).update(
            range(r.chunk_start, r.chunk_start + r.n_chunk_tokens)
        )
    for doc_id, n in n_toks.items():
        assert covered[doc_id] == set(range(n))


def test_packing_offsets_contiguous(spark, docs_df, sf_dir):
    """Within a source, start offsets are exactly the running sum of
    token counts in doc_id order (no gaps, no overlaps)."""
    packed = _with_docs(
        spark, docs_df, P.pretrain_sequence_packing, sf_dir
    )
    rows = sorted(packed.collect(), key=lambda r: (r.source, r.doc_id))
    running = {}
    for r in rows:
        assert r.start_offset == running.get(r.source, 0)
        running[r.source] = r.start_offset + r.n_tokens
        assert r.seq_id == r.start_offset // P.PACK_BUDGET


def test_quality_rules_integer_thresholds(spark, sf_dir):
    """Boundary docs land on the documented side of each rule: 9
    tokens fails ok_len, 10 passes; mean word length exactly 3.0
    passes."""
    rows = [
        (1, " ".join(["the"] * 9), "s"),  # 9 tokens -> fails ok_len
        (2, " ".join(["the"] * 10), "s"),  # 10 tokens, mwl=3.0 -> passes
        (3, " ".join(["ab"] * 20), "s"),  # mwl=2.0 -> fails mean-word-len
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {
        r.doc_id: r
        for r in _with_docs(
            spark, df, P.pretrain_quality_rules, sf_dir
        ).collect()
    }
    assert not out[1].ok_len and out[2].ok_len
    assert out[2].ok_mean_word_len and out[2].keep
    assert not out[3].ok_mean_word_len and not out[3].keep


def test_tfidf_prefers_rare_terms(spark, sf_dir):
    """A term unique to one doc outranks a corpus-wide term."""
    rows = [
        (1, "common common rareword", "s"),
        (2, "common common common", "s"),
        (3, "common stuff here", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = _with_docs(spark, df, P.pretrain_tfidf_topk, sf_dir)
    top_doc1 = (
        out.where(F.col("doc_id") == 1).orderBy(F.desc("tfidf")).first()
    )
    assert top_doc1.term == "rareword"


def test_unigram_logprob_ranks_typical_text_higher(spark, sf_dir):
    """A doc of corpus-frequent tokens scores a higher (less negative)
    avg logprob than a doc of corpus-unique tokens."""
    rows = [
        (1, "common common common common", "s"),
        (2, "weird1 weird2 weird3 weird4", "s"),
        (3, "common common common filler", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {
        r.doc_id: r.avg_logprob
        for r in _with_docs(
            spark, df, P.pretrain_unigram_logprob, sf_dir
        ).collect()
    }
    assert out[1] > out[2]


def test_shared_tokenization_twins_agree_on_messy_text(spark):
    """TOKENS_EXPR (Spark) and TOKENS_SQL (DuckDB) implement the one
    pretrain tokenization policy — non-empty fields of a single-space
    split — identically, including repeated/leading/trailing spaces."""
    import duckdb

    from reddit_can_bigdata_spark.operators.pretrain import TOKENS_EXPR, TOKENS_SQL

    cases = ["a b c", "a  b", " a b ", "", "  ", "one"]
    sdf = spark.createDataFrame([(t,) for t in cases], "text string")
    got_spark = [r["toks"] for r in sdf.select(F.expr(TOKENS_EXPR).alias("toks")).collect()]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {TOKENS_SQL} FROM (SELECT ? AS text)", [t]).fetchone()[0]
        for t in cases
    ]
    assert got_spark == got_duck
    assert got_spark[1] == ["a", "b"]  # empties dropped
    assert got_spark[3] == got_spark[4] == []


def test_winnowing_pack_fits_bigint_at_extremes():
    """enc = hash*WINNOW_POS_MOD + pos must fit int64 at the max
    unsigned 32-bit hash, and unpack exactly."""
    from reddit_can_bigdata_spark.operators.pretrain import WINNOW_POS_MOD

    max_hash = 2**32 - 1
    max_pos = WINNOW_POS_MOD - 1
    enc = max_hash * WINNOW_POS_MOD + max_pos
    assert enc == 2**63 - 1  # exactly BIGINT max — no overflow headroom wasted
    assert enc // WINNOW_POS_MOD == max_hash
    assert enc % WINNOW_POS_MOD == max_pos


def test_decontaminate_flags_exactly_the_eval_colliders(spark, sf001_dir):
    """Recompute the 5-gram collision set in pure Python at sf0.01
    (sf0.001 has too few docs for planted near-dups to cross the
    eval-set boundary) and pin the operator's flags to it."""
    import duckdb

    from reddit_can_bigdata_spark.operators.pretrain import (
        DECONTAM_EVAL_MOD,
        DECONTAM_N,
        pretrain_decontaminate,
    )

    sf = sf001_dir
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()

    def grams(text):
        toks = [t for t in text.split(" ") if t]
        return {
            " ".join(toks[i : i + DECONTAM_N])
            for i in range(len(toks) - DECONTAM_N + 1)
        }

    eval_grams = set()
    for did, text in docs:
        if did % DECONTAM_EVAL_MOD == 0:
            eval_grams |= grams(text)
    want = {
        did: len(grams(text) & eval_grams)
        for did, text in docs
        if did % DECONTAM_EVAL_MOD != 0
    }
    got = {
        r["doc_id"]: r["n_collisions"]
        for r in pretrain_decontaminate(spark, sf).collect()
    }
    assert got == want
    # the corpus has planted near-dups, so the check is non-vacuous
    assert any(v >= 1 for v in got.values())


def test_repetition_matches_python_and_boundary(spark, sf_dir):
    import duckdb

    from reddit_can_bigdata_spark.operators.pretrain import (
        REPEAT_N,
        pretrain_repetition,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    want = {}
    for did, text in docs:
        toks = [t for t in text.split(" ") if t]
        g = [" ".join(toks[i : i + REPEAT_N]) for i in range(len(toks) - REPEAT_N + 1)]
        if g:
            want[did] = (len(g), len(set(g)), 5 * (len(g) - len(set(g))) <= len(g))
    got = {
        r["doc_id"]: (r["n_3grams"], r["n_distinct_3grams"], r["keep"])
        for r in pretrain_repetition(spark, sf_dir).collect()
    }
    assert got == want


def test_chunker_survives_empty_and_whitespace_docs(spark):
    """Regression (round-3 review): empty/whitespace-only text
    tokenizes to [] under the shared policy; sequence(0, -1) raises in
    Spark unless zero-token docs are filtered. The oracle's
    generate_series returns empty for them, so 'no rows' is the
    agreed semantics."""
    from reddit_can_bigdata_spark.operators.pretrain import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two three four")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["chunk_text"].startswith("one two")


def test_epoch_plan_cap_and_mix_on_skewed_sources(spark):
    """curate_epoch_plan's cap on a synthetic skewed mix (the uniform
    fixture corpus caps every source identically): a tiny source under
    temperature sampling demands more epochs than the ceiling and gets
    capped; a huge source runs fractional epochs uncapped; realized
    never exceeds min(desired, unique*4) and epochs = realized/unique."""
    from reddit_can_bigdata_spark.operators.curation import epoch_plan

    counts = spark.createDataFrame(
        [("tiny", 100), ("mid", 10_000), ("huge", 1_000_000)],
        "source string, unique_tokens bigint",
    )
    rows = {
        r.source: r
        for r in epoch_plan(counts, budget=2_000_000, alpha=0.5, max_epochs=4)
        .collect()
    }
    t, h = rows["tiny"], rows["huge"]
    assert t.capped and t.realized_tokens == 100 * 4 and t.epochs == 4.0
    assert not h.capped and h.realized_tokens == h.desired_tokens
    assert h.epochs < 4.0
    for r in rows.values():
        assert r.realized_tokens <= min(r.desired_tokens, r.unique_tokens * 4)
        assert abs(r.epochs - r.realized_tokens / r.unique_tokens) < 1e-6
    # budget conservation: desired shares sum to <= budget (floor)
    assert sum(r.desired_tokens for r in rows.values()) <= 2_000_000
