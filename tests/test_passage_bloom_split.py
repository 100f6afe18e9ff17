"""Invariants for the round-4 curation/dedup additions:

- `pretrain_bloom_decontaminate`: Bloom filters have NO false
  negatives — every doc the exact operator marks contaminated must be
  flagged, and per-doc the bloom gram count dominates the exact one;
- `dedup_passages`: global exactly-once retention of every distinct
  passage, first-occurrence wins, per-doc counts consistent;
- `curate_stratified_split`: per-source fractions sum to 1 and the
  global split tracks 80/10/10.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.pretrain import (
        pretrain_bloom_decontaminate,
        pretrain_decontaminate,
    )

    exact = {
        r["doc_id"]: r
        for r in pretrain_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in pretrain_bloom_decontaminate(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)  # same corpus side (eval excluded)
    contaminated = [d for d, r in exact.items() if r["contaminated"]]
    assert contaminated, "fixture should contain eval-gram colliders"
    for d in exact:
        assert exact[d]["n_grams"] == bloom[d]["n_grams"]
        # no false negatives, at doc AND gram granularity
        assert bloom[d]["n_flagged"] >= exact[d]["n_collisions"], d
        if exact[d]["contaminated"]:
            assert bloom[d]["maybe_contaminated"], d
    # the 8 KiB filter should stay useful: false-positive docs bounded
    fp = sum(
        1
        for d in exact
        if bloom[d]["maybe_contaminated"] and not exact[d]["contaminated"]
    )
    assert fp <= 0.2 * len(exact), f"bloom FP rate degenerate: {fp}/{len(exact)}"


def _py_passages(text: str, w: int) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]


def test_dedup_passages_exactly_once_and_first_wins(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.dedup import PASSAGE_W, dedup_passages

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    out = {r["doc_id"]: r for r in dedup_passages(spark, sf_dir).collect()}
    assert set(out) == set(docs)

    # python golden: first (doc_id, pos) occurrence of each passage
    kept_golden: dict[int, list[str]] = {d: [] for d in docs}
    seen: set[str] = set()
    for d in sorted(docs):
        for passage in _py_passages(docs[d], PASSAGE_W):
            if passage not in seen:
                seen.add(passage)
                kept_golden[d].append(passage)

    total_kept = sum(r["n_kept"] for r in out.values())
    assert total_kept == len(seen)  # every distinct passage exactly once
    for d in docs:
        golden = kept_golden[d]
        assert out[d]["n_passages"] == len(_py_passages(docs[d], PASSAGE_W))
        assert out[d]["n_kept"] == len(golden), d
        assert out[d]["text_deduped"] == " ".join(golden), d


def test_stratified_split_fractions(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.curation import (
        curate_stratified_split,
    )

    rows = curate_stratified_split(spark, sf_dir).collect()
    by_source: dict[str, dict[str, int]] = {}
    for r in rows:
        by_source.setdefault(r["source"], {})[r["split"]] = r["n_docs"]
        assert 0.0 <= r["frac"] <= 1.0
    for source, splits in by_source.items():
        total = sum(splits.values())
        fracs = [
            r["frac"] for r in rows if r["source"] == source
        ]
        assert abs(sum(fracs) - 1.0) < 1e-4, source
        assert total > 0
    # global proportions track 80/10/10 (loose: small-sample binomial)
    n = sum(sum(s.values()) for s in by_source.values())
    n_train = sum(s.get("train", 0) for s in by_source.values())
    assert abs(n_train / n - 0.8) < 0.08, n_train / n
    # determinism: a second run assigns identically
    again = curate_stratified_split(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_semantic_dedup_matches_numpy_golden(spark, sf_dir):
    """Independent NumPy reimplementation: centroid assignment by
    cosine (tie -> smaller cid), drop j iff an earlier same-cluster i
    has cos >= tau. The registered threshold must actually drop rows
    on the fixture corpus (the drop path is exercised, not vacuous).
    """
    import numpy as np

    from reddit_can_bigdata_spark.operators.similarity import (
        CODEBOOK_FIXTURE,
        SEMDEDUP_TAU,
        sim_semantic_dedup,
    )

    cents = sorted(
        (r["cid"], np.array(r["cv"], dtype=float))
        for r in spark.read.parquet(CODEBOOK_FIXTURE).collect()
    )
    cn = np.array([c / np.linalg.norm(c) for _, c in cents])
    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=float))
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    )
    ids = [v for v, _ in rows]
    E = np.array([e for _, e in rows])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cid = (En @ cn.T).argmax(axis=1)  # argmax returns FIRST max (tie -> min cid)
    S = En @ En.T
    golden_kept = {}
    for j in range(len(ids)):
        earlier = [i for i in range(j) if cid[i] == cid[j] and S[i, j] >= SEMDEDUP_TAU]
        golden_kept[ids[j]] = not earlier
    out = {r["vec_id"]: r for r in sim_semantic_dedup(spark, sf_dir).collect()}
    assert set(out) == set(ids)
    assert {v for v, r in out.items() if not r["kept"]}, "no drops: tau vacuous"
    for v in ids:
        assert out[v]["kept"] == golden_kept[v], v
        assert out[v]["cid"] == cid[ids.index(v)], v


def test_gopher_repetition_matches_python_golden(spark, sf_dir):
    """Pure-Python reimplementation of all five Gopher repetition
    metrics (top-{2,3,4}-gram char coverage, dup-{5,8}-gram repeated
    chars) on the fixture corpus, compared doc-by-doc."""
    from collections import Counter

    from reddit_can_bigdata_spark.operators.pretrain import (
        pretrain_gopher_repetition,
    )

    def metrics(text: str):
        toks = [t for t in text.split(" ") if t]
        if len(toks) < 2:
            return None
        total = len(" ".join(toks))
        out = {"total_chars": total}
        for n in (2, 3, 4, 5, 8):
            grams = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            topc = max((c * len(g) for g, c in grams.items()), default=0)
            dupc = sum((c - 1) * len(g) for g, c in grams.items() if c > 1)
            out[n] = (topc, dupc)
        out["keep"] = (
            5 * out[2][0] <= total
            and 50 * out[3][0] <= 9 * total
            and 25 * out[4][0] <= 4 * total
            and 20 * out[5][1] <= 3 * total
            and 25 * out[8][1] <= 3 * total
        )
        return out

    import math

    def r6(x: float) -> float:
        # Spark/DuckDB round() is half-UP; Python's is half-even
        return math.floor(x * 1e6 + 0.5) / 1e6

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    golden = {d: m for d, t in docs.items() if (m := metrics(t)) is not None}
    out = {r["doc_id"]: r for r in pretrain_gopher_repetition(spark, sf_dir).collect()}
    assert set(out) == set(golden)
    for d, g in golden.items():
        r = out[d]
        assert r["total_chars"] == g["total_chars"], d
        assert r["top2_frac"] == r6(g[2][0] / g["total_chars"]), d
        assert r["top3_frac"] == r6(g[3][0] / g["total_chars"]), d
        assert r["top4_frac"] == r6(g[4][0] / g["total_chars"]), d
        assert r["dup5_frac"] == r6(g[5][1] / g["total_chars"]), d
        assert r["dup8_frac"] == r6(g[8][1] / g["total_chars"]), d
        assert r["keep"] == g["keep"], d
    assert any(not r["keep"] for r in out.values()) or all(
        r["keep"] for r in out.values()
    )  # smoke: decision column populated either way


def test_dsir_logweight_matches_python_golden(spark, sf_dir):
    """Independent Python DSIR: md5 bucket hashing, Laplace-smoothed
    bucket models, sum of log ratios. Also checks the discriminative
    property: the weights are not all equal (the target slice differs
    from the corpus)."""
    import hashlib
    import math
    from collections import Counter

    from reddit_can_bigdata_spark.operators.curation import (
        DSIR_BUCKETS,
        DSIR_EVAL_MOD,
        curate_dsir_logweight,
    )

    def bucket(gr: str) -> int:
        return int(hashlib.md5(f"ds:{gr}".encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    def bigrams(text: str) -> list[str]:
        toks = [t for t in text.split(" ") if t]
        return [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    t_hist: Counter = Counter()
    r_hist: Counter = Counter()
    doc_buckets = {}
    for d, text in docs.items():
        bs = [bucket(g) for g in bigrams(text)]
        doc_buckets[d] = bs
        (t_hist if d % DSIR_EVAL_MOD == 0 else r_hist).update(bs)
    tt, rt = sum(t_hist.values()), sum(r_hist.values())

    def lrat(b: int) -> float:
        return math.log((t_hist[b] + 1.0) / (tt + DSIR_BUCKETS)) - math.log(
            (r_hist[b] + 1.0) / (rt + DSIR_BUCKETS)
        )

    out = {r["doc_id"]: r for r in curate_dsir_logweight(spark, sf_dir).collect()}
    expect = {
        d for d, bs in doc_buckets.items() if d % DSIR_EVAL_MOD != 0 and bs
    }
    assert set(out) == expect
    import pytest

    for d in expect:
        got = out[d]
        assert got["n_grams"] == len(doc_buckets[d]), d
        golden = sum(lrat(b) for b in doc_buckets[d])
        # float-sum order differs (distributed vs sequential): approx
        assert got["log_weight"] == pytest.approx(golden, abs=1e-4), d
    weights = {r["log_weight"] for r in out.values()}
    assert len(weights) > 1, "degenerate: all docs scored identically"


def test_bm25_matches_python_golden(spark, sf_dir):
    """Pure-Python BM25 over the fixture corpus; the Spark top-k must
    equal the Python ranking (score to 6dp, ties by doc_id)."""
    import math

    from reddit_can_bigdata_spark.operators.textstats import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
        text_bm25_topk,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    docs = {d: t for d, t in docs.items() if t}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {
        q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY
    }

    def score(toks):
        s = 0.0
        for q in BM25_QUERY:
            tf = toks.count(q)
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1)
            s += idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avgdl)
            )
        return s

    ranked = sorted(
        ((score(t), d) for d, t in docs.items()), key=lambda x: (-x[0], x[1])
    )[:BM25_TOPK]
    out = [(r["doc_id"], r["bm25"]) for r in text_bm25_topk(spark, sf_dir).collect()]
    assert [d for _, d in ranked] == [d for d, _ in out]
    import pytest

    for (gs, _), (_, ob) in zip(ranked, out):
        assert ob == pytest.approx(gs, abs=1e-6)
    assert out[0][1] > 0  # the query terms actually occur


def test_ccnet_buckets_balanced_and_ordered(spark, sf_dir):
    """Per source: tercile sizes differ by at most 1 (ntile contract)
    and every head doc scores >= every middle doc >= every tail doc
    (ordering by the rounded logprob)."""
    from collections import defaultdict

    from reddit_can_bigdata_spark.operators.pretrain import (
        pretrain_ccnet_buckets,
    )

    rows = pretrain_ccnet_buckets(spark, sf_dir).collect()
    by_source = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_source[r["source"]][r["ppl_bucket"]].append(r["avg_logprob"])
    assert by_source
    for source, buckets in by_source.items():
        sizes = [len(buckets[b]) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (source, sizes)
        assert min(buckets["head"]) >= max(buckets["middle"]), source
        assert min(buckets["middle"]) >= max(buckets["tail"]), source


def test_passage_dedup_frame_edge_cases(spark):
    """Constructed inputs the fixture corpus lacks: empty text,
    whitespace-only, single token, a doc that is 100% duplicate
    passages of an earlier doc, and an intra-doc repeat."""
    from reddit_can_bigdata_spark.operators.dedup import (
        PASSAGE_W,
        passage_dedup_frame,
    )

    w16 = " ".join(["tok"] * PASSAGE_W)  # one full all-equal passage
    rows = [
        (1, " ".join(f"w{i}" for i in range(PASSAGE_W * 2))),  # 2 passages
        (2, ""),  # empty
        (3, "   "),  # whitespace-only
        (4, "solo"),  # single token -> 1 short passage
        (5, " ".join(f"w{i}" for i in range(PASSAGE_W * 2))),  # full dup of 1
        (6, w16 + " " + w16),  # intra-doc repeat: 2 identical passages
    ]
    out = {
        r["doc_id"]: r
        for r in passage_dedup_frame(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_passages"] == 0 and out[2]["n_kept"] == 0
    assert out[2]["text_deduped"] == ""
    assert out[3]["n_passages"] == 0 and out[3]["text_deduped"] == ""
    assert out[4]["n_kept"] == 1 and out[4]["text_deduped"] == "solo"
    assert out[5]["n_kept"] == 0 and out[5]["text_deduped"] == ""  # all dups
    assert out[6]["n_passages"] == 2 and out[6]["n_kept"] == 1
    assert out[6]["text_deduped"] == w16


def test_gopher_frame_edge_cases(spark):
    """Pure repetition must fail every threshold; all-distinct text
    must pass; sub-2-token docs are out of scope."""
    from reddit_can_bigdata_spark.operators.pretrain import (
        gopher_repetition_frame,
    )

    rows = [
        (1, "spam " * 50),  # one token repeated 50x
        (2, " ".join(f"w{i}" for i in range(50))),  # all distinct
        (3, "solo"),  # 1 token -> filtered
        (4, ""),  # empty -> filtered
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_repetition_frame(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {1, 2}
    assert not out[1]["keep"]  # pure repetition fails
    assert out[1]["dup5_frac"] > 0.9 and out[1]["top2_frac"] > 0.15
    assert out[2]["keep"]  # all-distinct passes
    assert out[2]["dup5_frac"] == 0.0 and out[2]["dup8_frac"] == 0.0


def test_incremental_dedup_constructed_batch(spark, tmp_path):
    """Constructed corpus exercising all three statuses, including the
    exact-dup branch that the synthetic corpus never hits (its texts
    are unique): doc 10 is a byte-identical copy of corpus doc 3,
    doc 20 a near-copy of corpus doc 7, doc 30 unrelated."""
    from reddit_can_bigdata_spark.operators.dedup import (
        dedup_incremental_batch,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " changed"
    other = " ".join(f"zz{i}" for i in range(40))
    rows = [
        (3, base),
        (7, " ".join(f"tok{i}" for i in range(40))),  # == base text too
        (9, other),
        (10, base),  # new: exact dup of 3 (and 7)
        (20, near),  # new: near dup of 3/7
        (30, " ".join(f"qq{i}" for i in range(40))),  # new: novel
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in dedup_incremental_batch(spark, sf).collect()}
    assert set(out) == {10, 20, 30}
    assert out[10]["status"] == "exact_dup" and out[10]["match_id"] == 3
    assert out[20]["status"] == "near_dup" and out[20]["match_id"] in (3, 7)
    assert out[30]["status"] == "novel" and out[30]["match_id"] is None


def test_bigram_logprob_matches_python_golden(spark, sf_dir):
    """Pure-Python Jelinek-Mercer bigram model over the fixture
    corpus; per-doc mean log-prob compared at 1e-9 (float-sum order
    differs between engines; the registered query rounds to 6dp)."""
    import math
    from collections import Counter

    import pytest

    from reddit_can_bigdata_spark.operators.pretrain import (
        BIGRAM_LAMBDA,
        pretrain_bigram_logprob,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in docs.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())

    out = {
        r["doc_id"]: r for r in pretrain_bigram_logprob(spark, sf_dir).collect()
    }
    expect = {d for d, t in docs.items() if len(t) >= 2}
    assert set(out) == expect
    for d in expect:
        toks = docs[d]
        lps = [
            math.log(
                BIGRAM_LAMBDA * bi[(p, c)] / uni[p]
                + (1 - BIGRAM_LAMBDA) * uni[c] / total
            )
            for p, c in zip(toks, toks[1:])
        ]
        assert out[d]["n_bigrams"] == len(lps), d
        assert out[d]["avg_logprob2"] == pytest.approx(
            sum(lps) / len(lps), abs=1e-6
        ), d
    # discriminative: scores vary across docs
    assert len({r["avg_logprob2"] for r in out.values()}) > 1
