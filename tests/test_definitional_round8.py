"""Round-8 extension of the independent-definition battery
(tests/test_definitional.py): third implementations in plain
pandas/Python for the queries added this round — the dashboard serving
variants and the e2e pipeline report row. Same doctrine: no SQL, no
Spark expressions, formulas re-derived from the documented definition,
so agreement requires the same bug in three independently-phrased
programs."""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_dash_posts_explorer_matches_filter_sort_head(spark, sf_dir):
    """subreddit equality + score floor + score-desc/doc_id-asc head-15,
    word_count = whitespace-split length, preview = first 80 chars."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    picked = docs[(docs.source == "src7") & (docs.n_chars >= 120)].copy()
    picked["word_count"] = picked.text.map(
        lambda t: len(re.split(r"\s+", t.strip()))
    )
    picked["title_preview"] = picked.text.str[:80]
    picked = picked.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(15)
    want = [
        (r.doc_id, r.source, r.n_chars, r.word_count, r.title_preview)
        for r in picked.itertuples()
    ]

    got_df = _run("dash_posts_explorer", spark, sf_dir)
    got = [tuple(r) for r in got_df.itertuples(index=False)]
    assert got == want


def test_dash_sentiment_samples_matches_pure_python_vader(spark, sf_dir):
    """Labels from the pure-Python VADER reference (same published rule
    set, independent of both the Spark expression chain and the DuckDB
    twin), strongest-|compound|-first with doc_id tiebreak, head-5."""
    from reddit_can_bigdata_spark.functions.vader import vader_compound_py

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        c = round(vader_compound_py(r.text), 6) + 0.0  # -0.0 -> +0.0
        label = (
            "positive" if c >= 0.05 else "negative" if c <= -0.05 else "neutral"
        )
        if label == "positive":
            rows.append((r.doc_id, c, label))
    rows.sort(key=lambda t: (-abs(t[1]), t[0]))
    want = rows[:5]

    got_df = _run("dash_sentiment_samples", spark, sf_dir)
    got = [
        (r.doc_id, round(r.compound, 6), r.vader_label)
        for r in got_df.itertuples()
    ]
    assert got == want


def test_dash_stats_timeline_matches_decimal_rollup(spark, sf_dir):
    """[start, end) day/type counts; total_value re-derived with exact
    decimal arithmetic mirroring the documented cast-to-DECIMAL(20,6)
    HALF_UP sum, rounded half-up to 4dp."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev.ts)
    lo, hi = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-20")
    ev = ev[(ts >= lo) & (ts < hi)].copy()
    ev["day"] = pd.to_datetime(ev.ts).dt.strftime("%Y-%m-%d")

    want = {}
    for (day, et), grp in ev.groupby(["day", "event_type"]):
        total = sum(
            (
                Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                for v in grp.value
            ),
            Decimal(0),
        )
        want[(day, et)] = (
            len(grp),
            float(total.quantize(Decimal("0.0001"), ROUND_HALF_UP)),
        )

    got_df = _run("dash_stats_timeline", spark, sf_dir)
    got = {
        (r.day, r.event_type): (r.cnt, round(r.total_value, 4))
        for r in got_df.itertuples()
    }
    assert got == want
    assert got  # the fixture range is non-empty


def test_pipeline_e2e_report_matches_first_principles(spark, sf_dir):
    """The e2e report row re-derived from raw parquet: aggregates,
    DAG branch thresholds (50/30), sentiment_results = ETL-filtered
    count when ML runs, coverage 100.0/0.0, network_users =
    min(20, |graph nodes|) where nodes come from the co-order supplier
    graph (u<v canonical pairs) when the network gate passes."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    events = pd.read_parquet(f"{sf_dir}/events.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ].drop_duplicates()

    posts, comments = len(docs), len(events)
    processed = int((docs.text.str.len() > 20).sum())
    unique_users = int(events.user_id.nunique())
    ml = processed >= 50
    net = unique_users >= 30

    nodes = set()
    for _, grp in li.groupby("l_orderkey"):
        ks = sorted(grp.l_suppkey)
        if len(ks) > 1:
            nodes.update(ks)
    want = (
        posts,
        comments,
        processed,
        unique_users,
        "run_ml_analysis" if ml else "skip_ml",
        "run_network_analysis" if net else "skip_network",
        processed if ml else 0,
        100.0 if (ml and processed) else 0.0,
        min(20, len(nodes)) if net else 0,
    )

    got_df = _run("pipeline_e2e", spark, sf_dir)
    assert len(got_df) == 1
    got = tuple(got_df.iloc[0])
    assert got == want


def test_pack_firstfit_matches_greedy_recurrence(spark, sf_dir):
    """Third implementation of the no-split packer: plain Python greedy
    over pandas, re-derived from the rule 'a doc that would overflow
    the open bin closes it; docs truncate to the budget'."""
    from reddit_can_bigdata_spark.operators.pretrain import PACK_BUDGET

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for source, grp in docs.groupby("source"):
        grp = grp.sort_values("doc_id")
        bin_id, fill, first = 1, 0, True
        for r in grp.itertuples():
            tok = min(len([t for t in r.text.split(" ") if t]), PACK_BUDGET)
            if not first and fill + tok <= PACK_BUDGET:
                fill += tok
            else:
                if not first:
                    bin_id += 1
                fill = tok
            first = False
            want[r.doc_id] = (source, tok, bin_id, fill)

    got_df = _run("pretrain_pack_firstfit", spark, sf_dir)
    got = {
        r.doc_id: (r.source, r.n_tokens, r.bin_id, r.bin_fill)
        for r in got_df.itertuples()
    }
    assert got == want


def test_kmeans_lloyd_matches_numpy_quantized_lloyd(spark, sf_dir):
    """Third implementation of the trainer: numpy Lloyd with the same
    documented quantization contract (6dp-rounded centroids as the
    iterated state, smallest-cid tie-break, empty clusters keep their
    centroid) — but numpy VECTORIZED distance/mean arithmetic, a
    different summation ORDER than both engines' sequential folds, so
    agreement shows the quantization really does absorb FP noise."""
    import numpy as np

    from reddit_can_bigdata_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.embedding.notna()].sort_values("vec_id")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    C = X[ids < KMEANS_K].copy()

    assign = None
    for _ in range(KMEANS_ROUNDS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the first (lowest cid) tie
        for c in range(KMEANS_K):
            members = X[assign == c]
            if len(members):
                C[c] = np.round(members.mean(axis=0), 6)

    got = _run("sim_kmeans_lloyd", spark, sf_dir)
    for c in range(KMEANS_K):
        g = got[got.cid == c].sort_values("dim")
        np.testing.assert_allclose(
            g.centroid.to_numpy(), C[c], atol=2e-6,
            err_msg=f"centroid {c} diverged from numpy Lloyd",
        )
        assert g.n_members.iloc[0] == int((assign == c).sum())


def test_ivf_balance_matches_numpy_argmax(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.embedding.notna()].sort_values("vec_id")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    C = X[ids < 8]
    sims = (X @ C.T) / (
        np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
    )
    assign = sims.argmax(axis=1)
    n = len(X)
    counts = {c: int((assign == c).sum()) for c in range(8)}
    imb = round(max(counts.values()) * 8 / n, 6)

    got = _run("sim_ivf_balance", spark, sf_dir)
    for r in got.itertuples():
        assert r.n_vectors == counts[r.cid], r
        assert abs(r.share - counts[r.cid] / n) < 1e-6
        assert abs(r.imbalance_factor - imb) < 1e-6


def test_scd1_upsert_matches_dict_replay(spark, sf_dir):
    """Third implementation of the MERGE: the reference's sequential
    per-row update_one replay — a dict keyed by order key, base first,
    then updates in version order (last write wins)."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    state = {}
    for r in orders.itertuples():
        if r.o_orderkey % 10 >= 3:
            state[r.o_orderkey] = (r.o_custkey, r.o_totalprice, r.o_orderstatus)
    for r in orders.itertuples():  # version 1
        if r.o_orderkey % 10 < 3 and r.o_orderkey % 2 == 0:
            state[r.o_orderkey] = (r.o_custkey, round(r.o_totalprice * 1.1, 2), "U1")
    for r in orders.itertuples():  # version 2 (wins)
        if r.o_orderkey % 10 < 3:
            state[r.o_orderkey] = (r.o_custkey, round(r.o_totalprice * 1.2, 2), "U2")

    got_df = _run("warehouse_scd1_upsert", spark, sf_dir)
    got = {
        r.o_orderkey: (r.o_custkey, round(r.o_totalprice, 2), r.o_orderstatus)
        for r in got_df.itertuples()
    }
    assert got == state


def test_p9_flag_selection_matches_ranking_membership(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    from decimal import Decimal

    totals = {}
    for r in orders.itertuples():
        totals[r.o_custkey] = totals.get(r.o_custkey, Decimal(0)) + Decimal(
            str(r.o_totalprice)
        )
    top20 = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    ranks = {k: i + 1 for i, (k, _) in enumerate(top20)}
    names = dict(zip(cust.c_custkey, cust.c_name))
    want = {
        (k, names[k], True, rank) for k, rank in ranks.items() if k in names
    }

    got_df = _run("p9_flag_selection", spark, sf_dir)
    got = {
        (r.c_custkey, r.c_name, r.is_influencer, r.influencer_rank)
        for r in got_df.itertuples()
    }
    assert got == want


def test_epoch_plan_matches_formula(spark, sf_dir):
    import math

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uniq = {
        s: int(sum(len([t for t in txt.split(" ") if t]) for txt in g.text))
        for s, g in docs.groupby("source")
    }
    raw = {s: u ** 0.7 for s, u in uniq.items()}
    tot = sum(raw.values())
    want = {}
    for s, u in uniq.items():
        desired = math.floor(raw[s] / tot * 150_000)
        realized = min(desired, u * 4)
        want[s] = (u, desired, realized, round(realized / u, 6), desired > u * 4)

    got_df = _run("curate_epoch_plan", spark, sf_dir)
    got = {
        r.source: (
            r.unique_tokens,
            r.desired_tokens,
            r.realized_tokens,
            round(r.epochs, 6),
            r.capped,
        )
        for r in got_df.itertuples()
    }
    assert got == want


def test_streaming_static_enrichment_matches_dict_replay(spark, sf_dir):
    """Third implementation of the stream-static enrichment rollup:
    plain Python dict accumulation with exact Decimal arithmetic —
    profile totals first, then the per-type counts/VIP counts/sums."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    q6 = Decimal("0.000001")
    profile = {}
    for r in ev.itertuples():
        profile[r.user_id] = profile.get(r.user_id, Decimal(0)) + Decimal(
            r.value
        ).quantize(q6, ROUND_HALF_UP)
    want = {}
    for r in ev.itertuples():
        n, vip, tot = want.get(r.event_type, (0, 0, Decimal(0)))
        is_vip = profile[r.user_id] >= Decimal("300.0")
        want[r.event_type] = (
            n + 1,
            vip + (1 if is_vip else 0),
            tot + Decimal(r.value).quantize(q6, ROUND_HALF_UP),
        )
    want = {
        k: (n, vip, float(t.quantize(Decimal("0.0001"), ROUND_HALF_UP)))
        for k, (n, vip, t) in want.items()
    }

    got_df = _run("streaming_static_enrichment", spark, sf_dir)
    got = {
        r.event_type: (r.n_events, r.n_vip_events, round(r.total_value, 4))
        for r in got_df.itertuples()
    }
    assert got == want


def test_every_round8_mirrored_query_exists_in_registry():
    """Battery self-check (same rule as test_definitional.py): a query
    rename must not silently orphan its ground-truth mirror; shrinking
    round-8 coverage fails."""
    import re
    from pathlib import Path

    src = Path(__file__).read_text()
    mirrored = set(re.findall(r'_run\("([a-z0-9_]+)"', src))
    missing = mirrored - set(REGISTRY)
    assert not missing, f"mirrored but not registered: {sorted(missing)}"
    assert len(mirrored) >= 11  # the round-8 scope floor
