"""Round-9 extension of the independent-definition battery: third
implementations in plain pandas/Python for the queries added this
round — the lake-maintenance tier and the two Python-DataSource
streaming round trips. Same doctrine as tests/test_definitional.py:
no SQL, no Spark expressions, formulas re-derived from the documented
definition, so agreement requires the same bug in three
independently-phrased programs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def _dec_sum_round4(values) -> float:
    """The registry's money-math convention, re-derived by hand:
    per-value quantize to 6 dp (DECIMAL(20,6) cast), exact Decimal
    accumulation, half-up round to 4 dp, then one float conversion."""
    q6 = Decimal("0.000001")
    total = sum(
        (Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP) for v in values),
        Decimal(0),
    )
    return float(total.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def test_backfill_overwrite_matches_hand_rollup(spark, sf_dir):
    """Week-window rollup with the 2024-01-15 correction (value
    doubled) applied inline, per (day, event_type)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    ev = ev[
        (ev.ts >= pd.Timestamp("2024-01-12")) & (ev.ts < pd.Timestamp("2024-01-18"))
    ].copy()
    target = (ev.ts >= pd.Timestamp("2024-01-15")) & (
        ev.ts < pd.Timestamp("2024-01-16")
    )
    ev.loc[target, "value"] = ev.loc[target, "value"] * 2
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    want = {
        (day, et): (len(g), _dec_sum_round4(g.value))
        for (day, et), g in ev.groupby(["day", "event_type"])
    }

    got_df = _run("maint_backfill_overwrite", spark, sf_dir)
    got = {
        (r.day, r.event_type): (r.cnt, r.total_value)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_compaction_rollup_matches_source_table(spark, sf_dir):
    """Compaction is content-preserving: the compacted rollup equals a
    hand rollup of the pristine source."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = {
        et: (len(g), g.event_id.nunique(), _dec_sum_round4(g.value))
        for et, g in ev.groupby("event_type")
    }
    got_df = _run("maint_compaction", spark, sf_dir)
    got = {
        r.event_type: (r.cnt, r.n_ids, r.total_value)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_schema_evolution_matches_hand_generations(spark, sf_dir):
    """Per-language: all docs counted; only odd-doc_id (generation 2)
    docs scored, score = character length of text, NULL text unscored."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for lang, g in docs.groupby("lang", dropna=False):
        gen2 = g[g.doc_id % 2 == 1]
        scored = gen2[gen2.text.notna()]
        key = None if pd.isna(lang) else lang
        want[key] = (len(g), len(scored), int(scored.text.str.len().sum()))
    got_df = _run("maint_schema_evolution", spark, sf_dir)
    got = {
        r.lang: (r.n_docs, r.n_scored, r.total_score)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_pyds_source_roundtrip_matches_hand_rollup(spark, sf_dir):
    """The capture→stream→normalize path reduces to: every document
    counted under its lang, score = n_chars with the scraper's
    0-default for missing."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for lang, g in docs.groupby("lang", dropna=False):
        key = None if pd.isna(lang) else lang
        want[key] = (len(g), int(g.n_chars.fillna(0).sum()))
    got_df = _run("streaming_pyds_source", spark, sf_dir)
    got = {
        r.subreddit: (r.cnt, r.total_score) for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_pyds_sink_roundtrip_matches_hand_rollup(spark, sf_dir):
    """The stream→sink→committed-files path is a pass-through: per-lang
    count and n_chars total (0 for missing) equal the source table."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for lang, g in docs.groupby("lang", dropna=False):
        key = None if pd.isna(lang) else lang
        want[key] = (len(g), int(g.n_chars.fillna(0).sum()))
    got_df = _run("streaming_pyds_sink", spark, sf_dir)
    got = {r.lang: (r.cnt, r.total_chars) for r in got_df.itertuples(index=False)}
    assert got == want


def test_phash_dedup_matches_hand_fingerprints(spark, sf_dir):
    """Third phrasing of the perceptual-hash dedup: scene fingerprints
    re-derived in pure Python from the synthesis formula (pixel i of
    scene s is (s*31 + i*7) % 250; brightness offsets cannot flip a
    mean-threshold bit), canonical = min media_id per fingerprint."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").dropna(subset=["doc_id"])

    def scene_hash(s: int) -> str:
        vals = [float((s * 31 + i * 7) % 250) for i in range(64)]
        mean = sum(vals) / 64.0
        return "".join("1" if v > mean else "0" for v in vals)

    d = docs[["doc_id"]].copy()
    d["phash"] = (d.doc_id % 50).map(scene_hash)
    d["canonical_id"] = d.groupby("phash").doc_id.transform("min")
    want = {
        int(r.doc_id): (r.phash, int(r.canonical_id), bool(r.doc_id != r.canonical_id))
        for r in d.itertuples()
    }
    got_df = _run("multimodal_phash_dedup", spark, sf_dir)
    got = {
        int(r.media_id): (r.phash, int(r.canonical_id), bool(r.is_dup))
        for r in got_df.itertuples(index=False)
    }
    assert got == want
