"""The fluent Pipeline API must produce the same results as the
directly-declared DataFrame plans (it IS the same plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.api import Pipeline
from redmap_spark.inventory.mapreduce import mr_chain, mr_reduce_by_key
from redmap_spark.catalog import Catalog
from tests.conftest import SF_DIR, SF_SMALL


def _sorted(rows):
    return sorted((tuple(r) for r in rows))


def test_pipeline_wordcount_matches_direct(spark):
    wc = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/documents.parquet")
        .flat_map(F.explode(F.split("text", " ")), alias="token")
        .reduce_by_key("token", n=F.count(F.lit(1)))
    )
    direct = mr_reduce_by_key(spark, SF_SMALL)
    assert _sorted(wc.collect()) == _sorted(direct.collect())


def test_pipeline_chain_matches_direct(spark):
    chain = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/documents.parquet")
        .filter(F.col("lang") == "en")
        .flat_map(F.explode(F.split(F.lower("text"), " ")), alias="token")
        .filter(F.length("token") > 4)
        .reduce_by_key("token", n=F.count(F.lit(1)))
        .top(20, F.desc("n"), F.asc("token"))
    )
    assert _sorted(chain.collect()) == _sorted(mr_chain(spark, SF_SMALL).collect())


def test_pipeline_reduce_scalar(spark):
    p = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/orders.parquet")
        .map(total=F.col("o_totalprice").cast("decimal(18,2)"))
        .reduce(grand_total=F.sum("total").cast("double"), n=F.count(F.lit(1)))
    )
    [row] = p.collect()
    assert row.n > 0 and row.grand_total > 0


def test_pipeline_is_lazy_and_fused(spark):
    """The whole chain must compile to ONE plan — a late filter is
    still visible to Catalyst (no materialization between steps)."""
    p = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/events.parquet")
        .map("event_type", "value")
        .filter(F.col("event_type") == "click")
    )
    plan = p.df._jdf.queryExecution().toString()
    assert "click" in plan  # filter reached the single compiled plan


def test_pipeline_join_broadcast(spark):
    from redmap_spark.plans.explain import plan_string

    c = Catalog(spark, SF_DIR)
    orders = Pipeline.from_df(c.orders)
    custs = Pipeline.from_df(c.customer)
    joined = orders.join(custs.map("c_custkey", "c_mktsegment").map(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment")
    ), on="o_custkey", broadcast=True)
    per_seg = joined.reduce_by_key("c_mktsegment", n=F.count(F.lit(1)))
    assert "BroadcastHashJoin" in plan_string(per_seg.df, "formatted")
    rows = {r.c_mktsegment: r.n for r in per_seg.collect()}
    assert sum(rows.values()) == c.orders.count()


def test_pipeline_sample_deterministic(spark):
    c = Catalog(spark, SF_DIR)
    p = Pipeline.from_df(c.orders).sample(0.1, key="o_orderkey")
    n1, n2 = p.count(), p.count()
    assert n1 == n2
    total = c.orders.count()
    assert 0.05 * total < n1 < 0.15 * total


def test_pipeline_stratified_sample(spark):
    c = Catalog(spark, SF_DIR)
    fr = {"purchase": 1.0, "view": 0.1}
    p = Pipeline.from_df(c.events).stratified_sample(fr, "event_type", key="event_id")
    got = {r.event_type: r.n for r in p.reduce_by_key("event_type", n=F.count(F.lit(1))).collect()}
    full = {r.event_type: r.n for r in Pipeline.from_df(c.events).reduce_by_key("event_type", n=F.count(F.lit(1))).collect()}
    assert set(got) == {"purchase", "view"}  # unlisted strata dropped
    assert got["purchase"] == full["purchase"]
    assert 0.05 * full["view"] < got["view"] < 0.15 * full["view"]
    # deterministic
    again = {r.event_type: r.n for r in p.reduce_by_key("event_type", n=F.count(F.lit(1))).collect()}
    assert got == again


def test_pipeline_observe_metrics(spark):
    from pyspark.sql import Observation

    c = Catalog(spark, SF_DIR)
    obs = Observation("metrics")
    df = c.events.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    n = df.filter(F.col("value") > 0).count()  # any action materializes metrics
    assert obs.get["n"] == c.events.count()
    assert n <= obs.get["n"]


def test_pipeline_near_dedup(spark):
    """Fluent near-dedup keeps exactly the keep-list representatives."""
    from redmap_spark.operators.dedup import near_dedup_keep_list

    docs = Catalog(spark, SF_DIR).documents
    via_pipeline = {
        r.doc_id for r in Pipeline.from_df(docs).near_dedup(threshold=0.5).collect()
    }
    direct = {r.doc_id for r in near_dedup_keep_list(docs, threshold=0.5).collect()}
    assert via_pipeline == direct
    assert via_pipeline  # non-empty


def test_pipeline_decontaminate(spark):
    """Rows sharing a 5-gram with the benchmark are dropped; clean
    rows and too-short rows survive."""
    from pyspark.sql import Row

    bench = spark.createDataFrame([Row(text="the quick brown fox jumps over it")])
    rows = [
        Row(doc_id=1, text="zzz the quick brown fox jumps over something"),  # shares 5-gram
        Row(doc_id=2, text="a completely different document body here now"),
        Row(doc_id=3, text="too short"),
    ]
    df = spark.createDataFrame(rows)
    kept = {r.doc_id for r in Pipeline.from_df(df).decontaminate(bench).collect()}
    assert kept == {2, 3}


def test_pipeline_training_corpus_chain(spark):
    """The full fluent training-corpus DSL in one chain:
    normalize -> quality_gate -> near_dedup -> decontaminate ->
    chunk -> pack. Invariants: every pack respects the token budget
    (or is a singleton oversize), no token is lost between the
    chunked corpus and the packed rows, and the chain is
    deterministic end-to-end."""
    from pyspark.sql import Row

    docs = Catalog(spark, SF_DIR).documents
    bench = spark.createDataFrame(
        [Row(text="key agg row scan slow fast table value part hash")]
    )

    def run():
        gated = (
            Pipeline.from_df(docs)
            .normalize()
            .quality_gate(min_words=10, max_words=1000, min_stop_hits=0)
            .near_dedup(threshold=0.5)
            .decontaminate(bench)
        )
        chunks = gated.chunk(chunk_tokens=50, stride=50)  # disjoint chunks
        packs = chunks.pack(budget=64)
        return chunks, packs

    chunks, packs = run()
    chunk_rows = chunks.collect()
    pack_rows_ = packs.collect()
    assert chunk_rows and pack_rows_

    for r in pack_rows_:
        assert r.n_tokens <= 64 or r.n_seqs == 1, r

    total_chunk_tokens = sum(r.n_chunk_tokens for r in chunk_rows)
    total_packed_tokens = sum(r.n_tokens for r in pack_rows_)
    assert total_packed_tokens == total_chunk_tokens  # loss-less

    # determinism: identical chain -> identical pack count + token sum
    _, packs2 = run()
    again = packs2.collect()
    assert len(again) == len(pack_rows_)
    assert sum(r.n_tokens for r in again) == total_packed_tokens


def test_pipeline_tokenize_bpe(spark):
    """The fluent chain normalize -> tokenize_bpe produces one row
    per doc with loss-bounded subword counts, matching the direct
    operator call."""
    from redmap_spark.api import Pipeline
    from redmap_spark.catalog import Catalog
    from redmap_spark.operators import bpe
    from tests.conftest import SF_DIR

    d = Catalog(spark, SF_DIR).documents
    out = (
        Pipeline(d)
        .normalize()
        .tokenize_bpe()
        .df.toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == d.count()
    assert (out["n_words"] <= out["n_subwords"]).all()

    from redmap_spark.operators.textstats import normalized
    from pyspark.sql import functions as F

    norm = d.withColumn("text", normalized("text"))
    merges = bpe.train_merges(bpe.sample_texts(norm), 64)
    direct = (
        bpe.bpe_apply(norm, merges).toPandas().set_index("doc_id").sort_index()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(out, direct)


def test_pipeline_blocklist(spark):
    """The fluent blocklist gate keeps exactly the docs txt_blocklist
    reports unblocked, and the predicate is a pure scan filter (no
    exchange, no Python)."""
    from redmap_spark.api import Pipeline
    from redmap_spark.catalog import Catalog
    from redmap_spark.inventory.text2 import _BLOCK_TERMS
    from redmap_spark.inventory import QUERIES
    from redmap_spark.plans import explain as E
    from tests.conftest import SF_DIR

    d = Catalog(spark, SF_DIR).documents
    kept = Pipeline(d).blocklist(_BLOCK_TERMS).df
    want = {
        r.doc_id
        for r in QUERIES["txt_blocklist"](spark, SF_DIR).collect()
        if r.blocked == 0
    }
    got = {r.doc_id for r in kept.collect()}
    assert got == want
    plan = E.plan_string(kept, "formatted")
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_pipeline_blocklist_keeps_null_text(spark):
    """NULL-text rows carry no hits: the fluent gate must KEEP them,
    matching txt_blocklist's blocked=0 convention."""
    from pyspark.sql import functions as F

    from redmap_spark.api import Pipeline

    df = spark.createDataFrame(
        [(1, "slow slow slow dup"), (2, "clean words only here"), (3, None)],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in Pipeline(df).blocklist(["slow", "dup"]).df.collect()}
    assert kept == {2, 3}


def test_readability_and_compress_gates(spark):
    """readability_gate keeps only docs at/above the Flesch floor
    (matching a direct flesch_score computation), and compress_gate
    drops the repetitive doc while preserving schema and the diverse
    rows."""
    from pyspark.sql import Row

    from redmap_spark.api import Pipeline
    from redmap_spark.operators.textstats import flesch_score
    from pyspark.sql import functions as F

    docs = [
        Row(doc_id=0, text="the cat sat. it was flat. a mat!"),
        Row(doc_id=1, text="incomprehensibility notwithstanding "
                           "institutionalization perpendicularity"),
        Row(doc_id=2, text="spam " * 200),
    ]
    df = spark.createDataFrame(docs)
    scores = {
        r.doc_id: r.f
        for r in df.select("doc_id", flesch_score("text").alias("f")).collect()
    }
    floor = 10.0
    kept = {r.doc_id for r in Pipeline.from_df(df).readability_gate(floor).collect()}
    assert kept == {i for i, s in scores.items() if s >= floor}
    assert 1 not in kept  # polysyllabic monster scores below any sane floor

    out = Pipeline.from_df(df).compress_gate(0.35)
    rows = out.collect()
    assert out.df.schema == df.schema
    ids = {r.doc_id for r in rows}
    assert 2 not in ids      # "spam spam spam..." compresses to almost nothing
    assert {0, 1} <= ids     # natural-ish text survives


def test_chat_format_stage(spark):
    """Pipeline.chat_format renders the same template as the
    txt_chat_format inventory entry and stays JVM-only."""
    from redmap_spark.api import Pipeline
    from redmap_spark.catalog import Catalog
    from redmap_spark.plans import explain as E
    from tests.conftest import SF_DIR

    d = Catalog(spark, SF_DIR).documents.limit(50)
    out = Pipeline.from_df(d).chat_format().df
    assert not E.has_python_eval(out)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.prompt.startswith("<|system|>You are a helpful assistant.<|user|>")
        assert r.prompt.endswith("<|assistant|>")
        assert r.prompt_tokens >= r.target_tokens
        assert r.truncated == int(r.prompt_tokens + r.target_tokens > 512)


def test_perplexity_gate(spark):
    """perplexity_gate drops the out-of-distribution doc a reference
    KN bigram model finds surprising, keeps in-distribution docs,
    keeps docs the model cannot judge (coverage below floor), stays
    pure-DataFrame (no Python eval nodes), and is deterministic."""
    from redmap_spark.plans.explain import has_python_eval

    normal = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, normal) for i in range(40)]
    rows.append((100, "the cat sat on the mat and the dog sat on the rug"))
    rows.append((101, "rug the mat dog cat on and sat the the mat zz qq"))
    rows.append((102, "zz qq xx yy ww vv uu tt ss rr"))  # near-zero coverage
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = spark.createDataFrame(
        [(i, normal) for i in range(40)], "doc_id long, text string"
    )
    from redmap_spark.api import Pipeline

    out = Pipeline.from_df(df).perplexity_gate(
        max_ppl=8.0, reference=Pipeline.from_df(ref)
    )
    kept = {r.doc_id for r in out.collect()}
    assert 100 in kept        # in-distribution survives
    assert 101 not in kept    # shuffled word salad is surprising
    assert 102 in kept        # unjudgeable (low coverage) is kept
    assert out.df.columns == df.columns
    assert not has_python_eval(out.df)
    again = {r.doc_id for r in Pipeline.from_df(df).perplexity_gate(
        max_ppl=8.0, reference=Pipeline.from_df(ref)).collect()}
    assert kept == again
