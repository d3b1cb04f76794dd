"""redmap-parity fluent Pipeline API, compiled to DataFrame plans.

The reference framework lets users chain ``map`` / ``filter`` /
``flat_map`` / ``reduce_by_key`` / ``reduce`` steps which its runtime
ships to workers. Here the same fluent surface *builds a Catalyst
logical plan*: every step is declared with Column expressions, so the
chain fuses into whole-stage-codegen'd JVM code — nothing executes
until a terminal action, and the optimizer is free to reorder
(e.g. push a late ``filter`` into the scan).

Usage::

    from redmap_spark.api import Pipeline
    wc = (Pipeline.read_parquet(spark, path)
            .filter(F.col("lang") == "en")
            .flat_map(F.explode(F.split("text", " ")), alias="token")
            .reduce_by_key("token", n=F.count(F.lit(1)))
            .df)
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Pipeline:
    """Immutable fluent wrapper; each step returns a new Pipeline."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- sources -------------------------------------------------------

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "Pipeline":
        return cls(spark.read.parquet(path))

    @classmethod
    def from_df(cls, df: DataFrame) -> "Pipeline":
        return cls(df)

    # -- transforms (all lazy, all Catalyst-visible) -------------------

    def map(self, *cols: Column | str, **named: Column) -> "Pipeline":
        """Project each record to new columns (reference: the map step)."""
        exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
        exprs += [c.alias(name) for name, c in named.items()]
        return Pipeline(self.df.select(*exprs))

    def filter(self, cond: Column) -> "Pipeline":
        return Pipeline(self.df.filter(cond))

    def flat_map(self, exploded: Column, alias: str, keep: Iterable[str] = ()) -> "Pipeline":
        """One record → N records (reference: emit-many map)."""
        cols = [F.col(c) for c in keep] + [exploded.alias(alias)]
        return Pipeline(self.df.select(*cols))

    def reduce_by_key(self, *keys: str, **aggs: Column) -> "Pipeline":
        """Associative reduce per key; Spark runs map-side partial
        aggregation before the shuffle (the reference's combiner)."""
        return Pipeline(
            self.df.groupBy(*keys).agg(*[a.alias(n) for n, a in aggs.items()])
        )

    def reduce(self, **aggs: Column) -> "Pipeline":
        """Global associative fold → single row."""
        return Pipeline(self.df.agg(*[a.alias(n) for n, a in aggs.items()]))

    def sort(self, *cols: Column | str) -> "Pipeline":
        return Pipeline(self.df.orderBy(*cols))

    def top(self, n: int, *cols: Column | str) -> "Pipeline":
        return Pipeline(self.df.orderBy(*cols).limit(n))

    def union(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self.df.union(other.df))

    def distinct(self) -> "Pipeline":
        return Pipeline(self.df.distinct())

    def join(
        self, other: "Pipeline", on: str | list[str], how: str = "inner", broadcast: bool = False
    ) -> "Pipeline":
        """Keyed join of two pipelines (reference: the join of two
        job outputs). ``broadcast=True`` marks the other side as a
        dim table — at scale, the difference between a map-side
        lookup and a full shuffle."""
        right = F.broadcast(other.df) if broadcast else other.df
        return Pipeline(self.df.join(right, on, how))

    def sample(self, fraction: float, key: str) -> "Pipeline":
        """Deterministic hash sample: keeps rows where
        xxhash64(key) mod 10000 < fraction·10000. Unlike rand()
        sampling it is stable across retries/partitionings — the only
        kind of sample that is reproducible on a cluster."""
        return Pipeline(
            self.df.filter(F.pmod(F.xxhash64(key), F.lit(10000)) < int(fraction * 10000))
        )

    def stratified_sample(
        self, fractions: dict, stratum_col: str, key: str
    ) -> "Pipeline":
        """Per-stratum deterministic hash sample (e.g. downsample the
        dominant language, keep 100% of the rare one — the standard
        training-mixture rebalance). Strata absent from ``fractions``
        are dropped."""
        frac_map = F.create_map(
            *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(int(v * 10000)))]
        )
        cut = F.coalesce(F.element_at(frac_map, F.col(stratum_col)), F.lit(0))
        return Pipeline(self.df.filter(F.pmod(F.xxhash64(key), F.lit(10000)) < cut))

    def observe(self, name: str, **metrics: Column) -> "Pipeline":
        """MapReduce-counter parity done right: accumulators
        double-count on task retries, ``DataFrame.observe`` metrics
        are exactly-once per completed action. Read them back from
        the observation after an action via the returned plan's
        listener, or use ``pyspark.sql.Observation`` (see
        tests/test_pipeline_api.py)."""
        return Pipeline(self.df.observe(name, *[c.alias(n) for n, c in metrics.items()]))

    def near_dedup(
        self, id_col: str = "doc_id", text_col: str = "text", threshold: float = 0.5
    ) -> "Pipeline":
        """Keep one representative per MinHash-LSH near-dup cluster
        (operators.dedup.near_dedup_keep_list): the fluent form of the
        corpus dedup stage — blocking-key candidates, transitive
        cluster resolution, min-id representative."""
        from redmap_spark.operators.dedup import near_dedup_keep_list

        keep = near_dedup_keep_list(
            self.df, id_col=id_col, text_col=text_col, threshold=threshold
        )
        return Pipeline(self.df.join(F.broadcast(keep), id_col, "left_semi"))

    def decontaminate(
        self, benchmark: DataFrame, text_col: str = "text", n: int = 5
    ) -> "Pipeline":
        """Drop rows sharing any token ``n``-gram with the benchmark
        set (eval decontamination). Benchmark grams broadcast; the
        corpus is scanned once with no gram-key shuffle (see
        inventory/text.py::txt_decontaminate for the plan notes)."""

        def gram_array(col: str) -> Column:
            t = F.split(col, " ")
            return F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))

        bench_set = (
            benchmark.select(F.explode(gram_array(text_col)).alias("g"))
            .agg(F.collect_set("g").alias("_bench_grams"))
        )
        kept = (
            self.df.join(F.broadcast(bench_set))
            .filter(~F.arrays_overlap(gram_array(text_col), F.col("_bench_grams")))
            .drop("_bench_grams")
        )
        return Pipeline(kept)

    def normalize(self, text_col: str = "text") -> "Pipeline":
        """Canonicalize the text column in place (lowercase, fold
        non-alphanumerics, squeeze whitespace, trim) — the prep stage
        in front of dedup/tokenization. Pure column expression, zero
        shuffle; the ONE shared canonicalization
        (operators.textstats.normalized — same expression the dedup
        fingerprints and txt_normalize use)."""
        from redmap_spark.operators.textstats import normalized

        return Pipeline(self.df.withColumn(text_col, normalized(text_col)))

    def quality_gate(self, text_col: str = "text", **gopher_kwargs) -> "Pipeline":
        """Keep rows passing the Gopher quality rules
        (operators.textstats.gopher_passes) — the rules-based corpus
        gate, as one pushable column predicate."""
        from redmap_spark.operators.textstats import gopher_passes

        return Pipeline(self.df.filter(gopher_passes(text_col, **gopher_kwargs)))

    def blocklist(
        self,
        terms: Iterable[str],
        text_col: str = "text",
        max_hit_ratio: float = 0.05,
    ) -> "Pipeline":
        """Drop rows where deny-listed terms exceed ``max_hit_ratio``
        of the tokens (the policy/boilerplate/license gate every
        corpus pipeline runs — the same decision txt_blocklist
        reports, including its NULL-text convention: no text, no
        hits, row kept). Pure column predicate over one scan: zero
        shuffle, zero Python, and Catalyst may push it into the
        reader stage."""
        from redmap_spark.operators.textstats import blocklist_hit_ratio

        ratio = blocklist_hit_ratio(text_col, list(terms))
        return Pipeline(
            self.df.filter(~(ratio > max_hit_ratio) | ratio.isNull())
        )

    def readability_gate(
        self, min_flesch: float = 0.0, text_col: str = "text"
    ) -> "Pipeline":
        """Keep rows at or above a Flesch reading-ease floor
        (operators.textstats.flesch_score — the same heuristic
        txt_readability reports) — the curriculum/legibility gate.
        One pushable column predicate: zero shuffle, zero Python."""
        from redmap_spark.operators.textstats import flesch_score

        return Pipeline(self.df.filter(flesch_score(text_col) >= min_flesch))

    def compress_gate(
        self, min_ratio: float = 0.35, text_col: str = "text"
    ) -> "Pipeline":
        """Drop rows whose zlib compression ratio falls below
        ``min_ratio`` (repetitive boilerplate compresses far below
        natural text — the txt_compress_ratio signal as a filter).
        zlib has no JVM builtin, so this is an Arrow-batched
        mapInPandas predicate: schema-preserving, executor-side, no
        shuffle; empty text counts as ratio 1.0 (kept)."""
        schema = self.df.schema
        ratio_floor = float(min_ratio)

        def gate(batches):
            import zlib

            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                raw = pdf[text_col].str.encode("utf-8")
                keep = raw.map(
                    lambda b: (len(zlib.compress(b, 6)) / len(b))
                    >= ratio_floor
                    if len(b)
                    else True
                )
                yield pdf[keep]

        return Pipeline(self.df.mapInPandas(gate, schema=schema))

    def chunk(
        self,
        chunk_tokens: int = 50,
        stride: int = 40,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "Pipeline":
        """Split documents into fixed-size overlapping token chunks
        (operators.textstats.chunk_documents): 1->N expansion at scan
        parallelism, no shuffle, no Python."""
        from redmap_spark.operators.textstats import chunk_documents

        return Pipeline(
            chunk_documents(
                self.df, chunk_tokens=chunk_tokens, stride=stride,
                id_col=id_col, text_col=text_col,
            )
        )

    def pack(self, budget: int = 512) -> "Pipeline":
        """Pack chunks (the output of .chunk() with its default
        doc_id/chunk_idx/chunk_text columns — the fixed contract
        pack_rows joins on) into fixed-token-budget training rows
        (operators.packing: bucketed first-fit, loss-less,
        deterministic under repartitioning)."""
        from redmap_spark.operators.packing import pack_rows, pack_sequences

        packed = pack_sequences(self.df, budget=budget)
        return Pipeline(pack_rows(packed, self.df))

    def chat_format(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        budget: int = 512,
    ) -> "Pipeline":
        """Render each document into the SFT chat template (the
        inventory txt_chat_format rendering: deterministic
        instruction bank keyed by id % 4, <|system|>/<|user|>/
        <|assistant|> wrapping) with whitespace token accounting and
        a truncation flag at ``budget`` — the last corpus-DSL stage
        before examples leave for training. Map-only: pure string
        Columns, zero shuffle, zero Python."""
        from redmap_spark.inventory.text2 import _CHAT_INSTR

        doc_id = F.col(id_col)
        instr = (
            F.when(doc_id % 4 == 0, _CHAT_INSTR[0])
            .when(doc_id % 4 == 1, _CHAT_INSTR[1])
            .when(doc_id % 4 == 2, _CHAT_INSTR[2])
            .otherwise(_CHAT_INSTR[3])
        )
        prompt = F.concat(
            F.lit("<|system|>You are a helpful assistant.<|user|>"),
            instr, F.lit("\n"), F.col(text_col), F.lit("<|assistant|>"),
        )
        out = self.df.withColumn("prompt", prompt).withColumn(
            "prompt_tokens", F.size(F.split(F.col("prompt"), " ")).cast("long")
        ).withColumn(
            "target_tokens", F.size(F.split(F.col(text_col), " ")).cast("long")
        ).withColumn(
            "truncated",
            (F.col("prompt_tokens") + F.col("target_tokens") > budget)
            .cast("int"),
        )
        return Pipeline(out)

    def perplexity_gate(
        self,
        max_ppl: float = 1000.0,
        reference: "Pipeline | DataFrame | None" = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_coverage: float = 0.2,
    ) -> "Pipeline":
        """Drop rows whose interpolated Kneser–Ney bigram perplexity
        under a REFERENCE corpus model exceeds ``max_ppl`` — the
        CCNet-style LM quality filter (Wenzek et al. 2020): docs a
        reference LM finds surprising are boilerplate, garbled, or
        off-domain. ``reference`` defaults to this pipeline's own
        md5-parity half (self-referential filtering); pass a curated
        Pipeline/DataFrame for a real reference corpus. The KN count
        tables (the txt_kn_perplexity model: d=0.75 absolute
        discounting, continuation counts) are grid-sized DataFrames
        broadcast to the scoring join — zero Python, zero
        collect. Rows whose bigram coverage under the reference
        vocab is below ``min_coverage`` are KEPT (the model can't
        judge them; route them to a stricter gate instead of
        silently dropping)."""
        ref_df = self.df if reference is None else (
            reference.df if isinstance(reference, Pipeline) else reference
        )
        if reference is None:
            ref_df = ref_df.filter(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 1) < "8"
            )

        def bigrams(df, keep):
            t = F.split(F.col(text_col), " ")
            return (
                df.select(*keep, t.alias("_t"))
                .filter(F.size("_t") >= 2)
                .select(
                    *keep,
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("_t") - 1),
                            lambda i: F.struct(
                                F.element_at("_t", i).alias("u"),
                                F.element_at("_t", i + 1).alias("w"),
                            ),
                        )
                    ).alias("_p"),
                )
                .select(*keep, "_p.u", "_p.w")
            )

        cb = (
            bigrams(ref_df, [])
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        cu = cb.groupBy("u").agg(
            F.sum("c").cast("bigint").alias("cu"),
            F.count(F.lit(1)).cast("bigint").alias("n1u"),
        )
        cont = cb.groupBy("w").agg(
            F.count(F.lit(1)).cast("bigint").alias("n1w")
        )
        types = cb.agg(F.count(F.lit(1)).cast("bigint").alias("bt"))
        p = (
            F.greatest(
                F.coalesce(F.col("c"), F.lit(0)) - 0.75, F.lit(0.0)
            ) / F.col("cu")
            + F.lit(0.75) * F.col("n1u") / F.col("cu")
            * (F.col("n1w") / F.col("bt").cast("double"))
        )
        scored = (
            bigrams(self.df, [id_col])
            .join(F.broadcast(cu), "u", "left")
            .join(F.broadcast(cont), "w", "left")
            .join(F.broadcast(cb), ["u", "w"], "left")
            .join(F.broadcast(types))
            .select(
                id_col,
                F.when(
                    F.col("cu").isNotNull() & F.col("n1w").isNotNull(),
                    F.round(-F.log(p), 9).cast("decimal(18,9)"),
                ).alias("_nll"),
            )
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("_nb"),
                F.count("_nll").alias("_ns"),
                (F.sum("_nll").cast("double") / F.count("_nll"))
                .alias("_avg_nll"),
            )
        )
        drop = scored.filter(
            (F.col("_ns") >= F.col("_nb") * min_coverage)
            & (F.col("_ns") > 0)
            & (F.exp(F.col("_avg_nll")) > max_ppl)
        ).select(id_col)
        return Pipeline(self.df.join(drop, id_col, "left_anti"))

    def tokenize_bpe(self, text_col: str = "text", id_col: str = "doc_id",
                     num_merges: int = 64, sample_docs: int = 256,
                     merges: list | None = None) -> "Pipeline":
        """Tokenize with a BPE model trained on a bounded
        deterministic sample of THIS pipeline's current rows
        (operators.bpe): merges learn driver-side (constant-size
        collect), application is Arrow-batched mapInPandas with a
        size-capped per-distinct-word memo. The text column passes
        through annotated with word/subword counts and fertility, so
        .chunk()/.pack() can still follow in the chain.

        NOTE: unlike the other transforms this stage is EAGER at
        chain-construction time — training requires one bounded
        sample job plus a driver merge loop. Pass ``merges`` (from a
        prior ``operators.bpe.train_merges``) to reuse a trained
        table and keep construction job-free."""
        from redmap_spark.operators import bpe

        if merges is None:
            merges = bpe.train_merges(
                bpe.sample_texts(self.df, text_col, sample_docs), num_merges
            )
        return Pipeline(bpe.bpe_apply(self.df, merges, id_col, text_col))

    # -- terminal actions ----------------------------------------------

    def collect(self):
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)
