"""N->4N scaling evidence for the round-5d additions: RDFS entailment,
SHACL-lite shape validation, LM perplexity scoring, and the BPE
pair-count/merge-fold round.

Protocol = scripts/scale_r5b_ops.py: deterministic synthetic inputs
staged to parquet once (no external data), each op timed at two
parallelism levels in FRESH JVMs, force() defeats column pruning,
eff = (t_lo / t_hi) / (cores_hi / cores_lo).

    python scripts/scale_r5d_ops.py            # both levels + summary
    python scripts/scale_r5d_ops.py --cores N  # one level, raw JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from scripts._scale_common import force, size_splits, timed  # noqa: E402

TRIPLES_N = 20_000_000   # synthetic A-Box rows through rdfs_entail
DOCS_X = 120             # sf0.1 documents x120 through LM scoring
WORDS_N = 1_500_000      # distinct 32-char words through one BPE round
N_LO, N_HI = 2, 8

ENTITIES = 100_000
ENTITIES_WIDE = 5_000_000  # shapes store: low dup factor -> ~100M-row closure
PREDS = ("scan", "filter", "join", "merge", "agg", "group", "sort")


def stage(path_key: str, name: str, build) -> str:
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), name)
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        build(spark).repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    os.environ[path_key] = staged
    return staged


def _triples(spark, n_entities: int):
    return spark.range(0, TRIPLES_N).select(
        F.concat(F.lit("E"), (F.col("id") % n_entities).cast("string")).alias("subj"),
        F.element_at(
            F.array(*[F.lit(p) for p in PREDS]), (F.col("id") % 7 + 1).cast("int")
        ).alias("pred"),
        F.concat(
            F.lit("E"), ((F.col("id") * 7 + 13) % n_entities).cast("string")
        ).alias("obj"),
    )


def build_triples(spark):
    """Synthetic canonical-KG-shaped A-Box: E_<k> entities, the seven
    ontology predicates, heavy fact duplication (20M rows / ~2.1M
    facts — the raw-extraction shape the prededup exists for)."""
    return _triples(spark, ENTITIES)


def build_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(par)
        .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(DOCS_X))))
        .select(
            (F.col("doc_id") * DOCS_X + F.col("r")).alias("doc_id"),
            "text",
            "source",
        )
    )


def build_words(spark):
    """Distinct synthetic 'words' (md5 hex, 32 chars) with Zipf-ish
    freqs — the BPE dictionary after the corpus collapse."""
    return spark.range(0, WORDS_N).select(
        F.md5(F.col("id").cast("string")).alias("word"),
        (F.col("id") % 997 + 1).alias("freq"),
    )


def run_entail(spark) -> dict:
    from recon_spark.operators.reasoning import rdfs_entail, shape_violations  # noqa: F401

    staged = os.environ["RECON_SCALE_TRIPLES_PARQUET"]
    size_splits(spark, staged)
    abox = spark.read.parquet(staged)
    out: dict = {}
    timed(out, f"entail_scan_only_x{TRIPLES_N}",
          lambda: abox.select(F.length("subj").alias("n"), "pred"),
          "pure-JVM scan+length baseline over the same staged parquet")
    timed(out, f"rdfs_entail_x{TRIPLES_N}",
          lambda: rdfs_entail(spark, abox).select(
              F.length("subj").alias("a"), "pred"),
          f"{TRIPLES_N:,} staged A-Box triples, 25-rule T-Box broadcast, "
          "full rdfs2/3/5/7/9/11 closure + distinct")
    ent_staged = os.environ["RECON_SCALE_ENTAILED_WIDE_PARQUET"]
    size_splits(spark, ent_staged)
    ent = spark.read.parquet(ent_staged)
    timed(out, f"shape_violations_x{TRIPLES_N}",
          lambda: shape_violations(ent).select(
              F.length("focus").alias("a"), "shape"),
          "4-shape single-pass profile validation over the STAGED "
          "~100M-row wide-entity entailed store (the production shape: "
          "validation reads the published table)")
    return out


def run_lm(spark) -> dict:
    from recon_spark.operators.lm import score_perplexity, train_bigram_lm

    staged = os.environ["RECON_SCALE_DOCS_PARQUET"]
    size_splits(spark, staged)
    docs = spark.read.parquet(staged)
    # model artifact is trained once OUTSIDE the timed scoring section
    # (the CCNet shape: training is rare, scoring is the per-crawl op);
    # collect to literal frames so the timed plan holds no training scan
    model = train_bigram_lm(docs.where(F.col("source").rlike("^src[0-9]$")))
    uni = spark.createDataFrame(model["uni"].collect(), "w string, c1 long")
    bi = spark.createDataFrame(
        model["bi"].collect(), "w1 string, w2 string, c12 long"
    )
    totals = spark.createDataFrame(
        model["totals"].collect(), "n_tokens long, vocab long"
    )
    frozen = {"uni": uni, "bi": bi, "totals": totals}
    out: dict = {}
    timed(out, f"lm_scan_only_x{DOCS_X}",
          lambda: docs.select("doc_id", F.length("text").alias("n")),
          "pure-JVM scan+length baseline over the same staged parquet")
    timed(out, f"lm_score_x{DOCS_X}",
          lambda: score_perplexity(docs, frozen).select(
              "doc_id", "n_bigrams",
              F.coalesce("ppl", F.lit(0.0)).cast("long").alias("p")),
          f"sf0.1 docs x{DOCS_X} (~600k docs / ~36M bigrams) scored "
          "against the broadcast stupid-backoff model")
    return out


def run_bpe(spark) -> dict:
    from recon_spark.operators.bpe import merge_fold, pair_counts

    staged = os.environ["RECON_SCALE_WORDS_PARQUET"]
    size_splits(spark, staged)
    words = spark.read.parquet(staged).withColumn(
        "toks", F.concat(F.split("word", "(?!^)(?!$)"), F.array(F.lit("</w>")))
    )
    out: dict = {}
    timed(out, f"bpe_scan_only_x{WORDS_N}",
          lambda: spark.read.parquet(staged).select(
              F.length("word").alias("n"), "freq"),
          "pure-JVM scan+length baseline over the same staged parquet")
    timed(out, f"bpe_pair_count_x{WORDS_N}",
          lambda: pair_counts(words),
          f"{WORDS_N:,} distinct 33-symbol words -> ~48M weighted pairs, "
          "combinable agg (one training round's count step)")
    timed(out, f"bpe_merge_fold_x{WORDS_N}",
          lambda: words.select(
              F.size(merge_fold("toks", "a", "b")).alias("n"), "freq"),
          "greedy JVM fold applying one merge across the dictionary "
          "(one training round's apply step)")
    return out


def run_level(cores: int) -> dict:
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()  # codegen warmup
    out: dict = {"cores": cores}
    out.update(run_entail(spark))
    out.update(run_lm(spark))
    out.update(run_bpe(spark))
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    stage("RECON_SCALE_TRIPLES_PARQUET", f"triples_scale_{TRIPLES_N}",
          build_triples)

    def build_entailed_wide(spark):
        from recon_spark.operators.reasoning import rdfs_entail

        return rdfs_entail(spark, _triples(spark, ENTITIES_WIDE))

    stage("RECON_SCALE_ENTAILED_WIDE_PARQUET",
          f"entailed_wide_{TRIPLES_N}", build_entailed_wide)
    stage("RECON_SCALE_DOCS_PARQUET", f"lmdocs_scale_x{DOCS_X}", build_docs)
    stage("RECON_SCALE_WORDS_PARQUET", f"bpewords_scale_{WORDS_N}", build_words)
    print(f"loadavg_start: {os.getloadavg()[0]:.2f}")
    levels = {}
    for cores in (N_LO, N_HI):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, env=os.environ, check=True,
        )
        levels[cores] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(levels[cores]))
    lo, hi = levels[N_LO], levels[N_HI]
    ratio = N_HI / N_LO
    print(f"\n== N->4N summary ({N_LO} -> {N_HI} cores) ==")
    for k in lo:
        if k == "cores" or not isinstance(lo[k], dict):
            continue
        a, b = lo[k].get("sec"), hi.get(k, {}).get("sec")
        if a and b:
            print(f"{k}: t{N_LO}={a}s t{N_HI}={b}s eff={(a / b) / ratio:.3f}")
    print(f"loadavg_end: {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
