"""CLI entry points mirroring the reference's operational surface
(SURVEY.md §2.10/§3.3): the four pipeline stages plus every maintenance
script, each as a subcommand over a lake root.

Reference scripts: import_existing_replays.py, fix_compacted_status.py
(dry-run default, --execute gate kept), cleanup_db.py (analyze/
deduplicate), init_db.py (init + migrations), reset_format_state.py
(vacuum -> optimize).

Usage:
    python -m pokemon_showdown_airflow_etl_spark.cli <cmd> --lake DIR [opts]
"""

from __future__ import annotations

import argparse
import json
import sys


# Subcommands that operate on the analytics catalog, not a lake.
CATALOG_CMDS = ("queries", "query", "explain")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pokemon-showdown-etl-spark")
    p.add_argument("--lake", default=None, help="lake root directory (pipeline/maintenance cmds)")
    p.add_argument("--master", default=None, help="spark master (default: local[*])")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="full daily pipeline (O1 DAG topology)")
    run.add_argument("--format", dest="format_id", required=True)
    run.add_argument("--max-pages", type=int, default=5)

    for name in ("discover", "download", "retry", "compact"):
        s = sub.add_parser(name, help=f"{name} stage only")
        s.add_argument("--format", dest="format_id", required=True)
        if name == "discover":
            s.add_argument("--max-pages", type=int, default=5)
            s.add_argument("--backfill", action="store_true")
            s.add_argument(
                "--parallel-ranges",
                type=int,
                default=0,
                help="backfill with N concurrent cursor ranges (0 = sequential)",
            )
            s.add_argument("--ignore-history", action="store_true")

    sub.add_parser("init", help="initialize metadata table + version table (O13)")

    imp = sub.add_parser("import-existing", help="register lake files missing from metadata (O10)")

    fix = sub.add_parser("fix-compacted-status", help="reconcile compacted flags (O11)")
    fix.add_argument("--format", dest="format_id", required=True)
    fix.add_argument("--execute", action="store_true", help="apply (default: dry run)")

    sub.add_parser("analyze", help="lifecycle stats per format (cleanup_db.py analyze)")
    sub.add_parser(
        "refresh-analysis",
        help="incrementally parse new/changed compacted days into the "
        "battle-log analysis tables",
    )
    cur = sub.add_parser(
        "curate",
        help="curate a document corpus for training: exact + near dedup, "
        "quality floor, deterministic split, partitioned write",
    )
    cur.add_argument("--input", required=True, help="documents parquet path")
    cur.add_argument("--output", required=True, help="curated corpus output dir")
    cur.add_argument("--min-quality", type=float, default=0.5)
    cur.add_argument("--near-dup-threshold", type=float, default=0.8)
    cur.add_argument("--pack-budget", type=int, default=512)
    cur.add_argument(
        "--decontaminate-against",
        default=None,
        help="held-out eval corpus parquet; drop docs sharing any 4-gram",
    )
    cur.add_argument(
        "--no-scrub",
        action="store_true",
        help="skip the PII-redaction / URL-canonicalization scrub stage",
    )
    cur.add_argument(
        "--dedup-against-corpus",
        default=None,
        metavar="SIG_ROOT",
        help="drop docs that are near-dups of an existing signature "
        "corpus's registered survivors (read-only d9 decision; do not "
        "run concurrently with compact-signatures)",
    )
    cur.add_argument(
        "--embed-admit-root",
        default=None,
        metavar="INDEX_ROOT",
        help="drop docs whose embeddings are semantic duplicates of an "
        "existing embedding index's registered members (read-only s11 "
        "decision; requires --embeddings; do not run concurrently with "
        "compact-embeddings)",
    )
    cur.add_argument(
        "--embeddings",
        default=None,
        metavar="PARQUET",
        help="precomputed (doc_id, embedding) parquet covering the "
        "input docs (vec_id accepted as the id column name)",
    )
    cur.add_argument(
        "--embed-admit-threshold",
        type=float,
        default=0.9,
        help="cosine threshold for the semantic-admission leg",
    )
    cur.add_argument(
        "--semantic-prune",
        type=float,
        default=None,
        metavar="THRESH",
        help="WITHIN-corpus semantic pruning (s23 SemDeDup): keep one "
        "representative per same-cell cosine>=THRESH neighborhood "
        "among the survivors themselves (requires --embeddings; off "
        "when omitted)",
    )
    cur.add_argument(
        "--span-dedup-tokens",
        type=int,
        default=None,
        metavar="W",
        help="drop repeated W-token spans across the corpus (t20 "
        "C4-style boilerplate removal; off when omitted)",
    )
    cur.add_argument(
        "--perplexity-band",
        type=float,
        nargs=2,
        default=None,
        metavar=("LOW_Q", "HIGH_Q"),
        help="cut BOTH bigram-NLL tails (t25 CCNet-style): keep docs "
        "whose per-token NLL sits inside the (LOW_Q, HIGH_Q) corpus-"
        "quantile band, e.g. 0.05 0.95 (off when omitted; docs too "
        "short to judge pass through)",
    )
    cur.add_argument(
        "--lm-root",
        default=None,
        metavar="DIR",
        help="score --perplexity-band AND --ml-in-domain's contrast "
        "model under the STORED bigram LM of this signature corpus "
        "root's lm/ facet instead of retraining (falls back to "
        "self-training when the committed batches predate the facet)",
    )
    cur.add_argument(
        "--ml-in-domain",
        default=None,
        metavar="EXPR",
        help="Moore-Lewis contrastive selection (t28): SQL boolean "
        "expression naming the in-domain seed rows (e.g. \"lang = "
        "'en'\"); docs whose in-vs-out cross-entropy difference "
        "exceeds the --ml-keep-quantile corpus quantile are dropped "
        "(off when omitted)",
    )
    cur.add_argument(
        "--ml-keep-quantile",
        type=float,
        default=0.5,
        metavar="Q",
        help="fraction of judged docs kept by --ml-in-domain (KMV-"
        "sampled quantile threshold on the contrastive score; "
        "default: 0.5)",
    )
    cur.add_argument(
        "--dsir-target",
        default=None,
        metavar="PATH",
        help="DSIR importance resampling (t31, Xie et al. 2023): "
        "parquet whose text column defines the TARGET distribution; "
        "survivors score log p_target - log p_raw over hashed bigram "
        "features and --dsir-k docs are kept by the Gumbel-top-k race "
        "(sampling proportional to the importance weight; "
        "deterministic; off when omitted)",
    )
    cur.add_argument(
        "--dsir-k",
        type=int,
        default=None,
        metavar="N",
        help="how many docs survive --dsir-target's resample "
        "(required with it)",
    )
    cur.add_argument(
        "--mixture-alpha",
        type=float,
        default=None,
        metavar="ALPHA",
        help="rebalance the TRAIN split by temperature-weighted domain "
        "sampling (t21/t22: keep proportional to count^ALPHA per "
        "domain, exact largest-remainder budget; off when omitted)",
    )
    cur.add_argument(
        "--mixture-domain-col",
        default="source",
        metavar="COL",
        help="domain label column for --mixture-alpha (default: source)",
    )
    cur.add_argument(
        "--mixture-budget",
        type=int,
        nargs=2,
        default=(3, 5),
        metavar=("NUM", "DEN"),
        help="train-split document budget for --mixture-alpha as an "
        "integer corpus fraction NUM/DEN (default: 3 5 = 60%%)",
    )
    cur.add_argument(
        "--mixture-budget-tokens",
        type=int,
        default=None,
        metavar="T",
        help="switch --mixture-alpha's budget unit to an absolute "
        "TOKEN count: per-domain targets split T largest-remainder "
        "and each domain keeps the maximal hash-ordered doc prefix "
        "fitting its target (overrides --mixture-budget)",
    )
    cur.add_argument(
        "--sample-k",
        type=int,
        default=None,
        metavar="N",
        help="cap the corpus BEFORE the split by quality-weighted "
        "sampling without replacement (t30 Efraimidis-Spirakis race, "
        "weight = the t7 quality score; deterministic; off when "
        "omitted)",
    )
    cur.add_argument(
        "--nb-seed",
        default=None,
        metavar="PATH",
        help="labeled seed parquet (text + label column) for the t29 "
        "NB domain classifier: when the corpus has no domain column, "
        "the TRAIN split is classified under the seed-trained model "
        "and --mixture-alpha groups by the PREDICTED label",
    )
    cur.add_argument(
        "--nb-label-col",
        default="label",
        metavar="COL",
        help="label column name in --nb-seed (default: label)",
    )

    tok = sub.add_parser(
        "tokenize-docs",
        help="build a vocabulary over a (curated) corpus and encode "
        "every document to ids: whole-token dictionary (t23) or "
        "bounded deterministic BPE subwords (t24); writes vocab.json "
        "+ encoded/ parquet",
    )
    tok.add_argument("--input", required=True, help="documents parquet path")
    tok.add_argument("--output", required=True, help="tokenizer output dir")
    tok.add_argument("--mode", choices=("word", "bpe"), default="word")
    tok.add_argument("--vocab-size", type=int, default=256, help="word mode: top-V")
    tok.add_argument("--bpe-merges", type=int, default=8)
    tok.add_argument(
        "--bpe-word-types",
        type=int,
        default=256,
        help="bound on the word-type table BPE trains on (first K by "
        "count desc, word asc — only this reaches the driver)",
    )

    ing = sub.add_parser(
        "ingest-docs",
        help="admit a new document batch against the growing signature "
        "corpus (near-dup dedup vs registered survivors) and register "
        "the accepted docs' signatures",
    )
    ing.add_argument("--input", required=True, help="batch documents parquet path")
    ing.add_argument("--sig-root", required=True, help="signature corpus root dir")
    ing.add_argument("--batch-id", required=True, help="idempotency key for this drop")
    ing.add_argument("--threshold", type=float, default=0.8)
    ing.add_argument(
        "--hllg-group-col",
        default="lang",
        metavar="COL",
        help="segment column for the grouped-HLL facet (hllg/; a batch "
        "without the column writes no partition) — use ONE column per "
        "lake across batches",
    )

    csig = sub.add_parser(
        "compact-signatures",
        help="consolidate per-batch signature partitions (O12 small-file "
        "maintenance for the ingest layout; crash-safe, resumes removals)",
    )
    csig.add_argument("--sig-root", required=True, help="signature corpus root dir")
    csig.add_argument("--min-batches", type=int, default=8)

    skst = sub.add_parser(
        "sketch-stats",
        help="corpus-wide stats from the signature lake's STORED sketch "
        "facet (HLL distinct-content estimate + doc-length quantiles) — "
        "served from a few hundred persisted rows, no corpus scan",
    )
    skst.add_argument("--sig-root", required=True, help="signature corpus root dir")
    skst.add_argument(
        "--gram",
        action="append",
        default=None,
        metavar="'w1 w2'",
        help="also report the STORED count-min estimate for this token "
        "bigram (repeatable) — corpus-wide heavy-hitter point lookups "
        "from <= 1024 persisted cells, no corpus scan",
    )
    skst.add_argument(
        "--segment-overlap",
        action="store_true",
        help="also serve every pairwise segment-overlap estimate from "
        "the STORED grouped-HLL facet (hllg/): per-segment distinct-"
        "content estimates, union by register max, intersection by "
        "inclusion-exclusion — no corpus scan",
    )
    skst.add_argument(
        "--top-grams",
        type=int,
        default=None,
        metavar="K",
        help="also serve the corpus-wide top-K heavy-hitter bigrams "
        "ENTIRELY from the stored hh/ + cms/ facets (stored candidates "
        "ranked by stored-cell estimates; no corpus scan)",
    )
    skst.add_argument(
        "--token-quantiles",
        action="store_true",
        help="also serve corpus token-length quantiles from the STORED "
        "histogram facet (hist/): [q_ppm, est_lo, est_hi, n_le, "
        "n_total] rows off the few-thousand-row bucket table — no "
        "corpus scan",
    )

    iimg = sub.add_parser(
        "ingest-images",
        help="admit an image drop (asset_id + binary payload parquet) "
        "against the incremental aHash registry — banded-Hamming dedup "
        "vs stored hash rows, commit-marker protocol (m8's production "
        "path)",
    )
    iimg.add_argument("--input", required=True, help="assets parquet")
    iimg.add_argument("--root", required=True, help="image registry root dir")
    iimg.add_argument("--batch-id", required=True)
    iimg.add_argument("--max-hamming", type=int, default=3)

    cimg = sub.add_parser(
        "compact-images",
        help="consolidate per-batch image-hash partitions (O12 "
        "maintenance; the signature lake's table-agnostic compaction)",
    )
    cimg.add_argument("--root", required=True, help="image registry root dir")
    cimg.add_argument("--min-batches", type=int, default=8)

    dchk = sub.add_parser(
        "decon-check",
        help="contamination check of an eval benchmark against the "
        "signature corpus's STORED Bloom facet: per-doc word-4-gram "
        "membership verdicts served from <= 32768 persisted rows — the "
        "training corpus is never scanned",
    )
    dchk.add_argument("--input", required=True, help="eval docs parquet")
    dchk.add_argument("--sig-root", required=True, help="signature corpus root dir")
    dchk.add_argument("--id-col", default="doc_id")
    dchk.add_argument("--text-col", default="text")
    dchk.add_argument(
        "--output",
        default=None,
        help="optionally write the per-doc verdict table here (parquet); "
        "stdout carries counts only either way",
    )

    iei = sub.add_parser(
        "init-embedding-index",
        help="train the IVF quantizer on a seed corpus and commit it as "
        "the embedding index's immutable centroids",
    )
    iei.add_argument("--input", required=True, help="seed embeddings parquet path")
    iei.add_argument("--index-root", required=True, help="embedding index root dir")
    iei.add_argument("--n-cells", type=int, default=8)
    iei.add_argument("--max-iter", type=int, default=10)
    iei.add_argument(
        "--no-train",
        action="store_true",
        help="keep deterministic first-N-by-id seed centroids instead of "
        "running the Lloyd trainer",
    )

    ivec = sub.add_parser(
        "ingest-vectors",
        help="admit a new embedding batch against the persisted index "
        "(semantic near-dup dedup vs registered survivors, s11) and "
        "register the accepted vectors' cell assignments",
    )
    ivec.add_argument("--input", required=True, help="batch embeddings parquet path")
    ivec.add_argument("--index-root", required=True, help="embedding index root dir")
    ivec.add_argument("--batch-id", required=True, help="idempotency key for this drop")
    ivec.add_argument("--threshold", type=float, required=True)
    ivec.add_argument("--n-probe", type=int, default=2)

    cemb = sub.add_parser(
        "compact-embeddings",
        help="consolidate per-batch assignment partitions of the "
        "embedding index (same crash-safe protocol as "
        "compact-signatures)",
    )
    cemb.add_argument("--index-root", required=True, help="embedding index root dir")
    cemb.add_argument("--min-batches", type=int, default=8)

    ist = sub.add_parser(
        "index-stats",
        help="per-dimension embedding-drift summary from the index's "
        "STORED estats facet (mean/variance per dim, top-variance "
        "dims) — the stale-quantizer signal, no vector scan",
    )
    ist.add_argument("--index-root", required=True, help="embedding index root dir")
    ist.add_argument(
        "--top",
        type=int,
        default=8,
        help="how many highest-variance dimensions to list (default 8)",
    )
    ist.add_argument(
        "--drift",
        action="store_true",
        help="also report per-dimension drift vs the quantizer's "
        "training baseline (train_stats/): mean shift in training "
        "standard deviations (z_milli) — the number that decides when "
        "a reindex is due; served from stored rows only",
    )

    irf = sub.add_parser(
        "index-refresh",
        help="drift-driven quantizer refresh: read the STORED drift "
        "gauge (train_stats/ baseline vs estats/ facet, no vector "
        "scan) and run the s12 reindex into --new-root only when any "
        "dimension's mean shifted past --z-threshold-milli "
        "thousandths of a training standard deviation; below it, a "
        "cheap no-op that reports the gauge",
    )
    irf.add_argument("--old-root", required=True, help="current index root")
    irf.add_argument("--new-root", required=True, help="target root on refresh")
    irf.add_argument(
        "--z-threshold-milli",
        type=int,
        default=500,
        help="refresh when max per-dim z >= this (default 500 = half a "
        "training standard deviation)",
    )
    irf.add_argument("--n-cells", type=int, default=8)
    irf.add_argument(
        "--no-train",
        action="store_true",
        help="deterministic first-n-by-id centroids instead of the "
        "Lloyd trainer",
    )

    rei = sub.add_parser(
        "reindex-embeddings",
        help="quantizer migration: rebuild the embedding index under new "
        "centroids into a NEW root (re-assigns committed survivors, "
        "carries the audit + retired ledger; old root untouched until "
        "cutover; resumable after a crash)",
    )
    rei.add_argument("--old-root", required=True, help="current index root")
    rei.add_argument("--new-root", required=True, help="target index root")
    rei.add_argument(
        "--centroids",
        help="optional parquet with the new (cell_id, centroid) quantizer; "
        "omitted = train on the old root's committed corpus",
    )
    rei.add_argument("--n-cells", type=int, default=8)
    rei.add_argument("--max-iter", type=int, default=10)
    rei.add_argument(
        "--no-train",
        action="store_true",
        help="deterministic first-N-by-id corpus centroids instead of the "
        "Lloyd trainer (ignored when --centroids is given)",
    )

    bpq = sub.add_parser(
        "build-pq",
        help="materialize the embedding index's PQ compression layer "
        "(codebook + 8-byte codes for every registered vector; a "
        "snapshot — re-run with --refresh after ingest/compaction)",
    )
    bpq.add_argument("--index-root", required=True, help="embedding index root dir")
    bpq.add_argument("--n-sub", type=int, default=8)
    bpq.add_argument("--n-codes", type=int, default=16)
    bpq.add_argument("--refresh", action="store_true")
    bpq.add_argument(
        "--train",
        action="store_true",
        help="per-subspace Lloyd-trained codebooks (8-16%% lower "
        "reconstruction error measured) instead of the deterministic "
        "first-N rule",
    )
    bpq.add_argument(
        "--residual",
        action="store_true",
        help="store RESIDUAL codes (s24/s25): every member encoded as "
        "v - centroid(its stored cell); pq-search then requires "
        "--n-probe and builds per-(query, cell) tables from the "
        "query's own residual; composes with --opq (s26: the "
        "permutation trains on the residual sample)",
    )
    bpq.add_argument(
        "--opq",
        action="store_true",
        help="train + store the OPQ-lite variance-balancing coordinate "
        "permutation (s21) with the layer; codes encode the permuted "
        "vectors and pq-search permutes queries automatically",
    )
    bpq.add_argument(
        "--train-max-rows",
        type=int,
        default=None,
        help="bound on the Lloyd training sample (first N committed "
        "vectors by id; default 4096 — FAISS practice, never the "
        "whole corpus)",
    )

    pqs = sub.add_parser(
        "pq-search",
        help="ANN over the index's materialized PQ codes: ADC shortlist "
        "+ exact cosine rescore (read-only)",
    )
    pqs.add_argument("--index-root", required=True, help="embedding index root dir")
    pqs.add_argument("--queries", required=True, help="query embeddings parquet path")
    pqs.add_argument("--k", type=int, default=3)
    pqs.add_argument("--shortlist", type=int, default=10)
    pqs.add_argument(
        "--n-probe",
        type=int,
        default=None,
        help="IVF-PQ mode: score only the query's N nearest cells' "
        "stored members instead of the whole code table",
    )

    sub.add_parser("deduplicate", help="remove duplicate metadata rows (O12)")
    opt = sub.add_parser("optimize", help="small-file compaction rewrite (O12 vacuum)")
    opt.add_argument("--files-per-partition", type=int, default=1)

    exp = sub.add_parser(
        "export-json", help="export the compacted lake as reference-format JSON day files"
    )
    exp.add_argument("--out", required=True)
    exp.add_argument(
        "--layout",
        choices=("lines", "reference"),
        default="lines",
        help="'lines': partitioned line-delimited JSON; 'reference': the "
        "reference's exact {format}/{YYYY-MM-DD}.json array day files",
    )

    rst = sub.add_parser("reset-state", help="clear a format's cursor checkpoint (O12)")
    rst.add_argument("--format", dest="format_id", required=True)

    sub.add_parser("audit", help="lake integrity check (invariant violation counts)")

    cln = sub.add_parser(
        "cleanup", help="remove write litter (_temporary, __staging, .swap-*) (O12)"
    )
    cln.add_argument("--max-age-s", type=float, default=0.0)

    sub.add_parser("queries", help="list the analytics query catalog")

    qry = sub.add_parser("query", help="run a cataloged query against a testdata sf dir")
    qry.add_argument("name", help="catalog query name (see `queries`)")
    qry.add_argument("--sf-dir", required=True, help="directory of *.parquet tables")
    qry.add_argument("--limit", type=int, default=20, help="max rows to print (0 = all)")

    ex = sub.add_parser("explain", help="print a cataloged query's physical plan")
    ex.add_argument("name", help="catalog query name (see `queries`)")
    ex.add_argument("--sf-dir", required=True, help="directory of *.parquet tables")
    ex.add_argument(
        "--mode",
        default="formatted",
        choices=("simple", "extended", "codegen", "cost", "formatted"),
    )
    return p


def _catalog_query(name: str):
    from .plans import ALL_QUERIES

    q = ALL_QUERIES.get(name)
    if q is None:
        raise SystemExit(f"unknown query {name!r}; run the `queries` subcommand for the catalog")
    return q


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "queries":  # no Spark session needed
        from .plans import ALL_QUERIES

        for name, q in ALL_QUERIES.items():
            kind = "sql-checked" if q.oracle else "rows-only"
            print(json.dumps({"name": name, "check": kind, "doc": q.doc}))
        return 0

    if args.cmd in CATALOG_CMDS:
        from .session import get_spark

        spark = get_spark(app_name=f"etl-{args.cmd}", master=args.master)
        df = _catalog_query(args.name).spark(spark, args.sf_dir)
        if args.cmd == "explain":
            print(df._sc._jvm.PythonSQLUtils.explainString(  # same string .explain prints
                df._jdf.queryExecution(), args.mode))
        else:
            rows = df.limit(args.limit).collect() if args.limit else df.collect()
            for r in rows:
                print(json.dumps(r.asDict(recursive=True), default=str))
        return 0

    if args.cmd == "curate":  # corpus job — no lake involved
        from .jobs.curate import curate_corpus
        from .session import get_spark

        spark = get_spark(app_name="etl-curate", master=args.master)
        result = curate_corpus(
            spark,
            args.input,
            args.output,
            min_quality=args.min_quality,
            near_dup_threshold=args.near_dup_threshold,
            pack_budget=args.pack_budget,
            eval_path=args.decontaminate_against,
            scrub=not args.no_scrub,
            corpus_sig_root=args.dedup_against_corpus,
            embed_admit_root=args.embed_admit_root,
            embeddings_path=args.embeddings,
            embed_admit_threshold=args.embed_admit_threshold,
            semantic_prune_threshold=args.semantic_prune,
            span_dedup_tokens=args.span_dedup_tokens,
            perplexity_band=(
                tuple(args.perplexity_band)
                if args.perplexity_band is not None
                else None
            ),
            lm_root=args.lm_root,
            ml_in_domain=args.ml_in_domain,
            ml_keep_quantile=args.ml_keep_quantile,
            dsir_target_path=args.dsir_target,
            dsir_k=args.dsir_k,
            mixture_alpha=args.mixture_alpha,
            mixture_domain_col=args.mixture_domain_col,
            mixture_budget=tuple(args.mixture_budget),
            mixture_budget_tokens=args.mixture_budget_tokens,
            nb_seed_path=args.nb_seed,
            nb_label_col=args.nb_label_col,
            sample_k=args.sample_k,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "tokenize-docs":  # corpus job — no lake involved
        from .jobs.tokenize import tokenize_corpus
        from .session import get_spark

        spark = get_spark(app_name="etl-tokenize", master=args.master)
        result = tokenize_corpus(
            spark,
            args.input,
            args.output,
            mode=args.mode,
            vocab_size=args.vocab_size,
            n_merges=args.bpe_merges,
            max_word_types=args.bpe_word_types,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "ingest-docs":  # signature-corpus job — no lake involved
        from .jobs.doc_signature_lake import ingest_signature_batch
        from .session import get_spark

        spark = get_spark(app_name="etl-ingest-docs", master=args.master)
        result = ingest_signature_batch(
            spark,
            spark.read.parquet(args.input),
            args.sig_root,
            args.batch_id,
            threshold=args.threshold,
            hllg_group_col=args.hllg_group_col,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "compact-signatures":
        from .jobs.doc_signature_lake import compact_signature_corpus
        from .session import get_spark

        spark = get_spark(app_name="etl-compact-signatures", master=args.master)
        print(
            json.dumps(
                compact_signature_corpus(
                    spark, args.sig_root, min_batches=args.min_batches
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "sketch-stats":
        from .jobs.doc_signature_lake import corpus_sketch_stats
        from .session import get_spark

        spark = get_spark(app_name="etl-sketch-stats", master=args.master)
        print(
            json.dumps(
                corpus_sketch_stats(
                    spark,
                    args.sig_root,
                    grams=args.gram,
                    top_grams=args.top_grams,
                    segment_overlap=args.segment_overlap,
                    token_quantiles=args.token_quantiles,
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "ingest-images":
        from .jobs.image_hash_lake import ingest_image_batch
        from .session import get_spark

        spark = get_spark(app_name="etl-ingest-images", master=args.master)
        print(
            json.dumps(
                ingest_image_batch(
                    spark,
                    spark.read.parquet(args.input),
                    args.root,
                    args.batch_id,
                    max_hamming=args.max_hamming,
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "compact-images":
        from .jobs.image_hash_lake import compact_image_corpus
        from .session import get_spark

        spark = get_spark(app_name="etl-compact-images", master=args.master)
        print(
            json.dumps(
                compact_image_corpus(
                    spark, args.root, min_batches=args.min_batches
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "decon-check":
        from pyspark.sql import functions as F

        from .jobs.doc_signature_lake import eval_contamination
        from .session import get_spark

        spark = get_spark(app_name="etl-decon-check", master=args.master)
        verdicts = eval_contamination(
            spark,
            args.sig_root,
            spark.read.parquet(args.input),
            id_col=args.id_col,
            text_col=args.text_col,
        )
        if verdicts is None:
            print(json.dumps({"has_bloom": False}))
            return 0
        from .pinning import pin

        verdicts = pin(verdicts)  # counts + optional write share one pass
        if args.output:
            verdicts.write.mode("overwrite").parquet(args.output)
        row = verdicts.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_docs_flagged"),
            F.sum("n_grams").alias("n_grams"),
            F.sum("n_maybe_contaminated").alias("n_grams_flagged"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "has_bloom": True,
                    "n_docs": int(row["n_docs"]),
                    "n_docs_flagged": int(row["n_docs_flagged"] or 0),
                    "n_grams": int(row["n_grams"] or 0),
                    "n_grams_flagged": int(row["n_grams_flagged"] or 0),
                },
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "init-embedding-index":
        from .jobs.embedding_index_lake import init_embedding_index
        from .session import get_spark

        spark = get_spark(app_name="etl-init-embedding-index", master=args.master)
        result = init_embedding_index(
            spark,
            spark.read.parquet(args.input),
            args.index_root,
            n_cells=args.n_cells,
            max_iter=args.max_iter,
            train=not args.no_train,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "ingest-vectors":
        from .jobs.embedding_index_lake import ingest_embedding_batch
        from .session import get_spark

        spark = get_spark(app_name="etl-ingest-vectors", master=args.master)
        result = ingest_embedding_batch(
            spark,
            spark.read.parquet(args.input),
            args.index_root,
            args.batch_id,
            threshold=args.threshold,
            n_probe=args.n_probe,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "build-pq":
        from .jobs.embedding_index_lake import build_pq_layer
        from .session import get_spark

        spark = get_spark(app_name="etl-build-pq", master=args.master)
        kw = {}
        if args.train_max_rows is not None:
            kw["train_max_rows"] = args.train_max_rows
        result = build_pq_layer(
            spark, args.index_root, n_sub=args.n_sub, n_codes=args.n_codes,
            refresh=args.refresh, train=args.train, opq=args.opq,
            residual=args.residual, **kw,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "pq-search":
        from .jobs.embedding_index_lake import pq_layer_search
        from .session import get_spark

        spark = get_spark(app_name="etl-pq-search", master=args.master)
        out = pq_layer_search(
            spark,
            args.index_root,
            spark.read.parquet(args.queries),
            k=args.k,
            shortlist=args.shortlist,
            n_probe=args.n_probe,
        )
        for r in out.orderBy("query_id", "rank").collect():
            print(json.dumps(r.asDict(), sort_keys=True))
        return 0

    if args.cmd == "reindex-embeddings":
        from .jobs.embedding_index_lake import reindex_embedding_index
        from .session import get_spark

        spark = get_spark(app_name="etl-reindex-embeddings", master=args.master)
        result = reindex_embedding_index(
            spark,
            args.old_root,
            args.new_root,
            centroids=(
                spark.read.parquet(args.centroids) if args.centroids else None
            ),
            n_cells=args.n_cells,
            max_iter=args.max_iter,
            train=not args.no_train,
        )
        print(json.dumps(result, sort_keys=True))
        return 0

    if args.cmd == "compact-embeddings":
        from .jobs.embedding_index_lake import compact_embedding_index
        from .session import get_spark

        spark = get_spark(app_name="etl-compact-embeddings", master=args.master)
        print(
            json.dumps(
                compact_embedding_index(
                    spark, args.index_root, min_batches=args.min_batches
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.cmd == "index-stats":
        from .jobs.embedding_index_lake import quantizer_drift, read_index_estats
        from .session import get_spark

        spark = get_spark(app_name="etl-index-stats", master=args.master)
        est = read_index_estats(spark, args.index_root)
        if est is None:
            print(json.dumps({"has_estats": False}, sort_keys=True))
            return 0
        rows = sorted(est.collect(), key=lambda r: r["d"])  # dim rows only
        stats = []
        for r in rows:
            n, s, ss = int(r["n"]), int(r["s_milli"]), int(r["ss_milli"])
            mean = s / n
            var = ss / n - mean * mean
            stats.append((int(r["d"]), round(mean, 3), round(var, 3)))
        top = sorted(stats, key=lambda x: -x[2])[: args.top]
        payload = {
            "has_estats": True,
            "n_vectors": int(rows[0]["n"]) if rows else 0,
            "dim": len(rows),
            "top_variance_dims": [
                {"d": d, "mean_milli": m, "var_milli2": v}
                for d, m, v in top
            ],
        }
        if args.drift:
            dr = quantizer_drift(spark, args.index_root)
            if dr is None:
                payload["has_drift_baseline"] = False
            else:
                drows = dr.collect()  # dim rows only
                payload["has_drift_baseline"] = True
                payload["max_z_milli"] = max(
                    (int(r["z_milli"]) for r in drows), default=0
                )
                payload["top_drift_dims"] = [
                    {
                        "d": int(r["d"]),
                        "z_milli": int(r["z_milli"]),
                        "mean_train_milli": int(r["mean_train_milli"]),
                        "mean_now_milli": int(r["mean_now_milli"]),
                    }
                    for r in sorted(
                        drows, key=lambda r: -int(r["z_milli"])
                    )[: args.top]
                ]
        print(json.dumps(payload, sort_keys=True))
        return 0

    if args.cmd == "index-refresh":
        from .jobs.embedding_index_lake import refresh_if_drifted
        from .session import get_spark

        spark = get_spark(app_name="etl-index-refresh", master=args.master)
        print(
            json.dumps(
                refresh_if_drifted(
                    spark,
                    args.old_root,
                    args.new_root,
                    z_threshold_milli=args.z_threshold_milli,
                    n_cells=args.n_cells,
                    train=not args.no_train,
                ),
                sort_keys=True,
            )
        )
        return 0

    if args.lake is None:
        raise SystemExit("--lake is required for pipeline/maintenance subcommands")
    from .jobs import (
        ReplayLake,
        compact,
        deduplicate_metadata,
        discover,
        discover_backfill,
        download,
        fix_compacted_status,
        import_existing,
        optimize_lake,
        retry_failed,
        run_daily_pipeline,
    )
    from .session import get_spark
    from .sources.api import ReplayApiClient

    spark = get_spark(app_name=f"etl-{args.cmd}", master=args.master)
    lake = ReplayLake(args.lake)

    if args.cmd in ("run", "discover", "download", "retry"):
        client = ReplayApiClient()
    result: object
    if args.cmd == "run":
        result = run_daily_pipeline(spark, lake, client, args.format_id, args.max_pages)
    elif args.cmd == "discover":
        if args.backfill and args.parallel_ranges:
            from .jobs import discover_backfill_parallel

            result = discover_backfill_parallel(
                spark, lake, client, args.format_id, n_ranges=args.parallel_ranges
            )
        elif args.backfill:
            result = discover_backfill(spark, lake, client, args.format_id, args.max_pages)
        else:
            result = discover(
                spark, lake, client, args.format_id, args.max_pages, args.ignore_history
            )
    elif args.cmd == "download":
        result = download(spark, lake, client, args.format_id)
    elif args.cmd == "retry":
        result = retry_failed(spark, lake, client, args.format_id)
    elif args.cmd == "compact":
        result = compact(spark, lake, args.format_id)
    elif args.cmd == "init":
        from .jobs.migrations import init_lake

        result = init_lake(spark, lake)
    elif args.cmd == "import-existing":
        result = import_existing(spark, lake)
    elif args.cmd == "fix-compacted-status":
        result = fix_compacted_status(spark, lake, args.format_id, execute=args.execute)
    elif args.cmd == "analyze":
        from .jobs.lake import MetadataStore
        from .operators.metadata import lifecycle_stats

        rows = lifecycle_stats(MetadataStore(spark, lake.metadata_path).read()).collect()
        result = {r["format_id"]: r.asDict() for r in rows}
    elif args.cmd == "refresh-analysis":
        from .jobs.battlelog_lake import refresh_battlelog_layer

        result = refresh_battlelog_layer(spark, lake)
    elif args.cmd == "deduplicate":
        result = deduplicate_metadata(spark, lake)
    elif args.cmd == "optimize":
        result = optimize_lake(spark, lake, args.files_per_partition)
    elif args.cmd == "export-json":
        from .io import export_compacted_json, export_reference_day_files

        docs = spark.read.parquet(lake.compacted_path)
        if args.layout == "reference":
            export_reference_day_files(docs, args.out)
        else:
            export_compacted_json(docs, args.out)
        result = {"exported": docs.count(), "path": args.out}
    elif args.cmd == "reset-state":
        from .jobs import reset_format_state

        result = reset_format_state(lake, args.format_id)
    elif args.cmd == "audit":
        from .jobs import audit_lake

        result = audit_lake(spark, lake)
    elif args.cmd == "cleanup":
        from .jobs import cleanup_lake

        result = cleanup_lake(lake, max_age_s=args.max_age_s)
    else:  # pragma: no cover
        raise SystemExit(2)

    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
