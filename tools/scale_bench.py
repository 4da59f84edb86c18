"""sf1 scaling smoke (r3 verdict #6): the 2x perf gate at sf0.1 can't
see O(n^2)-in-disguise; one order of magnitude can. This tool

1. materializes a 10x replica of the sf0.1 fact tables (key-offset
   copies so FK structure, dup-group sizes, and join fan-outs scale
   LINEARLY — document text is replica-salted and embeddings replica-
   perturbed so cross-replica rows never collide into quadratic
   dup groups), and
2. times the N most expensive bench queries (per bench_detail.json)
   at sf0.1 AND at the scaled dir, reporting the wall ratio.

Linear-ish scaling evidence = ratio within ~10x (+ fixed overhead).
A query at >> 10x is a super-linear stage hiding under the sf0.1 gate.

The scaled data derives mechanically from the DRIVER-PROVIDED
/root/testdata parquet (no new synthetic distributions) and lives
outside the repo tree (/tmp) — it is a perf instrument, not a
correctness fixture; all correctness runs stay on the driver's data.

Usage: python tools/scale_bench.py [factor] [selector]
  selector: an integer N (top-N most expensive bench queries, default
  10), "min:SECS" (every query whose bench_detail steady-state is
  >= SECS — the r4 verdict's "every query > 2s" widening is min:2),
  or a comma-separated explicit query-name list.
Writes BENCH_sf1.json at the repo root (factor 10); other factors get
BENCH_scale_{f}x.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
DIMS = ("nation", "region")
# fact table -> {key column -> stride-domain table owning that key}
FACT_KEYS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
OWN_KEY = {"customer": "c_custkey", "orders": "o_orderkey",
           "part": "p_partkey", "supplier": "s_suppkey",
           "events": "event_id", "documents": "doc_id",
           "embeddings": "vec_id"}


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    from vega_spark.tables import load_table

    strides: dict[str, int] = {}
    for t, key in OWN_KEY.items():
        strides[t] = (load_table(spark, src_dir, t)
                      .agg(F.max(key)).first()[0] or 0) + 1
    strides["__user"] = (load_table(spark, src_dir, "events")
                         .agg(F.max("user_id")).first()[0] or 0) + 1

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        load_table(spark, src_dir, t).write.mode("overwrite") \
            .parquet(os.path.join(out_dir, t + ".parquet"))
    for t, keymap in FACT_KEYS.items():
        base = load_table(spark, src_dir, t)
        parts = []
        for i in range(factor):
            rep = base
            for col, domain in keymap.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * strides[domain]))
                    .cast(dict(base.dtypes)[col]))
            if t == "documents":
                # replica-salt the text: within-replica (near-)dup
                # structure repeats linearly; cross-replica texts never
                # collide into factor^2-sized dup groups. The salt must
                # BREAK SHINGLES, not just append: an end-of-doc token
                # changes ~2 of S 3-gram shingles, leaving cross-replica
                # Jaccard ~ (S-2)/(S+2) >= 0.9 for any long doc — which
                # made true-dup groups factor^2-sized and the exact
                # recall contracts legitimately quadratic (observed as
                # a 67x wall at 30x in r4). Inserting the replica token
                # every 2 words leaves NO original-only word 3-gram, so
                # cross-replica shingle Jaccard ~ 0: not just below the
                # 0.9 truth threshold but below any LSH band-collision
                # odds (16 bands x J^4), keeping BOTH the true-pair set
                # and the candidate set linear in factor, as intended.
                # Replica 0 gets a "rep0" token too (r4 ADVICE): all
                # replicas then share IDENTICAL internal structure, so
                # per-replica dup-group sizes and Jaccard values match
                # exactly and the linearity ratio is noise-free.
                # Heavy-tailed vocabulary (r6 verdict #4): the base
                # corpus is a 31-word lexicon where EVERY term's df is
                # stopword-class, so at any factor the sparse-cosine
                # df guard prunes the whole vocabulary and the smoke
                # measures the guard path, not the operator (observed:
                # surviving_terms 0/331 at 300x). Real corpora obey
                # Heaps/Zipf — more docs bring more distinct, mostly
                # RARE terms. Append 2 Zipf-sampled tokens per doc,
                # drawn log-uniformly over a 50k lexicon (P(rank<=r)
                # = ln r / ln L  =>  df(r) ~ 1/r, the Zipf pmf):
                # head ranks stay over the df cap (pruned, like real
                # stopwords), mid ranks land in the surviving band
                # and give the postings join its true workload.
                # Instrument safety: ranks are keyed on the doc's
                # ORIGINAL first-10-word prefix, so copy-and-mutate
                # near-dups (and exact dups) draw IDENTICAL tails —
                # their shingle Jaccard is untouched — and replicas
                # stay exactly isomorphic (same prefix => same ranks,
                # only the z{i} replica tag differs), keeping the
                # dedup linearity instruments noise-free; the tag
                # also keeps cross-replica term collisions at zero,
                # so no factor^2 posting buckets exist.
                prefix = F.concat_ws(
                    " ", F.slice(F.split(F.col("text"), " "), 1, 10))
                tail = [
                    F.concat(
                        F.lit(f"z{i}q"),
                        F.floor(F.pow(F.lit(50000.0),
                                      (F.abs(F.hash(prefix, F.lit(m)))
                                       % 1000000)
                                      .cast("double") / 1000000.0))
                        .cast("long").cast("string"))
                    for m in (1, 2)]
                # v4: the salt token VARIES with position —
                # rep{i}w{(j//2)%32} instead of a constant rep{i}.
                # The constant token was ~1/3 of every doc's tokens,
                # so it DOMINATED the simhash weighted bit-majority
                # and collapsed each replica's fingerprint space
                # ~5x (measured: 1,066 distinct fps per 5,000-doc
                # replica vs 4,960 at base) — the smoke then measured
                # giant identical-fp cliques, a corpus artifact no
                # real corpus (or the base corpus) has. 32 rotating
                # salt tokens put each at ~1x content-word weight,
                # restoring base-like fp diversity, while keeping
                # BOTH salt invariants: every token still carries the
                # replica tag (cross-replica shingles stay broken,
                # Jaccard ~ 0) and the rotation is position-
                # deterministic and identical across replicas modulo
                # the tag (within-replica dup structure and replica
                # isomorphism preserved exactly).
                words = F.split(F.col("text"), " ")
                salt = lambda i_: (lambda w, j: F.when(  # noqa: E731
                    j % 2 == 1,
                    F.array(w, F.concat(
                        F.lit(f"rep{i_}w"),
                        ((j - 1) / 2).cast("long") % 32))
                ).otherwise(F.array(w)))
                rep = rep.withColumn(
                    "text", F.concat(
                        F.concat_ws(" ", F.flatten(
                            F.transform(words, salt(i)))),
                        F.lit(" "), tail[0], F.lit(" "), tail[1]))
            if t == "supplier":
                # Regenerate the name from the OFFSET key (r6 verdict
                # #4): cloning names verbatim gave every informative
                # q-gram a df of `factor` x its base value, pushing
                # the whole gram vocabulary over the fuzzy-match cap
                # (bounded-but-EMPTY at 100x/300x — the guard path,
                # not the operator). Rebuilding as Supplier#%09d is
                # NOT enough: a digit-only tail has a ~1000-trigram
                # alphabet, so at 300k rows every digit gram's df is
                # thousands regardless of name distinctness. Instead:
                # a 6-char base36 md5 STEM keyed on key//10 plus the
                # final digit. Grams live in the 36^3 space (avg df
                # ~32 at 300x — under the cap of 50, the operator
                # regime), groups of 10 consecutive keys share the
                # stem and differ in one char (edit distance 1 — the
                # same match structure the base corpus's digit tails
                # give), and stems never repeat across replicas
                # (key//10 is replica-strided), keeping both the
                # candidate and match sets linear in factor.
                stem = F.lower(F.conv(
                    F.substring(F.md5(
                        (F.col("s_suppkey") - F.col("s_suppkey") % 10)
                        .cast("string")), 1, 12), 16, 36))
                rep = rep.withColumn(
                    "s_name", F.concat(
                        F.lit("Supplier#"), F.substring(stem, 1, 6),
                        (F.col("s_suppkey") % 10).cast("string")))
            if t == "embeddings" and i > 0:
                # deterministic per-(replica, dim) MURMUR3-HASHED
                # perturbation (amplitude 0.1, keeps norms realistic).
                # The r5 form 0.1*cos(j + i) was a ONE-parameter
                # family periodic in i: replicas ~2*pi apart got
                # near-identical perturbations, so past factor ~60 the
                # replica data itself grew quadratically many TRUE
                # near-dup pairs (measured: 1.35M pairs at 100x,
                # 11.3M at 300x, 0 at sf0.1) and the smoke measured
                # its own construction, not the operator. A LINEAR
                # integer hash has the same flaw one level down (the
                # replica-to-replica argument delta is constant in j —
                # a phase shift, measured 282k pairs at 100x); only an
                # avalanche hash of (i, j) decorrelates every
                # cross-replica perturbation pair (distance
                # concentrates at 0.1*sqrt(dims/2): no colliding pair
                # at ANY factor) while within-replica dup structure
                # still repeats linearly, as the instrument intends.
                def _perturb(i):
                    def f(x, j):
                        angle = (F.hash(F.lit(i), j) % 6283) \
                            .cast("double") / F.lit(1000.0)
                        return (x + F.lit(0.1) * F.cos(angle)) \
                            .cast("float")
                    return f
                rep = rep.withColumn(
                    "embedding", F.transform("embedding", _perturb(i)))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite") \
            .parquet(os.path.join(out_dir, t + ".parquet"))


def main() -> int:
    from vega_spark import registry
    from vega_spark.session import get_session

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    selector = sys.argv[2] if len(sys.argv) > 2 else "10"
    out_dir = f"/tmp/vega_scale_sf{factor}x"

    with open(os.path.join(REPO, "bench_detail.json")) as f:
        detail = json.load(f)["queries"]
    ranked = [k for k, _ in sorted(detail.items(), key=lambda kv: -kv[1])]
    op_only_mode = selector.startswith("op:")
    if op_only_mode:
        # op:NAME,... — for contract-wrapped queries, time ONLY the
        # operator sub-plan (skip the full query): the exact-truth
        # verification legs are unguarded by design and dominate wall
        # time at large factors without answering the scale question.
        # Names without an OPERATOR_ONLY leg still run in full.
        selector = selector[3:]
    if selector.startswith("min:"):
        floor = float(selector.split(":", 1)[1])
        names = [k for k in ranked if detail[k] >= floor]
    elif selector.isdigit():
        names = ranked[:int(selector)]
    else:
        names = selector.split(",")

    spark = get_session("vega-scale-bench",
                        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # corpus construction version — bump whenever build_scaled's
    # enrichment changes so cached /tmp replica dirs from an older
    # construction are rebuilt, not silently reused (v4: position-
    # rotating salt tokens restoring simhash fp diversity, r7)
    corpus_v = 4
    vpath = os.path.join(out_dir, "_corpus_version")
    built = os.path.isdir(os.path.join(out_dir, "lineitem.parquet"))
    if built:
        try:
            with open(vpath) as f:
                built = int(f.read().strip()) == corpus_v
        except Exception:
            built = False
    if not built:
        t0 = time.perf_counter()
        build_scaled(spark, SF01, out_dir, factor)
        with open(vpath, "w") as f:
            f.write(str(corpus_v))
        print(f"# built {out_dir} (corpus v{corpus_v}) in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Size the session to the SCALED input (r6 verdict #8: at 1000x
    # the 128 GiB sandbox is the real constraint — that's the
    # measurement). conf_for_scale's arithmetic picks shuffle
    # partitions whose decoded working set fits a task's memory
    # share; without it the 32-partition default put ~500 MB of
    # decoded text per task at 1000x and the OS killed Arrow python
    # workers (observed: stage-straggler 'Python worker exited
    # unexpectedly'). Arrow batches are capped too — a pandas UDF
    # batch of 10k 1000x-salted docs is itself tens of MB.
    from vega_spark.session import conf_for_scale
    input_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(out_dir) for f in fns)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # the task memory share is the JVM's, not the host's: local mode
    # runs every task inside the (driver-memory-sized) single JVM
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g").lower()
    mem_bytes = int(float(mem.rstrip("gm"))
                    * (1024**3 if mem.endswith("g") else 1024**2))
    mem_per_core = mem_bytes // max(cores, 1)
    for k, v in conf_for_scale(input_bytes, cores, mem_per_core).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "2048")
    print(f"# sized session for {input_bytes / 1e9:.1f} GB input: "
          f"shuffle.partitions="
          f"{spark.conf.get('spark.sql.shuffle.partitions')}",
          file=sys.stderr)

    results: dict[str, dict] = {}
    for name in names:
        skip_full = op_only_mode and name in registry.OPERATOR_ONLY
        fn = registry.QUERIES[name]
        if skip_full:
            results[name] = {"full_query": "skipped (op: selector)"}
        else:
            fn(spark, "/root/testdata/sf0.01").count()   # warm/JIT
            t0 = time.perf_counter()
            fn(spark, SF01).count()
            base = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n = fn(spark, out_dir).count()
            big = round(time.perf_counter() - t0, 3)
            ratio = round(big / base, 2) if base > 0 else None
            results[name] = {"sf0.1_sec": base,
                             f"sf0.1x{factor}_sec": big,
                             "ratio": ratio, "rows": n}
            print(f"# {name}: {base:.2f}s -> {big:.2f}s ({ratio}x)",
                  file=sys.stderr)
        note = registry.SCALE_NOTES.get(name)
        if note is not None:
            results[name]["note"] = note
            print(f"#   note {name}: {note}", file=sys.stderr)
        # bounded != empty must be VISIBLE (r5 verdict #4): a guard
        # that truncates all the way to zero output is correct but a
        # debugging trap if the smoke doesn't say so
        if not skip_full and n == 0:
            print(f"# WARN {name}: 0 rows at {factor}x — bounded-but-"
                  f"EMPTY output; read its guard diagnostic below",
                  file=sys.stderr)
        diag = registry.SCALE_DIAGNOSTICS.get(name)
        if diag is not None:
            drow = diag(spark, out_dir).first().asDict()
            results[name]["diagnostic"] = drow
            print(f"#   guard {name}: {drow}", file=sys.stderr)
        # contract-wrapped queries: also ratio the operator sub-plan
        # alone — the contract's exact truth leg is unguarded by
        # design, so only the operator ratio answers the 100 TB
        # question (r4 verdict #3)
        op = registry.OPERATOR_ONLY.get(name)
        if op is not None:
            if skip_full:
                # the full-query sf0.01 warm-up was skipped — warm the
                # operator leg itself so the first base timing isn't
                # session/JIT startup in disguise
                op(spark, "/root/testdata/sf0.01").count()
            t0 = time.perf_counter()
            op(spark, SF01).count()
            ob = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            op(spark, out_dir).count()
            og = round(time.perf_counter() - t0, 3)
            oratio = round(og / ob, 2) if ob > 0 else None
            results[name]["operator_only"] = {
                "sf0.1_sec": ob, f"sf0.1x{factor}_sec": og,
                "ratio": oratio}
            print(f"#   operator-only {name}: {ob:.2f}s -> {og:.2f}s "
                  f"({oratio}x)", file=sys.stderr)

    # factor 10 keeps the judge-facing BENCH_sf1.json name (sf0.1 x 10
    # = sf1); other factors get their own artifact so runs never clobber
    out_name = ("BENCH_sf1.json" if factor == 10
                else f"BENCH_scale_{factor}x.json")
    out_path = os.path.join(REPO, out_name)
    # MERGE into an existing artifact: a targeted re-run (name-list
    # selector) must refresh only its rows, not clobber the widened
    # sweep's coverage. Deep-merge PER ROW (r6 ADVICE): an op:-mode
    # run writes full_query="skipped", which must not replace a
    # prior run's real full-query timing for the same query.
    # Every fresh row carries the corpus version it was measured
    # under (r7 ADVICE): without the per-row stamp, a targeted re-run
    # deep-merged over rows measured on an OLDER corpus construction
    # while the artifact's top-level corpus_version claimed the new
    # one — silently mixing v3 and v4 evidence under one label.
    for row in results.values():
        row["corpus_version"] = corpus_v
    merged = dict(results)
    try:
        with open(out_path) as f:
            prior = json.load(f).get("queries", {})
        merged = dict(prior)
        for name, row in results.items():
            base = dict(prior.get(name, {}))
            if base.get("corpus_version") != corpus_v:
                # prior row measured under a different (or unstamped)
                # corpus build: its timings are not comparable — drop
                # it rather than merge mixed-version evidence
                base = {}
            base.update({k: v for k, v in row.items()
                         if not (k == "full_query"
                                 and "ratio" in base)})
            merged[name] = base
        # prior rows NOT refreshed this run: mark stale if their
        # version differs, so the artifact never presents old-corpus
        # numbers as current evidence
        for name, row in merged.items():
            if (name not in results
                    and row.get("corpus_version") != corpus_v):
                row["stale"] = (f"measured under corpus v"
                                f"{row.get('corpus_version', '<1-3>')}"
                                f", current v{corpus_v}")
    except Exception:
        pass
    out = {"metric": "scale_smoke", "factor": factor,
           "corpus_version": corpus_v,
           "queries": merged,
           "note": ("ratio ~<= factor (+ fixed overhead) = linear-ish; "
                    ">> factor flags a super-linear stage invisible "
                    "at the sf0.1 gate")}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    # worst_ratio considers BOTH legs (r6 ADVICE): a super-linear
    # operator-only ratio must not hide behind a tame full-query one.
    print(json.dumps({"metric": "scale_smoke", "factor": factor,
                      "worst_ratio": max(
                          max(r.get("ratio") or 0,
                              r.get("operator_only", {}).get("ratio") or 0)
                          for r in results.values()),
                      "detail": out_name}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
