"""Scale-stress harness: run the heavy operators on an N× self-union of
sf0.1 and print per-operator wall time + invariant checks. This codifies
the ad-hoc stress runs recorded in NOTES.md so they are reproducible:

    python tools/scale_stress.py [N]      # default N=5

Invariants asserted (not just timed):
- chunk_dedup: surviving docs AND total kept chunks identical at 1× and
  N× (every synthetic copy's chunks dedup to the originals);
- dedup_clusters via minhash pairs: distinct cluster count identical at
  1× and N× (copies collapse into their original's component);
- tfidf_cosine_pairs: every 1× pair reappears N² times at N×, so
  N× count ≥ N²·(1× count) and in particular stays nonzero (a
  near-constant df cap collapses the vector set to 0 pairs at scale —
  the round-3 regression this harness caught). On this corpus the 1×
  pairs form one clique over a 250-doc duplicate family (C(250,2) =
  31,125), so N× is exactly C(250N, 2) — asserted when the clique
  shape is detected.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.session import get_spark, prep_session


def multiply(df, id_col, n):
    out = df
    for i in range(1, n):
        out = out.unionAll(df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)))
    return out.localCheckpoint()


def timed(name, fn):
    t0 = time.time()
    result = fn()
    print(f"{name}: {result} rows, {time.time() - t0:.1f}s", flush=True)
    return result


SF1_SHIFT = 10_000_000  # key-domain shift per copy (matches multiply())


def generate_sf1(spark, out_dir: str, base_dir: str, n: int = 10) -> None:
    """Materialize a deterministic sf1-class table set: an n× self-union
    of ``base_dir`` (sf0.1 → ~6M-row lineitem, 50k docs, 1M events) with
    JOIN-CONSISTENT key shifts — copy i shifts every key in a domain by
    the same i·SF1_SHIFT, so orders⋈lineitem, orders⋈customer, and the
    doc/vec id laws all hold exactly. Shared dims (region/nation/
    supplier/part) are copied 1×: every copy's facts reference the same
    dim rows, which is also the realistic shape. Pure column arithmetic
    over the driver-generated tables — fully deterministic, no sampling."""
    shifted_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    copy_once = ["region", "nation", "supplier", "part"]
    # events.parquet may be TIMESTAMP(NANOS); read raw as long and write
    # the long back — streaming.windows._ts_from_nanos normalizes either
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out_dir, exist_ok=True)
    for t in copy_once:
        spark.read.parquet(f"{base_dir}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in shifted_keys.items():
        df = spark.read.parquet(f"{base_dir}/{t}.parquet")
        out = df
        for i in range(1, n):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SF1_SHIFT))
            out = out.unionAll(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    print(f"generated {n}x of {base_dir} at {out_dir}", flush=True)


def run_sf1() -> None:
    """VERDICT_r06 item 3 — certification one decade past the test SFs:
    run the 20 bench headliners at an sf1-class synthetic (6M-row
    lineitem / 50k docs / 20k vectors / 1M events) and assert the exact
    invariants (two-phase rank+cumsum id laws, cluster-count invariance,
    copy-aware knn exactness). Wall-times print per query with the
    sf0.1 same-session ratio so superlinear growth is visible (data is
    10×; pair-family queries legitimately exceed 10× — see notes)."""
    import bench as benchmod

    import __spark_entry__ as entrymod

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    spark = get_spark("scale_stress_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    if not os.path.exists(f"{out_dir}/_GENERATED"):
        generate_sf1(spark, out_dir, base_dir, n=10)
        with open(f"{out_dir}/_GENERATED", "w") as f:
            f.write(base_dir)

    qs = entrymod.queries()
    # JIT warm-up (bench.py's protocol): without it the sf0.1 baseline
    # pass absorbs classloading/codegen and the ratios understate growth
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = base_dir
    for name in benchmod.BENCH_QUERIES:
        qs[name](spark, warm).write.format("noop").mode("overwrite").save()

    print(f"== sf1 headliner sweep ({out_dir}) ==", flush=True)
    ratios = {}
    for name in benchmod.BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, base_dir).write.format("noop").mode("overwrite").save()
        t_base = time.time() - t0
        t0 = time.time()
        qs[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        t_sf1 = time.time() - t0
        ratios[name] = (t_base, t_sf1)
        print(
            f"{name}: sf0.1 {t_base:.2f}s → sf1 {t_sf1:.2f}s "
            f"({t_sf1 / max(t_base, 1e-9):.1f}x)",
            flush=True,
        )
    t0 = time.time()
    t_ing = benchmod.bench_ingest_sqlite(spark, out_dir)
    print(f"ingest_sqlite: sf1 {t_ing:.2f}s (fixture prep excluded)", flush=True)

    # --- invariants at sf1 (same laws as the N× mode, n=10) ---
    d1 = spark.read.parquet(f"{base_dir}/documents.parquet").localCheckpoint()
    dn = spark.read.parquet(f"{out_dir}/documents.parquet").localCheckpoint()
    from csvs_to_sqlite_spark.operators import dedup
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum, global_rank

    base_rows = d1.select("doc_id", F.length("text").cast("long").alias("w"))
    big_rows = dn.select("doc_id", F.length("text").cast("long").alias("w"))
    r1 = {r["doc_id"]: r["rnk"] for r in global_rank(base_rows, ["doc_id"], "rnk").collect()}
    t0 = time.time()
    rn = {r["doc_id"]: r["rnk"] for r in global_rank(big_rows, ["doc_id"], "rnk").collect()}
    n1 = len(r1)
    for did, rk in rn.items():
        copy, orig = divmod(did, SF1_SHIFT)
        assert rk == r1[orig] + copy * n1, f"global_rank law broke at {did}"
    print(f"global_rank sf1: {len(rn)} ids exact, {time.time()-t0:.1f}s", flush=True)

    c1 = {r["doc_id"]: r["c"] for r in global_cumsum(base_rows, ["doc_id"], "w", "c").collect()}
    t0 = time.time()
    cn = {r["doc_id"]: r["c"] for r in global_cumsum(big_rows, ["doc_id"], "w", "c").collect()}
    total1 = max(c1.values())
    for did, cv in cn.items():
        copy, orig = divmod(did, SF1_SHIFT)
        assert cv == c1[orig] + copy * total1, f"global_cumsum law broke at {did}"
    print(f"global_cumsum sf1: {len(cn)} prefix sums exact, {time.time()-t0:.1f}s", flush=True)

    pairs1 = dedup.minhash_lsh_pairs(d1, "text", "doc_id")
    cl1 = dedup.dedup_clusters(d1, pairs1, "doc_id").select("cluster_id").distinct().count()
    t0 = time.time()
    pairsn = dedup.minhash_lsh_pairs(dn, "text", "doc_id")
    map_pairs = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(dn, pairsn, "doc_id").collect()
    }
    cln = len(set(map_pairs.values()))
    print(f"dedup_clusters sf1: {cln} clusters, {time.time()-t0:.1f}s", flush=True)
    assert cl1 == cln, f"cluster count not scale-invariant: {cl1} vs {cln}"

    # --- bounded candidate edges (VERDICT_r07 #1): the linear-output
    # dedup path. Laws: (a) edge count ≤ docs × bands BY CONSTRUCTION,
    # (b) connected components IDENTICAL to the pair-complete path at
    # sf1 (the mapping, not just the count), (c) wall grows ≤2× at 10×
    # data where the pair-complete path grew 13.3× in r7.
    t0 = time.time()
    e1 = dedup.minhash_lsh_edges(d1, "text", "doc_id")
    e1.write.format("noop").mode("overwrite").save()
    t_edges_base = time.time() - t0
    t0 = time.time()
    en = dedup.minhash_lsh_edges(dn, "text", "doc_id")
    en.write.format("noop").mode("overwrite").save()
    t_edges_sf1 = time.time() - t0
    n_edges = en.count()
    n_docs = dn.count()
    assert n_edges <= n_docs * dedup.MINHASH_BANDS, (n_edges, n_docs)
    map_edges = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(dn, en, "doc_id").collect()
    }
    assert map_edges == map_pairs, "bounded-edge clusters != pair-complete clusters"
    ratio = t_edges_sf1 / max(t_edges_base, 1e-9)
    print(
        f"dedup_pairs_bounded sf1: {n_edges} edges (≤ {n_docs}×{dedup.MINHASH_BANDS}), "
        f"clusters identical to pair-complete path; wall {t_edges_base:.2f}s → "
        f"{t_edges_sf1:.2f}s ({ratio:.1f}x at 10x data)",
        flush=True,
    )
    assert ratio <= 2.0, f"bounded edges wall grew {ratio:.1f}x at 10x data (law: ≤2x)"

    # streaming over the sf1 events DIRECTORY: same 3600 windows, every
    # count exactly 10x its sf0.1 value, sessions exactly 10x (user-id
    # copies are disjoint). Regression for the pathGlobFilter bug this
    # sweep's first run caught: streaming the parent dir with a glob of
    # the table name matches zero part files when the table is a
    # directory — the stream silently emitted 0 rows while every batch
    # query was correct.
    t0 = time.time()
    w1 = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in qs["windowed_event_counts"](spark, base_dir).collect()
    }
    wn = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in qs["windowed_event_counts"](spark, out_dir).collect()
    }
    assert len(wn) == len(w1) and len(wn) > 0, (len(w1), len(wn))
    for k, v in wn.items():
        assert v == 10 * w1[k], f"windowed count law broke at {k}: {v} != 10*{w1[k]}"
    s1 = qs["sessionize_events"](spark, base_dir).count()
    sn = qs["sessionize_events"](spark, out_dir).count()
    assert sn == 10 * s1, f"session count law broke: {sn} != 10*{s1}"
    print(
        f"streaming sf1: {len(wn)} windows exactly 10x, {sn} sessions = 10x, "
        f"{time.time()-t0:.1f}s",
        flush=True,
    )

    # --- RocksDB state store at sf1 (VERDICT_r07 item 8): the windowed
    # aggregation re-runs under the RocksDB provider and must be
    # bit-identical to the default provider's result above; state-size
    # evidence prints from the query's own metrics.
    from csvs_to_sqlite_spark.session import streaming_state_store_conf
    from csvs_to_sqlite_spark.streaming import windows as W

    t0 = time.time()
    saved = {}
    for k, v in streaming_state_store_conf().items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        stream = W._read_stream(spark, f"{out_dir}/events.parquet")
        q = (
            W._agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sf1_rocksdb")
            .start()
        )
        try:
            q.processAllAvailable()
            prog = q.lastProgress
        finally:
            q.stop()
        wr = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.table("sf1_rocksdb").collect()
        }
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    wn_full = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in qs["windowed_event_counts"](spark, out_dir).collect()
    }
    assert wr == wn_full, "RocksDB provider result != default provider result"
    ops = prog["stateOperators"][0]
    cm = ops.get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in cm), "RocksDB did not engage"
    print(
        f"rocksdb sf1: {len(wr)} windows bit-identical to default provider; "
        f"state rows {ops.get('numRowsTotal')}, state mem "
        f"{ops.get('memoryUsedBytes')} B, rocksdb sst "
        f"{cm.get('rocksdbSstFileSize', '?')} B, {time.time()-t0:.1f}s",
        flush=True,
    )

    # knn over a corpus where every vector has 10 exact copies: every
    # query's entire top-5 must be cos≈1 matches (id exactness: the
    # copies of the query vector itself are the nearest neighbors)
    t0 = time.time()
    knn = qs["knn_bruteforce"](spark, out_dir).collect()
    worst = min(r["cos_sim"] for r in knn)
    print(f"knn sf1: {len(knn)} rows, min top-5 cos {worst}, {time.time()-t0:.1f}s", flush=True)
    assert worst >= 0.999999, f"exact-copy neighbors missing: min cos {worst}"

    total_sf1 = sum(t for _, t in ratios.values()) + t_ing
    print(f"sf1 sweep total: {total_sf1:.1f}s — ALL SF1 INVARIANTS HELD", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_stress")
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    d1 = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()
    dn = multiply(d1, "doc_id", n)
    e1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    en = multiply(e1, "vec_id", n)

    from csvs_to_sqlite_spark.operators import dedup, similarity, splits, terms
    from csvs_to_sqlite_spark.operators.packing import chunk_windows

    print(f"== {n}x self-union of {sf_dir} ({dn.count()} docs) ==", flush=True)

    k1 = dedup.chunk_dedup(d1, "text", "doc_id").agg(
        F.count("*"), F.sum("n_kept")
    ).collect()[0]
    t0 = time.time()
    kn = dedup.chunk_dedup(dn, "text", "doc_id").agg(
        F.count("*"), F.sum("n_kept")
    ).collect()[0]
    print(f"chunk_dedup {n}x: {kn[0]} docs / {kn[1]} chunks, {time.time()-t0:.1f}s")
    assert tuple(k1) == tuple(kn), f"chunk_dedup not scale-invariant: {k1} vs {kn}"

    c1 = timed("cosine_pairs 1x", lambda: terms.tfidf_cosine_pairs(d1, "text", "doc_id").count())
    cn = timed(f"cosine_pairs {n}x", lambda: terms.tfidf_cosine_pairs(dn, "text", "doc_id").count())
    assert c1 > 0 and cn >= n * n * c1, f"cosine pairs collapsed: 1x={c1}, {n}x={cn}"
    # if the 1x pairs are one clique C(m,2), the Nx count must be C(Nm,2)
    m = int((1 + (1 + 8 * c1) ** 0.5) / 2)
    if m * (m - 1) // 2 == c1:
        want = (n * m) * (n * m - 1) // 2
        assert cn == want, f"clique growth {cn} != C({n * m},2) = {want}"

    pairs1 = dedup.minhash_lsh_pairs(d1, "text", "doc_id")
    cl1 = dedup.dedup_clusters(d1, pairs1, "doc_id").select("cluster_id").distinct().count()
    t0 = time.time()
    pairsn = dedup.minhash_lsh_pairs(dn, "text", "doc_id")
    cln = dedup.dedup_clusters(dn, pairsn, "doc_id").select("cluster_id").distinct().count()
    print(f"dedup_clusters {n}x: {cln} clusters, {time.time()-t0:.1f}s")
    assert cl1 == cln, f"cluster count not scale-invariant: {cl1} vs {cln}"

    # semdedup: clones are exact (cos=1) with HIGHER ids, and k-means
    # assignment depends only on vector values (seeds stay vec_id <
    # n_centroids, all originals), so cells are identical at 1x and Nx;
    # every copy drops against its original and no copy ever survives.
    sd1 = (
        similarity.semdedup_prune(e1, n_centroids=32)
        .where("kept")
        .count()
    )
    t0 = time.time()
    sdn = (
        similarity.semdedup_prune(en, n_centroids=32)
        .where("kept")
        .agg(
            F.count("*").alias("kept"),
            F.sum((F.col("vec_id") >= 10_000_000).cast("int")).alias("new_survivors"),
        )
        .collect()[0]
    )
    print(f"semdedup {n}x: {sdn['kept']} survivors, {time.time()-t0:.1f}s")
    assert sd1 == sdn["kept"], f"semdedup not scale-invariant: {sd1} vs {sdn['kept']}"
    assert sdn["new_survivors"] == 0, "a synthetic copy survived semdedup"

    # vocab: an N× self-union scales every token count by N, so the
    # top-k set AND its (freq desc, token) ordering are unchanged —
    # the encoding of every original document must be byte-identical.
    v1 = terms.build_vocab(d1, "text", top_k=100)
    t0 = time.time()
    vn = terms.build_vocab(dn, "text", top_k=100)
    enc1 = {
        r["doc_id"]: list(r["ids"])
        for r in terms.encode_docs(d1, "text", "doc_id", v1).collect()
    }
    encn = {
        r["doc_id"]: list(r["ids"])
        for r in terms.encode_docs(
            dn.where(F.col("doc_id") < 10_000_000), "text", "doc_id", vn
        ).collect()
    }
    print(f"vocab_encode {n}x: {len(encn)} docs, {time.time()-t0:.1f}s")
    assert enc1 == encn, "vocab/encoding not scale-invariant under self-union"

    # vocab_overlap: a self-union adds only duplicate (source, token)
    # pairs, so every per-source vocabulary — and hence every pairwise
    # Jaccard — is IDENTICAL at 1x and Nx.
    ov1 = {
        (r["group_a"], r["group_b"]): (r["n_common"], r["jaccard"])
        for r in terms.vocab_overlap(d1, "text", "source").collect()
    }
    t0 = time.time()
    ovn = {
        (r["group_a"], r["group_b"]): (r["n_common"], r["jaccard"])
        for r in terms.vocab_overlap(dn, "text", "source").collect()
    }
    print(f"vocab_overlap {n}x: {len(ovn)} pairs, {time.time()-t0:.1f}s")
    assert ov1 == ovn, "vocab_overlap not scale-invariant under self-union"

    # temperature_mixture: floor'd quotas can never oversubscribe the
    # budget, at any corpus size.
    t0 = time.time()
    tm = splits.temperature_mixture(dn, "doc_id", "source", budget=1000).agg(
        F.sum("n_selected").alias("sel"), F.count("*").alias("groups")
    ).collect()[0]
    print(f"temperature_mixture {n}x: {tm['sel']} selected / {tm['groups']} groups, {time.time()-t0:.1f}s")
    assert tm["sel"] <= 1000, f"quota oversubscribed: {tm['sel']} > 1000"

    timed(f"bm25_search {n}x", lambda: terms.bm25_search(
        dn, "text", "doc_id", ["spark", "shuffle", "window"]).count())

    # Count-Min: an Nx self-union scales every sketch cell AND every
    # exact count by exactly N, so the whole report is the 1x report xN.
    from csvs_to_sqlite_spark.operators.sketch import (
        bloom_prefilter_report,
        cms_heavy_hitters,
    )

    cms1 = {
        r["token"]: (r["exact_n"], r["cms_estimate"])
        for r in cms_heavy_hitters(d1, "text").collect()
    }
    t0 = time.time()
    cmsn = {
        r["token"]: (r["exact_n"], r["cms_estimate"])
        for r in cms_heavy_hitters(dn, "text").collect()
    }
    print(f"cms_heavy_hitters {n}x: {len(cmsn)} tokens, {time.time()-t0:.1f}s")
    assert cmsn == {t: (e * n, c * n) for t, (e, c) in cms1.items()}, "CMS not xN"

    # Bloom: distinct hash sets are unchanged by a self-union (copies
    # carry identical text), so the report is IDENTICAL at 1x and Nx.
    def bloom_row(frame):
        return tuple(
            bloom_prefilter_report(
                frame.where(F.col("doc_id") % 2 == 1),
                frame.where(F.col("doc_id") % 2 == 0),
                "text",
            ).collect()[0]
        )

    b1 = bloom_row(d1)
    t0 = time.time()
    # copies get ids + i*10_000_000 (even offsets), so parity-based
    # probe/master splits see the same distinct-text sets
    bn = bloom_row(dn)
    print(f"bloom_prefilter {n}x: pass={bn[1]}, {time.time()-t0:.1f}s")
    assert b1 == bn, f"bloom report not self-union invariant: {b1} vs {bn}"

    # BPE: word counts scale by N -> identical merges, pair counts xN.
    from csvs_to_sqlite_spark.operators.bpe import learn_bpe

    bpe1 = [tuple(r) for r in learn_bpe(spark, d1, "text", 4).collect()]
    t0 = time.time()
    bpen = [tuple(r) for r in learn_bpe(spark, dn, "text", 4).collect()]
    print(f"bpe_merges {n}x: {len(bpen)} merges, {time.time()-t0:.1f}s")
    assert bpen == [(r, s, t, m, c * n) for (r, s, t, m, c) in bpe1], "BPE not xN"
    timed(f"dsir_importance {n}x", lambda: terms.dsir_importance(
        dn, "text", "doc_id", F.col("source") == "src0").count())

    new = dn.where(F.col("doc_id") % 5 == 0)
    old = dn.where(F.col("doc_id") % 5 != 0)
    timed(f"incremental_dedup {n}x", lambda: dedup.incremental_near_dup_filter(new, old, "text").count())
    timed(f"lm_score {n}x", lambda: terms.lm_score(dn, "text", "doc_id").count())
    timed(f"global_shuffle {n}x", lambda: splits.global_shuffle(dn, "doc_id").count())
    timed(f"chunk_windows {n}x", lambda: chunk_windows(dn).count())
    timed(f"quantize {n}x", lambda: similarity.quantize_embeddings(en).count())
    timed(f"shard_manifest {n}x", lambda: splits.shard_manifest(dn, "doc_id", 64).count())

    # ---- round-3 additions: pagerank, fuzzy_link, retention, charwords ----
    def n_exchanges(df) -> int:
        jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(jmode).count("Exchange")

    def plan_flat(name, mk1, mkn):
        """The N× plan must not grow new exchanges vs 1× — scale changes
        data volume, never plan shape."""
        x1, xn = n_exchanges(mk1()), n_exchanges(mkn())
        assert xn <= x1, f"{name}: plan grew exchanges at {n}x ({x1} -> {xn})"
        print(f"{name}: plan flat ({x1} exchanges at 1x, {xn} at {n}x)")

    from csvs_to_sqlite_spark.operators.graph import pagerank

    # pagerank over the N× near-dup graph (copies share text, so LSH
    # merges every copy into its original's family — the graph is one
    # merged component per family, NOT N disjoint copies). Invariants:
    # rank mass is conserved (Σ rank = 1 up to the 12-dp per-round
    # quantization) and two runs over the same N× graph are
    # BIT-IDENTICAL (the ordered-fold determinism contract).
    pairsn = dedup.minhash_lsh_pairs(dn, "text", "doc_id").localCheckpoint()
    t0 = time.time()
    prn = {r["node"]: r["pagerank"] for r in pagerank(pairsn, "id_a", "id_b", rounds=3).collect()}
    print(f"pagerank {n}x: {len(prn)} nodes, {time.time()-t0:.1f}s")
    mass = sum(prn.values())
    assert abs(mass - 1.0) < 1e-6, f"pagerank mass not conserved: {mass}"
    prn2 = {r["node"]: r["pagerank"] for r in pagerank(pairsn, "id_a", "id_b", rounds=3).collect()}
    assert prn == prn2, "pagerank not bit-deterministic across runs"

    # fuzzy_link under full self-union (both sides xN, ids keep their
    # mod-5 residue since 10M % 5 == 0): every copy of a left row links
    # with the same score, and equal-jaccard ties break to the lowest
    # right id, so links scale EXACTLY xN. Asserted with an explicit
    # combined cap scaled xN (combined dfs scale xN, so the kept token
    # set is identical by construction).
    left1 = d1.where(F.col("doc_id") % 5 != 0)
    right1 = d1.where(F.col("doc_id") % 5 == 0)
    leftn = dn.where(F.col("doc_id") % 5 != 0)
    rightn = dn.where(F.col("doc_id") % 5 == 0)
    l1 = dedup.fuzzy_link(
        left1, right1, "text", "doc_id", "doc_id", max_df=1000
    ).count()
    t0 = time.time()
    ln_ = dedup.fuzzy_link(
        leftn, rightn, "text", "doc_id", "doc_id", max_df=1000 * n
    ).count()
    print(f"fuzzy_link {n}x: {ln_} links, {time.time()-t0:.1f}s")
    assert ln_ == n * l1, f"fuzzy_link not xN: 1x={l1}, {n}x={ln_}"
    # the AUTO per-side fraction cap must not collapse the link set at
    # scale (the round-4 regression this harness caught: the old
    # combined 1% cap dropped EVERY blocking token at 50x -> 0 links)
    la = dedup.fuzzy_link(left1, right1, "text", "doc_id", "doc_id").count()
    lna = dedup.fuzzy_link(leftn, rightn, "text", "doc_id", "doc_id").count()
    print(f"fuzzy_link auto-cap {n}x: {lna} links (1x={la})")
    assert la > 0 and lna >= n * la // 2, f"auto cap collapsed: 1x={la}, {n}x={lna}"

    # retention cohorts: offset copies are N disjoint user populations
    # with identical histories => every (cohort, offset) cell scales xN.
    from csvs_to_sqlite_spark.streaming.windows import load_events

    ev1 = load_events(spark, f"{sf_dir}/events.parquet").localCheckpoint()
    evn = multiply(ev1, "user_id", n)

    def retention(frame):
        firsts = frame.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
        activity = frame.select("user_id", F.to_date("ts").alias("day")).distinct()
        sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
        cells = (
            activity.join(firsts, "user_id")
            .groupBy("cohort", F.datediff("day", "cohort").alias("day_offset"))
            .agg(F.count("*").alias("n_active"))
        )
        return cells.join(F.broadcast(sizes), "cohort").select(
            "cohort", "day_offset", "n_active", "cohort_size"
        )

    r1 = {(r[0], r[1]): (r[2], r[3]) for r in retention(ev1).collect()}
    t0 = time.time()
    rn = {(r[0], r[1]): (r[2], r[3]) for r in retention(evn).collect()}
    print(f"retention_cohorts {n}x: {len(rn)} cells, {time.time()-t0:.1f}s")
    assert rn == {k: (a * n, s * n) for k, (a, s) in r1.items()}, "retention not xN"
    plan_flat("retention_cohorts", lambda: retention(ev1), lambda: retention(evn))

    # charwords: the underlying per-token (in-group, out-group) counts
    # scale exactly xN under a self-union (log-odds deltas then follow
    # deterministically from them).
    def charword_counts(frame):
        toks = frame.select(
            (F.col("source") == "src0").alias("g"),
            F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("token"),
        ).where(F.length("token") > 0)
        return toks.groupBy("token").agg(
            F.sum(F.when(F.col("g"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("g"), 0).otherwise(1)).alias("b"),
        )

    cw1 = {r["token"]: (r["a"], r["b"]) for r in charword_counts(d1).collect()}
    t0 = time.time()
    cwn = {r["token"]: (r["a"], r["b"]) for r in charword_counts(dn).collect()}
    print(f"charwords {n}x: {len(cwn)} tokens, {time.time()-t0:.1f}s")
    assert cwn == {t: (a * n, b * n) for t, (a, b) in cw1.items()}, "charwords not xN"
    plan_flat("charwords", lambda: charword_counts(d1), lambda: charword_counts(dn))

    plan_flat(
        "pagerank_round",
        lambda: pagerank(dedup.minhash_lsh_pairs(d1, "text", "doc_id"), "id_a", "id_b", rounds=1),
        lambda: pagerank(pairsn, "id_a", "id_b", rounds=1),
    )
    plan_flat(
        "fuzzy_link",
        lambda: dedup.fuzzy_link(left1, right1, "text", "doc_id", "doc_id"),
        lambda: dedup.fuzzy_link(leftn, rightn, "text", "doc_id", "doc_id"),
    )
    # boilerplate line filter: line document-frequency scales xN under a
    # self-union, so with a threshold scaled xN the kept/dropped split —
    # and every reconstructed-text digest — is IDENTICAL for original docs.
    bp1 = {
        r[0]: (r[1], r[2], r[3])
        for r in dedup.boilerplate_line_filter(d1, "text", "doc_id", max_freq=2).collect()
    }
    t0 = time.time()
    bpn = {
        r[0]: (r[1], r[2], r[3])
        for r in dedup.boilerplate_line_filter(
            dn, "text", "doc_id", max_freq=2 * n
        ).collect()
        if r[0] < 10_000_000
    }
    print(f"boilerplate_lines {n}x: {len(bpn)} docs, {time.time()-t0:.1f}s")
    assert bpn == bp1, "boilerplate filter not xN-threshold invariant"

    # gopher rules are per-row scan expressions: a copy's verdict equals
    # its original's, at any N
    from csvs_to_sqlite_spark.operators import text as text_ops

    rules = text_ops.gopher_rules(F.col("text"))
    g1 = {
        r[0]: tuple(r)[1:]
        for r in d1.select("doc_id", *[v.alias(k) for k, v in rules.items()]).collect()
    }
    t0 = time.time()
    gn = {
        r[0] % 10_000_000: tuple(r)[1:]
        for r in dn.select("doc_id", *[v.alias(k) for k, v in rules.items()]).collect()
    }
    print(f"gopher_rules {n}x: {len(gn)} verdicts, {time.time()-t0:.1f}s")
    assert gn == g1, "gopher rules not per-row invariant under self-union"

    # bpe_encode: self-union scales every word count xN uniformly, so the
    # learned merges are identical and every copy encodes like its
    # original — per-doc rows must be bit-identical up to the id offset
    from csvs_to_sqlite_spark.operators.bpe import encode_bpe

    be1 = {
        r[0]: tuple(r)[1:]
        for r in encode_bpe(spark, d1, "text", n_merges=8).collect()
    }
    t0 = time.time()
    ben = {
        r[0] % 10_000_000: tuple(r)[1:]
        for r in encode_bpe(spark, dn, "text", n_merges=8).collect()
    }
    print(f"bpe_encode {n}x: {len(ben)} docs, {time.time()-t0:.1f}s")
    assert ben == be1, "bpe_encode not invariant under self-union"

    # blocklist is a per-row scan expression like gopher
    bl_cols = text_ops.blocklist_hits(F.col("text"), ("slow", "crash", "stale"))
    bl1 = {
        r[0]: tuple(r)[1:]
        for r in d1.select(
            "doc_id", *[v.alias(k) for k, v in bl_cols.items()]
        ).collect()
    }
    t0 = time.time()
    bln = {
        r[0] % 10_000_000: tuple(r)[1:]
        for r in dn.select(
            "doc_id", *[v.alias(k) for k, v in bl_cols.items()]
        ).collect()
    }
    print(f"blocklist {n}x: {len(bln)} verdicts, {time.time()-t0:.1f}s")
    assert bln == bl1, "blocklist not per-row invariant under self-union"

    # --- hll_ndv: the distinct (source, token) set is unchanged under
    # self-union, so the ENTIRE report (registers, numerator, estimate)
    # must be identical at 1x and Nx
    from csvs_to_sqlite_spark.operators.sketch import hll_ndv

    h1 = sorted(tuple(r) for r in hll_ndv(d1, "text", "source").collect())
    t0 = time.time()
    hn = sorted(tuple(r) for r in hll_ndv(dn, "text", "source").collect())
    print(f"hll_ndv {n}x: {len(hn)} groups, {time.time()-t0:.1f}s", flush=True)
    assert h1 == hn, "hll_ndv not self-union invariant"

    # --- quality_classifier: per-row scan op; the (n_terms, logit) value
    # histogram must scale exactly xN
    from csvs_to_sqlite_spark.functions.hashing import tokens_expr
    from csvs_to_sqlite_spark.operators.text import hashed_classifier

    def clf_hist(frame):
        base = frame.select(tokens_expr(F.col("text"), distinct=False).alias("toks"))
        cols = hashed_classifier(F.col("toks"), dim=128)
        return {
            (r.n_terms, r.logit_milli): r.c
            for r in base.select(cols["n_terms"].alias("n_terms"),
                                 cols["logit_milli"].alias("logit_milli"))
            .groupBy("n_terms", "logit_milli").agg(F.count("*").alias("c"))
            .collect()
        }

    ch1 = clf_hist(d1)
    t0 = time.time()
    chn = clf_hist(dn)
    print(f"classifier {n}x: {len(chn)} hist cells, {time.time()-t0:.1f}s", flush=True)
    assert chn == {k: v * n for k, v in ch1.items()}, "classifier hist not xN"

    # --- pq_encode: within the Nx run, every synthetic copy must encode
    # to its original's exact code word and error (assignment depends
    # only on vector values and the shared codebook)
    from csvs_to_sqlite_spark.operators.similarity import pq_encode

    t0 = time.time()
    pq_n = {r.vec_id: (r.codes, r.recon_err) for r in pq_encode(en).collect()}
    print(f"pq_encode {n}x: {len(pq_n)} vectors, {time.time()-t0:.1f}s", flush=True)
    for vid, val in list(pq_n.items()):
        if vid >= 10_000_000:
            assert pq_n[vid % 10_000_000] == val, f"copy {vid} diverged from original"
    x1 = n_exchanges(pq_encode(e1))
    xn = n_exchanges(pq_encode(en))
    assert xn <= x1, f"pq_encode plan grew exchanges at {n}x ({x1} -> {xn})"

    # --- zorder_layout: partkey/suppkey are untouched by self-union, so
    # the min/max range, every quantized pair, and every bucket bounding
    # box are identical at Nx — only n_rows scales exactly xN
    import __spark_entry__ as E

    li1 = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    ).localCheckpoint()
    lin = multiply(li1, "l_orderkey", n)
    z1 = {r["bucket"]: tuple(r) for r in E.zorder_layout_frame(li1).collect()}
    t0 = time.time()
    zn = {r["bucket"]: tuple(r) for r in E.zorder_layout_frame(lin).collect()}
    print(f"zorder {n}x: {len(zn)} buckets, {time.time()-t0:.1f}s", flush=True)
    assert set(zn) == set(z1)
    for b, row1 in z1.items():
        bkt, n_rows, pmin, pmax, smin, smax, area = row1
        assert zn[b] == (bkt, n_rows * n, pmin, pmax, smin, smax, area), (
            f"zorder bucket {b} not xN-invariant: {row1} vs {zn[b]}"
        )
    assert n_exchanges(E.zorder_layout_frame(lin)) <= n_exchanges(
        E.zorder_layout_frame(li1)
    ), "zorder plan grew exchanges"

    # --- compaction_plan: shard membership shifts with the new doc ids,
    # but the next-fit bounds must hold at ANY scale: bins 0..<12, every
    # bin <= target + its largest file, bytes conserved
    t0 = time.time()
    plan = E.compaction_plan_frame(dn).collect()
    print(f"compaction {n}x: {len(plan)} files, {time.time()-t0:.1f}s", flush=True)
    total = sum(r["bytes"] for r in plan)
    target = (total + E.COMPACT_BINS - 1) // E.COMPACT_BINS
    bins = {}
    for r in plan:
        assert 0 <= r["bin"] < E.COMPACT_BINS
        b = bins.setdefault(r["bin"], [0, 0])
        b[0] += r["bytes"]
        b[1] = max(b[1], r["bytes"])
    assert sum(b[0] for b in bins.values()) == total
    for bytes_, maxf in bins.values():
        assert bytes_ <= target + maxf, "compaction bin overflow beyond bound"

    # --- ivfpq: the ADC index must keep returning exactly 5 ranked rows
    # per query on the Nx corpus with a flat plan shape
    from csvs_to_sqlite_spark.operators.similarity import ivfpq_topk

    t0 = time.time()
    pq_res = ivfpq_topk(en, en.where(F.col("vec_id") < 10), k=5).collect()
    print(f"ivfpq {n}x: {len(pq_res)} result rows, {time.time()-t0:.1f}s", flush=True)
    per_q = {}
    for r in pq_res:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(range(10))
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert n_exchanges(ivfpq_topk(en, en.where(F.col("vec_id") < 10), k=5)) <= \
        n_exchanges(ivfpq_topk(e1, e1.where(F.col("vec_id") < 10), k=5)), \
        "ivfpq plan grew exchanges"
    # --- source_cosine: sources/texts untouched by self-union, so counts
    # scale xN, dots EXACTLY xN^2 and the cosine is scale-invariant
    from csvs_to_sqlite_spark.operators.terms import source_unigram_cosine

    sc1 = {
        (r["group_a"], r["group_b"]): (r["dot"], r["cosine"])
        for r in source_unigram_cosine(d1, "text", "source").collect()
    }
    t0 = time.time()
    scn = {
        (r["group_a"], r["group_b"]): (r["dot"], r["cosine"])
        for r in source_unigram_cosine(dn, "text", "source").collect()
    }
    print(f"source_cosine {n}x: {len(scn)} pairs, {time.time()-t0:.1f}s", flush=True)
    assert set(scn) == set(sc1), "source pair set changed under self-union"
    for k, (dot1, cos1) in sc1.items():
        dotn, cosn = scn[k]
        assert dotn == dot1 * n * n, f"dot not xN^2 for {k}"
        # sqrt(N^2 x) vs N sqrt(x) can differ in the last ulp
        assert abs(cosn - cos1) < 1e-12, f"cosine drifted for {k}"
    assert n_exchanges(source_unigram_cosine(dn, "text", "source")) <= n_exchanges(
        source_unigram_cosine(d1, "text", "source")
    ), "source_cosine plan grew exchanges"

    # --- salted_distinct: user ids untouched, so n_distinct is invariant
    # and n_rows scales exactly xN; plan must not grow exchanges
    from csvs_to_sqlite_spark.operators.partitioning import salted_distinct_count
    from csvs_to_sqlite_spark.streaming.windows import load_events

    ev1 = load_events(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id", "ts"
    ).localCheckpoint()
    evn = multiply(ev1, "event_id", n)
    sd1 = {r["event_type"]: (r["n_rows"], r["n_distinct"])
           for r in salted_distinct_count(ev1, "event_type", "user_id").collect()}
    t0 = time.time()
    sdn = {r["event_type"]: (r["n_rows"], r["n_distinct"])
           for r in salted_distinct_count(evn, "event_type", "user_id").collect()}
    print(f"salted_distinct {n}x: {len(sdn)} types, {time.time()-t0:.1f}s", flush=True)
    for k, (rows1, dist1) in sd1.items():
        assert sdn[k] == (rows1 * n, dist1), f"salted_distinct law broken for {k}"
    assert n_exchanges(
        salted_distinct_count(evn, "event_type", "user_id")
    ) <= n_exchanges(
        salted_distinct_count(ev1, "event_type", "user_id")
    ), "salted_distinct plan grew exchanges"

    # --- weekly_trend: weekly counts/deltas scale exactly xN and the
    # percent change is an exact half-up of a ratio — scale-INVARIANT
    import __spark_entry__ as EE

    wt1 = {(r["event_type"], r["week_start"]): tuple(r)[2:]
           for r in EE.weekly_trend_frame(ev1).collect()}
    t0 = time.time()
    wtn = {(r["event_type"], r["week_start"]): tuple(r)[2:]
           for r in EE.weekly_trend_frame(evn).collect()}
    print(f"weekly_trend {n}x: {len(wtn)} rows, {time.time()-t0:.1f}s", flush=True)
    assert set(wtn) == set(wt1)
    for k, (c1, p1, dl1, pc1) in wt1.items():
        cn, pn, dln, pcn = wtn[k]
        assert cn == c1 * n
        assert (pn, dln) == ((p1 * n if p1 is not None else None),
                             (dl1 * n if dl1 is not None else None))
        assert pcn == pc1, f"pct_change not scale-invariant for {k}"

    # --- perceptual hashes: bands depend only on payload bytes, so every
    # synthetic copy must hash identically to its original (hamming 0)
    from csvs_to_sqlite_spark.operators.multimodal import (
        audio_fingerprint,
        image_ahash,
        synth_ppm_media,
        synth_wav_media,
    )

    for mk, hasher, label in (
        (synth_ppm_media, image_ahash, "image_ahash"),
        (synth_wav_media, audio_fingerprint, "audio_fp"),
    ):
        m1 = mk(spark, 16)
        mn = multiply(m1, "media_id", n)
        t0 = time.time()
        hn = {r["media_id"]: list(r["bands"]) for r in hasher(mn).collect()}
        print(f"{label} {n}x: {len(hn)} hashes, {time.time()-t0:.1f}s", flush=True)
        for mid, bands in hn.items():
            assert hn[mid % 10_000_000] == bands, f"{label} copy {mid} diverged"

    # --- two-phase global rank / cumsum (round-6 window eliminations):
    # copies occupy disjoint shifted key ranges ABOVE the originals, so
    # at Nx the rank of copy i's row is rank1 + i*n1 and the inclusive
    # cumsum at copy i's row is cum1 + i*total1 — exact integer laws —
    # and neither plan may contain a single-partition window or grow
    # exchanges with N.
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum, global_rank

    base_rows = d1.select("doc_id", F.length("text").cast("long").alias("w"))
    big_rows = dn.select("doc_id", F.length("text").cast("long").alias("w"))
    t0 = time.time()
    r1 = {r["doc_id"]: r["rnk"] for r in global_rank(base_rows, ["doc_id"], "rnk").collect()}
    rn = {r["doc_id"]: r["rnk"] for r in global_rank(big_rows, ["doc_id"], "rnk").collect()}
    n1 = len(r1)
    for did, rk in rn.items():
        copy, orig = divmod(did, 10_000_000)
        assert rk == r1[orig] + copy * n1, f"global_rank law broke at {did}"
    print(f"global_rank {n}x: {len(rn)} rows, law held, {time.time()-t0:.1f}s")

    t0 = time.time()
    c1 = {r["doc_id"]: r["c"] for r in global_cumsum(base_rows, ["doc_id"], "w", "c").collect()}
    cn = {r["doc_id"]: r["c"] for r in global_cumsum(big_rows, ["doc_id"], "w", "c").collect()}
    total1 = max(c1.values())
    for did, cv in cn.items():
        copy, orig = divmod(did, 10_000_000)
        assert cv == c1[orig] + copy * total1, f"global_cumsum law broke at {did}"
    print(f"global_cumsum {n}x: {len(cn)} rows, law held, {time.time()-t0:.1f}s")

    plan_flat(
        "global_rank",
        lambda: global_rank(base_rows, ["doc_id"], "rnk"),
        lambda: global_rank(big_rows, ["doc_id"], "rnk"),
    )

    print("ALL INVARIANTS HELD")


def run_sf10() -> None:
    """VERDICT_r07 item 5 — decade 2: certify the laws that bind at
    scale on an sf10-class set (100× self-union of sf0.1 → 60M lineitem
    / 15M orders / 10M events / 500k docs / 500k vectors):

    - global_rank / global_cumsum id EXACTNESS at 500k rows forced onto
      200 partitions — past the 64-partition broadcast-offset fallback
      (the r6 RangePartitioner bug and this path both only show up one
      decade past the test SFs);
    - dedup cluster invariance THROUGH THE BOUNDED-EDGE PATH (the
      pair-complete path grows C(100,2)× per family at 100 copies —
      exactly the blowup minhash_lsh_edges exists to avoid; clusters
      must still equal the 1× count);
    - streaming windowed counts exactly 100× in every window over the
      10M-event directory;
    - knn over 500k vectors where every vector has 100 exact copies
      (top-5 all cos=1);
    - r11 (VERDICT_r10 #6): knn_lsh + a PERSISTED IVF index built from
      the 500k-vector corpus (cell-partitioned on disk) under the same
      exact-copy recall law, and perceptual-hash image dedup at 100x
      images with planted-copy completeness at hamming 0;
    - ingest wall at 60M rows (CSV materialized by Spark, not pandas —
      a 60M-row toPandas would OOM the driver, which is itself the
      scale lesson).

    Per-step walls print next to their sf0.1 equivalents so superlinear
    operators are NAMED, not averaged away."""
    import bench as benchmod

    import __spark_entry__ as entrymod

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
    spark = get_spark("scale_stress_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    t0 = time.time()
    if not os.path.exists(f"{out_dir}/_GENERATED"):
        generate_sf1(spark, out_dir, base_dir, n=100)
        with open(f"{out_dir}/_GENERATED", "w") as f:
            f.write(base_dir)
    print(f"fixture ready in {time.time()-t0:.1f}s", flush=True)

    from csvs_to_sqlite_spark.operators import dedup
    from csvs_to_sqlite_spark.operators.rowid import global_cumsum, global_rank

    qs = entrymod.queries()
    d1 = spark.read.parquet(f"{base_dir}/documents.parquet").localCheckpoint()
    dn = (
        spark.read.parquet(f"{out_dir}/documents.parquet")
        .repartition(200)  # force the >64-partition broadcast-offset path
        .localCheckpoint()
    )
    n_docs = dn.count()
    assert n_docs == 100 * d1.count(), n_docs

    # --- id laws at 200 partitions / 500k rows ---
    base_rows = d1.select("doc_id", F.length("text").cast("long").alias("w"))
    big_rows = dn.select("doc_id", F.length("text").cast("long").alias("w"))
    r1 = {r["doc_id"]: r["rnk"] for r in global_rank(base_rows, ["doc_id"], "rnk").collect()}
    t0 = time.time()
    rn = {r["doc_id"]: r["rnk"] for r in global_rank(big_rows, ["doc_id"], "rnk").collect()}
    n1 = len(r1)
    assert len(rn) == len(set(rn.values())) == 100 * n1  # dense, no collisions
    for did, rk in rn.items():
        copy, orig = divmod(did, SF1_SHIFT)
        assert rk == r1[orig] + copy * n1, f"global_rank law broke at {did}"
    print(f"global_rank sf10: {len(rn)} ids exact at 200 partitions, {time.time()-t0:.1f}s", flush=True)

    c1 = {r["doc_id"]: r["c"] for r in global_cumsum(base_rows, ["doc_id"], "w", "c").collect()}
    t0 = time.time()
    cn = {r["doc_id"]: r["c"] for r in global_cumsum(big_rows, ["doc_id"], "w", "c").collect()}
    total1 = max(c1.values())
    for did, cv in cn.items():
        copy, orig = divmod(did, SF1_SHIFT)
        assert cv == c1[orig] + copy * total1, f"global_cumsum law broke at {did}"
    print(f"global_cumsum sf10: {len(cn)} prefix sums exact, {time.time()-t0:.1f}s", flush=True)

    # --- bounded-edge dedup clusters at 100 copies/doc ---
    e1 = dedup.minhash_lsh_edges(d1, "text", "doc_id")
    cl1 = (
        dedup.dedup_clusters(d1, e1, "doc_id").select("cluster_id").distinct().count()
    )
    t0 = time.time()
    en = dedup.minhash_lsh_edges(dn, "text", "doc_id")
    n_edges = en.count()
    t_edges = time.time() - t0
    assert n_edges <= n_docs * dedup.MINHASH_BANDS, (n_edges, n_docs)
    t0 = time.time()
    cln = (
        dedup.dedup_clusters(dn, en, "doc_id").select("cluster_id").distinct().count()
    )
    t_clusters = time.time() - t0
    assert cl1 == cln, f"cluster count not scale-invariant: {cl1} vs {cln}"
    print(
        f"dedup sf10 (bounded edges): {n_edges} edges in {t_edges:.1f}s, "
        f"{cln} clusters (= 1x) in {t_clusters:.1f}s",
        flush=True,
    )

    # --- streaming: every window exactly 100x ---
    t0 = time.time()
    w1 = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in qs["windowed_event_counts"](spark, base_dir).collect()
    }
    wn = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in qs["windowed_event_counts"](spark, out_dir).collect()
    }
    assert len(wn) == len(w1) and len(wn) > 0, (len(w1), len(wn))
    for k, v in wn.items():
        assert v == 100 * w1[k], f"windowed count law broke at {k}"
    print(f"streaming sf10: {len(wn)} windows exactly 100x, {time.time()-t0:.1f}s", flush=True)

    # --- knn over 500k vectors, 100 exact copies each ---
    t0 = time.time()
    knn = qs["knn_bruteforce"](spark, out_dir).collect()
    worst = min(r["cos_sim"] for r in knn)
    print(f"knn sf10: {len(knn)} rows, min top-5 cos {worst}, {time.time()-t0:.1f}s", flush=True)
    assert worst >= 0.999999, f"exact-copy neighbors missing: min cos {worst}"

    # --- ANN decade (VERDICT_r10 #6): knn_lsh + persisted IVF over the
    # 500k-vector corpus, 100 exact copies per vector. Identical vectors
    # share LSH buckets and IVF cells, so every query's top-5 must be
    # exact copies (cos 1) — a recall law that binds the bucketing, not
    # just the scorer. Walls print next to the 1x equivalents.
    from csvs_to_sqlite_spark.operators import similarity

    t0 = time.time()
    l1 = qs["knn_lsh"](spark, base_dir).collect()
    t_lsh1 = time.time() - t0
    t0 = time.time()
    ln = qs["knn_lsh"](spark, out_dir).collect()
    t_lshn = time.time() - t0
    worst_lsh = min(r["cos_sim"] for r in ln)
    assert worst_lsh >= 0.999999, f"lsh exact-copy recall broke: {worst_lsh}"
    print(
        f"knn_lsh sf10: {len(ln)} rows (1x {len(l1)}), min top-5 cos "
        f"{worst_lsh}, {t_lshn:.1f}s (1x {t_lsh1:.1f}s)",
        flush=True,
    )

    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    emb_n = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    queries10 = emb_n.where(F.col("vec_id") < 10)
    ivf_path = _tempfile.mkdtemp(prefix="sf10_ivf_")
    try:
        t0 = time.time()
        similarity.ivf_index_write(emb_n, ivf_path)
        t_build = time.time() - t0
        cell_dirs = _glob.glob(os.path.join(ivf_path, "cells", "cell=*"))
        assert cell_dirs, "IVF on-disk layout missing cell= partitions"
        t0 = time.time()
        ivf = similarity.ivf_index_topk(
            spark, ivf_path, queries10, k=5, n_probe=2
        ).collect()
        t_query = time.time() - t0
        worst_ivf = min(r["cos_sim"] for r in ivf)
        assert worst_ivf >= 0.999999, f"ivf exact-copy recall broke: {worst_ivf}"
        print(
            f"ivf sf10: built 500k-vector index in {t_build:.1f}s "
            f"({len(cell_dirs)} cells on disk), top-5 query {t_query:.1f}s, "
            f"min cos {worst_ivf}",
            flush=True,
        )
    finally:
        _shutil.rmtree(ivf_path, ignore_errors=True)

    # --- multimodal decade: perceptual dedup at 100x images. The 1x
    # PAIR path proves banded completeness (every planted copy at
    # hamming 0); the 100x DESTRUCTIVE path routes through the LINEAR
    # exact-groups form — the first 100x probe showed why: the synthetic
    # gradient corpus is near-dup-dense and pair output hit 15.2M of 32M
    # possible pairs (inherently |matching pairs|-sized, quadratic on
    # dense corpora regardless of join strategy), while exact-groups
    # output is corpus-sized by construction.
    from csvs_to_sqlite_spark.operators.multimodal import (
        image_ahash_exact_groups,
        image_ahash_pairs,
        synth_ppm_media,
    )

    def planted_media(n_imgs, offset):
        m = synth_ppm_media(spark, n_imgs)
        return m.unionByName(
            m.where(F.col("media_id") % 4 == 0).withColumn(
                "media_id", F.col("media_id") + offset
            )
        )

    t0 = time.time()
    p1 = image_ahash_pairs(planted_media(64, 1000), max_hamming=7)
    planted1 = p1.where(
        (F.col("hamming") == 0)
        & (F.abs(F.col("id_a") - F.col("id_b")) == 1000)
        & (F.least("id_a", "id_b") % 4 == 0)
    ).count()
    n1_pairs = p1.count()
    t_img1 = time.time() - t0
    assert planted1 == 16, planted1

    n_imgs, offset = 6400, 1_000_000
    t0 = time.time()
    g = image_ahash_exact_groups(planted_media(n_imgs, offset)).localCheckpoint()
    n_rows = g.count()
    t_imgn = time.time() - t0
    n_aug = n_imgs + n_imgs // 4
    assert n_rows == n_aug, (n_rows, n_aug)  # output corpus-sized
    # every planted copy shares its original's representative
    orig = g.where(F.col("media_id") < offset).select(
        F.col("media_id").alias("o_id"), F.col("rep_id").alias("o_rep")
    )
    copies = g.where(F.col("media_id") >= offset).select(
        (F.col("media_id") - offset).alias("o_id"),
        F.col("rep_id").alias("c_rep"),
        "group_size",
    )
    joined = copies.join(orig, "o_id")
    n_copies = joined.count()
    n_same = joined.where(
        (F.col("c_rep") == F.col("o_rep")) & (F.col("group_size") >= 2)
    ).count()
    assert n_copies == n_imgs // 4 and n_same == n_copies, (n_copies, n_same)
    print(
        f"image_ahash sf10: exact-groups over {n_aug} images in "
        f"{t_imgn:.1f}s (output {n_rows} rows, corpus-sized; 1x pair path "
        f"{n1_pairs} pairs incl. all 16 planted at hamming 0, "
        f"{t_img1:.1f}s); all {n_same} planted copies share their "
        f"original's representative",
        flush=True,
    )

    # --- ingest wall at 60M rows (Spark-materialized CSV) ---
    from csvs_to_sqlite_spark.engine import import_csvs

    tmp = _tempfile.mkdtemp(prefix="sf10_ingest_")
    csv_dir = os.path.join(tmp, "csv")
    t0 = time.time()
    (
        spark.read.parquet(f"{out_dir}/lineitem.parquet")
        .coalesce(1)
        .write.option("header", True)
        .csv(csv_dir)
    )
    part = _glob.glob(os.path.join(csv_dir, "part-*.csv"))[0]
    csv_path = os.path.join(tmp, "lineitem.csv")
    os.rename(part, csv_path)
    print(
        f"sf10 CSV materialized: {os.path.getsize(csv_path)/1e9:.2f} GB, "
        f"{time.time()-t0:.1f}s (prep, excluded from ingest wall)",
        flush=True,
    )
    t0 = time.time()
    import_csvs(
        spark,
        [csv_path],
        os.path.join(tmp, "out.db"),
        extract_column=["l_returnflag", "l_linestatus"],
    )
    print(f"ingest_sqlite sf10: {time.time()-t0:.1f}s at 60M rows", flush=True)
    print("ALL SF10 INVARIANTS HELD", flush=True)


if __name__ == "__main__":
    if "--sf10" in sys.argv:
        run_sf10()
    elif "--sf1" in sys.argv:
        run_sf1()
    else:
        main()
