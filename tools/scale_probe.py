"""100×-readiness scaling probe: measure each headline query's sf0.1 → 10×
wall-time ratio against a synthetic 10-times-scaled dataset.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md) and /root/testdata is
read-only, so the 10× rung is BUILT here: a deterministic key-shifted 10-way
replication of sf0.1 into a cached probe dir.  Replication is designed so
per-query work scales the way genuinely bigger data would:

* ``documents``: replica k appends a per-replica letter to EVERY word
  (``regexp_replace`` with a backref), so every shingle/minhash/simhash of
  a replica differs from every other replica's — replicas are NOT mutual
  near-duplicates, and the within-replica duplicate structure of sf0.1 is
  preserved (near-dup pair count grows linearly, as in real corpora).
  doc_id shifts by (max+1) per replica.
* ``embeddings``: replica k cyclically rotates the embedding array by k
  dimensions — rotations of high-dimensional vectors are near-orthogonal,
  so replicas spread across k-means cells instead of piling into
  cosine≈1 duplicate clusters.  vec_id shifts by (max+1).
* ``events``: replica k shifts event_id by k·1,155,000 — a multiple of
  lcm(7, 11, 3, 15000), PRESERVING the corpus's malformed-record classes,
  partition assignment, and volume derivation (sources/ticks.py builds all
  of these from event_id residues) — shifts user_id by (max+1), and shifts
  ts by k·(span + 1 minute): the timeline EXTENDS (10× history at the same
  arrival rate), which is the scaling direction streaming state is designed
  for (state per window bounded; window count grows).

Tables the probed queries never read are copied through unchanged.

Usage::

    python tools/scale_probe.py                  # default: 10 slowest (r6)
    python tools/scale_probe.py q1 q2 ...        # explicit query list

Prints one JSON line per query: {"query", "sec_sf01", "sec_10x", "ratio"}
and a trailing summary line.  Ratios land in SCALE.md's probe table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.session import get_spark
from stockpulse_batch_realtime_etl_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"
#: replication factor — override with SCALE_PROBE_REPLICAS=100 for the
#: second rung (the 100× build is ~10× the 10× build; same key-shifting)
REPLICAS = int(os.environ.get("SCALE_PROBE_REPLICAS", "10"))
#: multiple of lcm(7, 11, 3, 15000) — keeps event_id residue classes intact
EVENT_ID_STRIDE = 1_155_000

#: round-8 bench's 10 slowest — the queries whose scaling exponent matters
#: most (streaming_interval_join joined the set this round)
DEFAULT_QUERIES = [
    "streaming_metrics_summary",
    "streaming_interval_join",
    "ann_recall_report",
    "semantic_dedup",
    "ann_ivfpq_topk",
    "dup_groups_star",
    "dup_groups",
    "dedup_survivors",
    "semdedup_recall_report",
    "jaccard_top_pairs",
]


def _fixture_tag(base_dir: str) -> str:
    """Fingerprint of the source fixture via the repo's single
    fixture-identity helper (streaming.job._fixture_fingerprint): a
    REGENERATED sf0.1 at the same path must invalidate the cached probe
    dir, not silently reuse stale replicas — and any future fingerprint
    upgrade (content hashing, symlinks) lands here automatically.  The
    replica-transform version axis is _PROBE_GEN (in the dir name), NOT
    streaming.job._CORPUS_VERSION: a streaming corpus-builder change must
    not force the expensive 100× replica rebuild."""
    import hashlib

    from stockpulse_batch_realtime_etl_spark.streaming.job import (
        _fixture_fingerprint,
    )

    return hashlib.md5(
        _fixture_fingerprint(
            base_dir, ("events", "documents", "embeddings")
        ).encode()
    ).hexdigest()[:8]


#: replication-scheme version: bump when the replica transforms change so a
#: cached probe dir built by older code is never silently reused
_PROBE_GEN = 2


def build_probe_dir(spark, base_dir: str = SF01) -> str:
    dest = os.path.join(
        "/tmp",
        f"stockpulse_sfprobe_x{REPLICAS}"
        f"_g{_PROBE_GEN}_{_fixture_tag(base_dir)}",
    )
    marker = os.path.join(dest, "_PROBE_READY")
    if os.path.exists(marker):
        return dest
    # replica-budget guard BEFORE any write: failing after the documents
    # fan-out would leave a marker-less partial dir and waste the most
    # expensive part of the build
    emb = load_table(spark, base_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    if REPLICAS > 2 * dim:
        # rotation × sign-flip yields exactly 2·dim distinct transforms;
        # replica 2·dim would be bit-identical to replica 0, reintroducing
        # the fake cosine-1 duplicates this scheme exists to avoid — fail
        # loudly rather than corrupt the dedup/ANN probe measurements
        raise ValueError(
            f"SCALE_PROBE_REPLICAS={REPLICAS} exceeds the distinct "
            f"embedding-transform budget 2*dim={2 * dim}; replicas past "
            f"that wrap to exact duplicates of earlier ones"
        )
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)

    docs = load_table(spark, base_dir, "documents")
    d_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(REPLICAS):
        # base-26 suffix so replica counts past 26 stay distinct words
        letter = chr(ord("a") + k // 26) + chr(ord("a") + k % 26)
        txt = (
            F.col("text")
            if k == 0
            else F.regexp_replace("text", r"([A-Za-z0-9]+)", f"$1{letter}")
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * d_stride)).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                F.length(txt).cast("long").alias("n_chars"),
            )
        )
    _union_all(parts).write.parquet(os.path.join(dest, "documents.parquet"))

    v_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for k in range(REPLICAS):
        shift = k % dim
        e = (
            F.col("embedding")
            if shift == 0
            else F.concat(
                F.slice("embedding", shift + 1, dim - shift),
                F.slice("embedding", 1, shift),
            )
        )
        if (k // dim) % 2 == 1:
            # rotation alone cycles at k=dim (replica dim would equal
            # replica 0 exactly → fake cosine-1 duplicates); negating on
            # each wrap doubles the distinct-transform budget (cos = −1
            # against the unnegated twin)
            e = F.transform(e, lambda x: -x)
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * v_stride)).alias("vec_id"),
                e.alias("embedding"),
                "label",
            )
        )
    _union_all(parts).write.parquet(os.path.join(dest, "embeddings.parquet"))

    ev = load_table(spark, base_dir, "events")
    u_stride = ev.agg(F.max("user_id")).collect()[0][0] + 1
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_s = int((hi - lo).total_seconds()) + 60
    parts = []
    for k in range(REPLICAS):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(k * EVENT_ID_STRIDE)).alias(
                    "event_id"
                ),
                (
                    F.col("ts")
                    + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.lit(k * span_s))
                ).alias("ts"),
                (F.col("user_id") + F.lit(k * u_stride)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    _union_all(parts).write.parquet(os.path.join(dest, "events.parquet"))

    # pass-through for everything else the registry might load
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        src = os.path.join(base_dir, f"{name}.parquet")
        if os.path.exists(src):
            dst = os.path.join(dest, f"{name}.parquet")
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    open(marker, "w").close()
    return dest


def build_tpch_probe_dir(spark, base_dir: str = SF01) -> str:
    """Replicated-FACT-TABLE probe dir for the relational (TPC-H-ish)
    family: ``customer``/``orders``/``lineitem`` replicate REPLICAS× with
    CONSISTENT key shifts (custkey stride shared by customer and orders;
    orderkey stride shared by orders and lineitem), so every join
    fan-in/fan-out shape, per-customer order-count distribution,
    per-order line set, and customers-WITHOUT-orders property of sf0.1
    is preserved while the fact volume scales — exactly how a bigger
    TPC-H sf behaves.  Dimension tables (region/nation/supplier/part)
    pass through unchanged: dimensions grow slower than facts, and the
    probed queries join them broadcast-side.  The main probe dir can't
    serve this family — it passes TPC-H tables through, so ratios there
    would read a constant-size scan."""
    dest = os.path.join(
        "/tmp",
        f"stockpulse_sfprobe_tpch_x{REPLICAS}"
        f"_g{_PROBE_GEN}_{_fixture_tag(base_dir)}",
    )
    marker = os.path.join(dest, "_PROBE_READY")
    if os.path.exists(marker):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    cust = load_table(spark, base_dir, "customer")
    orders = load_table(spark, base_dir, "orders")
    li = load_table(spark, base_dir, "lineitem")
    c_stride = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    o_stride = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    parts = [
        cust.select(
            (F.col("c_custkey") + F.lit(k * c_stride)).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        for k in range(REPLICAS)
    ]
    _union_all(parts).write.parquet(os.path.join(dest, "customer.parquet"))
    parts = [
        orders.select(
            (F.col("o_orderkey") + F.lit(k * o_stride)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(k * c_stride)).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        for k in range(REPLICAS)
    ]
    _union_all(parts).write.parquet(os.path.join(dest, "orders.parquet"))
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(k * o_stride)).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        for k in range(REPLICAS)
    ]
    _union_all(parts).write.parquet(os.path.join(dest, "lineitem.parquet"))
    for name in (
        "region",
        "nation",
        "supplier",
        "part",
        "events",
        "documents",
        "embeddings",
    ):
        src = os.path.join(base_dir, f"{name}.parquet")
        if os.path.exists(src):
            dst = os.path.join(dest, f"{name}.parquet")
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    open(marker, "w").close()
    return dest


#: relational-family default list for --tpch-probe: the five queries the
#: round-8 verdict called out as never 100×-probed
TPCH_PROBE_QUERIES = [
    "q7_nation_volume",
    "q13_order_counts",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
]


def tpch_probe(spark, names) -> None:
    queries = entry_mod.queries()
    probe_dir = build_tpch_probe_dir(spark)
    queries["q1_pricing_summary"](spark, SF01).write.format("noop").mode(
        "overwrite"
    ).save()  # warmup
    results = {}
    for name in names:
        base = _time(queries, name, spark, SF01)
        big = _time(queries, name, spark, probe_dir)
        results[name] = round(big / base, 2)
        print(
            json.dumps(
                {
                    "query": name,
                    "sec_sf01": round(base, 3),
                    "sec_100x" if REPLICAS == 100 else "sec_big": round(
                        big, 3
                    ),
                    "ratio": results[name],
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "tpch_fact_scale_ratio",
                "replicas": REPLICAS,
                "queries": results,
                "loadavg_end": round(os.getloadavg()[0], 2),
            },
            separators=(",", ":"),
        )
    )


def _union_all(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


def _time(queries, name: str, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def bpe_sweep(spark, n_merges: int, variants=(0, 16, 64), docs_dir=None) -> None:
    """Measure bpe_learn_merges at TOKENIZER scale (n_merges ≥ 256, vs the
    registered query's 8) across checkpoint_every settings — validating
    where the lazy-replay trade documented in text.py actually flips:
    checkpoint_every=0 keeps the fold chain lazy (O(rounds²·|V|) replay,
    fewer job barriers — measured faster at n=8), k>0 cuts it every k
    rounds (O(rounds·k·|V|)).  Learned merges must be IDENTICAL across
    variants (checkpointing only materializes)."""
    from stockpulse_batch_realtime_etl_spark.operators.text import (
        bpe_learn_merges,
    )

    docs = load_table(spark, docs_dir or SF01, "documents")
    results = {}
    baseline = None
    for ck in variants:
        t0 = time.perf_counter()
        rows = bpe_learn_merges(docs, n_merges, ck).collect()
        dt = time.perf_counter() - t0
        merges = [tuple(r) for r in rows]
        if baseline is None:
            baseline = merges
        else:
            assert merges == baseline, (
                f"checkpoint_every={ck} changed the learned merges"
            )
        results[f"ck{ck}"] = round(dt, 3)
        print(
            json.dumps(
                {
                    "bpe_n_merges": n_merges,
                    "checkpoint_every": ck,
                    "sec": round(dt, 3),
                    "n_learned": len(rows),
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "bpe_checkpoint_sweep",
                "n_merges": n_merges,
                "sec": results,
                "loadavg_end": round(os.getloadavg()[0], 2),
            },
            separators=(",", ":"),
        )
    )


def two_level_probe(spark, ncells: int | None = None) -> None:
    """Measure the two-level quantizer against the flat broadcast argmax
    on the replicated embeddings corpus (SCALE_PROBE_REPLICAS applies):
    wall time of each assignment path at a production-shaped cell count
    (default: ``adaptive_ncells`` of the corpus — the cell count a real
    run of this corpus size would use) plus the assignment AGREEMENT
    rate (two-level is exact except at routing boundaries — the number
    quantifies the approximation the same way semdedup_recall_report
    quantifies cell boundaries)."""
    from stockpulse_batch_realtime_etl_spark.operators.similarity import (
        _assign_cells,
        _norm,
        adaptive_ncells,
        kmeans_centroids,
    )
    from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out

    probe_dir = build_probe_dir(spark)
    emb = load_table(spark, probe_dir, "embeddings")
    n = emb.count()
    if ncells is None:
        ncells = adaptive_ncells(n)
    cent = kmeans_centroids(emb, ncells, iters=1).localCheckpoint()
    vecs = fan_out(emb).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    t0 = time.perf_counter()
    flat = _assign_cells(vecs, cent).select("vec_id", "cell")
    flat.write.format("noop").mode("overwrite").save()
    t_flat = time.perf_counter() - t0
    t0 = time.perf_counter()
    two = _assign_cells(vecs, cent, ncells=ncells, two_level=True).select(
        "vec_id", F.col("cell").alias("cell2")
    )
    two.write.format("noop").mode("overwrite").save()
    t_two = time.perf_counter() - t0
    agree = (
        flat.join(two, "vec_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("cell") == F.col("cell2")).cast("long")).alias("eq"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "metric": "two_level_assign_probe",
                "replicas": REPLICAS,
                "n_vectors": n,
                "ncells": ncells,
                "sec_flat": round(t_flat, 3),
                "sec_two_level": round(t_two, 3),
                "speedup": round(t_flat / t_two, 2),
                "agreement": round(agree.eq / agree.n, 6),
                "loadavg_end": round(os.getloadavg()[0], 2),
            },
            separators=(",", ":"),
        )
    )


def main() -> None:
    if sys.argv[1:2] == ["--bpe-sweep"]:
        spark = get_spark(app_name="stockpulse-scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        # optional third arg: comma-separated checkpoint_every variants —
        # at tokenizer-scale n_merges (≥ 2048) the lazy ck=0 variant's
        # O(rounds²) replay is deliberately excluded unless asked for
        variants = (
            tuple(int(v) for v in sys.argv[3].split(","))
            if len(sys.argv) > 3
            else (0, 16, 64)
        )
        # optional fourth arg "probe": learn on the REPLICAS×-replicated
        # documents corpus instead of sf0.1 — per-replica word suffixes
        # multiply the learnable-merge budget (sf0.1 runs DRY at 89
        # merges: no pair repeats after that, so tokenizer-scale round
        # counts need the bigger vocabulary)
        docs_dir = (
            build_probe_dir(spark) if sys.argv[4:5] == ["probe"] else None
        )
        bpe_sweep(
            spark,
            int(sys.argv[2]) if len(sys.argv) > 2 else 256,
            variants,
            docs_dir,
        )
        return
    if sys.argv[1:2] == ["--tpch-probe"]:
        spark = get_spark(app_name="stockpulse-scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        tpch_probe(spark, sys.argv[2:] or TPCH_PROBE_QUERIES)
        return
    if sys.argv[1:2] == ["--two-level-probe"]:
        spark = get_spark(app_name="stockpulse-scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        two_level_probe(
            spark, int(sys.argv[2]) if len(sys.argv) > 2 else None
        )
        return
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="stockpulse-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    probe_dir = build_probe_dir(spark)
    # warmup (JVM + python workers + numpy/Arrow import in the reused
    # workers), same treatment as bench.py — without the ANN warmup the
    # FIRST probed query's base sample absorbs worker spin-up and its
    # ratio reads artificially low (r7 probe: ann_recall_report 0.76)
    queries["ohlcv_bars"](spark, SF01).write.format("noop").mode(
        "overwrite"
    ).save()
    queries["ann_brute_force_topk"](spark, SF01).write.format(
        "noop"
    ).mode("overwrite").save()
    results = {}
    for name in names:
        base = _time(queries, name, spark, SF01)
        big = _time(queries, name, spark, probe_dir)
        ratio = round(big / base, 2)
        results[name] = {
            "sec_sf01": round(base, 3),
            "sec_10x": round(big, 3),
            "ratio": ratio,
        }
        print(
            json.dumps({"query": name, **results[name]}, separators=(",", ":")),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "sf01_to_10x_ratio",
                "replicas": REPLICAS,
                "queries": {n: r["ratio"] for n, r in results.items()},
                "loadavg_end": round(os.getloadavg()[0], 2),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
