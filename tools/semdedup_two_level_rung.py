"""END-TO-END SemDeDup recall under FORCED two-level routing — the r10
verdict's remaining evidence gap, closed by measurement.

The r10 nprobe rule (``two_level_nprobe(nsuper) = max(8, ⌈nsuper^(2/3)⌉)``)
was calibrated on near-dup PAIR CO-LOCATION in a numpy mirror of the
shipped routing (tools/two_level_coloc_sweep.py — validated
vector-for-vector against ``_assign_cells_two_level``).  Pair co-location
is the governing proxy: a SemDeDup duplicate pair is only ever SCORED if
both members land in the same cell.  This rung converts the proxy argument
into a direct measurement: it runs the ACTUAL shipped
``semdedup_recall_report`` and ``semantic_dedup`` computations through
Spark with ``_assign_cells`` FORCED onto the two-level path at
production-shaped cell counts (≥40k cells — far past anything the gate sfs
reach) and compares recall and the survivor keep-list against the flat
path on the identical corpus and centroid table.

Corpus model (same device as the co-location sweep, so numbers are
comparable): ``ncells`` random unit cluster centers in d=64; each center
contributes ``members`` members = normalize(center + ε·g), ε = scale/√d,
so within-cluster pair cosine ≈ 1/(1+scale²) (scale 0.5 → cos ≈ 0.8, the
SemDeDup regime; threshold defaults to 0.75 so truth pairs are the
within-cluster pairs).  Random centers are the documented WORST CASE for
hierarchical routing — mutually near-orthogonal, single-probe routing
noise-driven — so any recall measured here lower-bounds realistic
(super-cluster-structured) corpora.  The centers double as the injected
centroid table (the training-free device the sweep uses): a 40k-cell
k-means training job is skipped, but everything downstream — routing,
assignment, within-cell pair scoring, keep-list, recall join — is the
shipped Spark code end-to-end.

Run:  python tools/semdedup_two_level_rung.py [--ncells 40000]
          [--members 3] [--scale 0.5] [--threshold 0.75]
          [--truth-cap 16000] [--modes flat,rule,const8]
          [--survivors] [--seed 11]
Emits one JSON line per (mode, measurement).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 64


def build_corpus(ncells: int, members: int, scale: float, seed: int, out: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((ncells, D)).astype(np.float64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    eps = scale / math.sqrt(D)
    vecs = np.repeat(centers, members, axis=0) + eps * rng.standard_normal(
        (ncells * members, D)
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(ncells), pa.int64()),
                "c_emb": pa.array(centers.tolist(), pa.list_(pa.float64())),
            }
        ),
        f"{out}/cent.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(ncells * members), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        ),
        f"{out}/emb.parquet",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncells", type=int, default=40_000)
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--threshold", type=float, default=0.75)
    ap.add_argument("--truth-cap", type=int, default=16_000)
    ap.add_argument("--modes", default="flat,rule,const8")
    ap.add_argument("--survivors", action="store_true")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--workdir", default="/tmp/semdedup_rung")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    build_corpus(args.ncells, args.members, args.scale, args.seed, args.workdir)

    from pyspark.sql import functions as F

    from stockpulse_batch_realtime_etl_spark.operators import similarity as S
    from stockpulse_batch_realtime_etl_spark.session import get_spark

    spark = get_spark()
    cent = spark.read.parquet(f"{args.workdir}/cent.parquet")
    emb = spark.read.parquet(f"{args.workdir}/emb.parquet")
    nsuper = max(2, math.isqrt(max(0, args.ncells - 1)) + 1)
    mode_kw = {
        "flat": dict(two_level=False),
        "rule": dict(two_level=True),  # nprobe = two_level_nprobe(nsuper)
        "const8": dict(two_level=True, nprobe=8),
    }
    nprobe_of = {
        "flat": None,
        "rule": S.two_level_nprobe(nsuper),
        "const8": 8,
    }

    recalls = {}
    for mode in args.modes.split(","):
        t0 = time.time()
        row = (
            S.semdedup_recall_report(
                emb,
                ncells=args.ncells,
                threshold=args.threshold,
                truth_cap=args.truth_cap,
                centroids=cent,
                **mode_kw[mode],
            )
            .collect()[0]
            .asDict()
        )
        row.update(
            kind="recall",
            mode=mode,
            nsuper=nsuper,
            nprobe=nprobe_of[mode],
            ncells=args.ncells,
            n=args.ncells * args.members,
            threshold=args.threshold,
            truth_cap=args.truth_cap,
            wall_sec=round(time.time() - t0, 1),
        )
        recalls[mode] = row["recall"]
        print(json.dumps(row), flush=True)

    if args.survivors:
        kept = {}
        for mode in [m for m in ("flat", "rule") if m in args.modes]:
            t0 = time.time()
            sd = S.semantic_dedup(
                emb,
                ncells=args.ncells,
                threshold=args.threshold,
                centroids=cent,
                **mode_kw[mode],
            ).select("vec_id", "is_kept")
            kept[mode] = sd
            n_kept = sd.filter("is_kept").count()
            print(
                json.dumps(
                    {
                        "kind": "survivors",
                        "mode": mode,
                        "n_kept": n_kept,
                        "n": args.ncells * args.members,
                        "wall_sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )
        if len(kept) == 2:
            t0 = time.time()
            joined = kept["flat"].join(
                kept["rule"].withColumnRenamed("is_kept", "is_kept_two"),
                "vec_id",
            )
            disagree = joined.filter("is_kept != is_kept_two").count()
            print(
                json.dumps(
                    {
                        "kind": "survivor_delta",
                        "n_disagree": disagree,
                        "disagree_frac": round(
                            disagree / (args.ncells * args.members), 6
                        ),
                        "wall_sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
