"""Real-data readiness drill (everything after the download gate, at
real scale).

`make ogb-products` chains download → partition/VIP-reorder → distributed
train → score against the BASELINE.md anchor; in an egress-less image it
fails fast at the download step with an actionable message. This module
is the drill that proves every stage AFTER that gate at products scale:

  1. generate a products-shaped dataset (default 2.45M nodes, F=100,
     fp16, 8% train split — ogbn-products' shape) and WRITE it in the
     real on-disk format (GraphData.save);
  2. load it back through the driver's dataset loader (the ingest path);
  3. run the offline partition + VIP-reorder CLI on it
     (partition/cli.py — the run_4constraint_partition + reorder_data
     parity pipeline), producing the partitioned on-disk layout;
  4. train N epochs + eval through the actual driver CLI on the saved
     (unpartitioned) dataset;
  5. record peak RSS per stage (the "does products-scale ingest/reorder
     fit this host's RAM" question, answered with numbers).

What remains unverified without egress: the download itself and the OGB
accuracy anchors (the labels here are synthetic). Usage:

    python -m salient_plusplus_tpu.utils.readiness_drill \
        --nodes 2450000 --parts 8 --epochs 3 --root /tmp/drill
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time


def _rss_gb() -> float:
    self_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return self_rss / 1e6  # kB → GB


def _child_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6


def run_drill(nodes: int = 2_450_000, parts: int = 8, epochs: int = 3,
              root: str = "/tmp/products_drill", feature_dim: int = 100,
              fanouts: str = "15,10,5", batch: int = 1024,
              workers: int = 0, json_out: str | None = None,
              final_test_mode: str = "batchwise",
              resume: bool = False) -> dict:
    """``final_test_mode="layerwise"`` is the right tool at 10M+ nodes:
    the batchwise final test would sample 3-hop neighborhoods for EVERY
    node (~1h at 12M), while layerwise inference computes all-node
    representations one layer at a time (models/inference.py; reference
    layerwise_inference, driver/models.py:441-495). ``resume`` skips
    stages 1-2 when the saved dataset + reordered layout already exist
    (multi-hour drills should not regenerate 6.5 GB to redo stage 3)."""
    os.makedirs(root, exist_ok=True)
    report = {"nodes": nodes, "parts": parts, "epochs": epochs,
              "stages": {}}
    if resume and json_out and os.path.exists(json_out):
        # keep the original run's stage-1/2 receipts in the merged record
        with open(json_out) as f:
            prior = json.load(f)
        report["stages"].update(prior.get("stages", {}))
        report["num_edges"] = prior.get("num_edges")

    def stage(name, t0):
        report["stages"][name] = {
            "seconds": round(time.perf_counter() - t0, 1),
            "peak_rss_gb": round(max(_rss_gb(), _child_rss_gb()), 2)}
        print(f"[drill] {name}: {report['stages'][name]}", flush=True)
        # incremental write: a multi-hour large-scale drill that dies in
        # stage 3 still leaves the RSS receipts of stages 1-2 on disk
        if json_out:
            with open(json_out, "w") as f:
                json.dump(report, f, indent=2)

    reordered = os.path.join(root, f"drill-products-reordered-k{parts}")
    if resume and os.path.isdir(reordered):
        report["dataset_path"] = os.path.join(root, "drill-products")
        report["resumed"] = True
        print("[drill] resume: stages 1-2 found on disk, skipping",
              flush=True)
    else:
        # 1. generate + save in the real on-disk format (fp16 rows, CSR)
        t0 = time.perf_counter()
        from ..data import synthetic

        g = synthetic.powerlaw_graph(
            name="drill-products", num_nodes=nodes, avg_degree=15,
            num_features=feature_dim, num_classes=47, seed=0,
            train_frac=0.08, valid_frac=0.02)
        path = g.save(root)
        report["dataset_path"] = path
        report["num_edges"] = int(g.num_edges)
        del g
        stage("generate_save", t0)

        # 2+3. ingest → partition → VIP reorder through the real CLI
        # (subprocess: its peak RSS is the reorder-fits-in-RAM answer)
        t0 = time.perf_counter()
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="")
        subprocess.run(
            [sys.executable, "-m", "salient_plusplus_tpu.partition.cli",
             "drill-products", "--dataset_root", root, "--out_root", root,
             "--parts", str(parts), "--fanouts", fanouts,
             "--minibatch", str(batch)],
            check=True, env=env)
        stage("partition_reorder", t0)
    assert os.path.isdir(reordered), reordered
    report["reordered_path"] = reordered

    # 4. train through the actual driver CLI (single-host; runs on the
    # real chip when one is attached, CPU otherwise)
    t0 = time.perf_counter()
    args = [sys.executable, "-m", "salient_plusplus_tpu.driver",
            "drill-products", "drill_run",
            "--dataset_root", root,
            "--output_root", os.path.join(root, "jobs"),
            "--epochs", str(epochs), "--train_batch_size", str(batch),
            "--train_fanouts", fanouts,
            "--batchwise_test_fanouts", fanouts,
            "--final_test_fanouts", fanouts,
            "--num_layers", str(len(fanouts.split(","))),
            "--test_epoch_frequency", str(epochs),
            "--final_test_mode", final_test_mode,
            "--num_workers", str(workers or (os.cpu_count() or 4))]
    subprocess.run(args, check=True)
    stage("train_cli", t0)
    with open(os.path.join(root, "jobs", "drill_run",
                           "results.json")) as f:
        report["results"] = json.load(f)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_450_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--root", default="/tmp/products_drill")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--final_test_mode", default="batchwise",
                    choices=["batchwise", "layerwise"])
    ap.add_argument("--resume", action="store_true",
                    help="skip stages 1-2 when the dataset exists")
    args = ap.parse_args(argv)
    rep = run_drill(args.nodes, args.parts, args.epochs, args.root,
                    batch=args.batch, workers=args.workers,
                    json_out=args.out,
                    final_test_mode=args.final_test_mode,
                    resume=args.resume)
    s = json.dumps(rep, indent=2)
    print(s)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s)
    return rep


if __name__ == "__main__":
    main()
