"""Benchmark harness: headline CDC-replay throughput + operator timings.

Prints ONE JSON line:
  {"metric": "cdc_replay_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": <sf>, "num_cpus": N,
   "events_per_sec": ...}

``--scaling``: runs the headline twice in fresh processes at
RAY_GRAFT_CPUS ∈ {8, 32} on identical cached input and reports both
throughputs + efficiency = (t8/t32)/4 (the N→4N cluster-scaling evidence).

Input: deterministic synthetic change-event log derived from gen.py, cached
under /tmp keyed by sf (generation excluded from timing; both CPU levels
replay byte-identical input with a warmed page cache).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF = SF_DIR.rstrip("/").split("sf")[-1]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scale the synthetic CDC log off the sf dir size (sf0.1 → 16M events, 400k
# docs — large enough that parallel compute dominates the ~3.5s fixed
# orchestration overhead, which is what the N→4N scaling criterion measures)
_EVENT_SCALE = {"0.001": (10_000, 1_000), "0.01": (100_000, 10_000), "0.1": (16_000_000, 400_000)}
N_EVENTS, N_BASE = _EVENT_SCALE.get(SF, (16_000_000, 400_000))
CHUNK = 200_000
BENCH_ROOT = f"/tmp/airbyte_ray_bench/sf{SF}-n{N_EVENTS}"


def ensure_inputs() -> tuple[str, str]:
    """Generate (once) the seeded base snapshot + chunked event log.
    Chunk generation fans out as Ray tasks (deterministic: each chunk's seed
    and lsn range depend only on its index)."""
    import ray

    base_path = os.path.join(BENCH_ROOT, "base.parquet")
    ev_dir = os.path.join(BENCH_ROOT, "events")
    done = os.path.join(BENCH_ROOT, ".done")
    if os.path.exists(done):
        return base_path, ev_dir
    shutil.rmtree(BENCH_ROOT, ignore_errors=True)
    os.makedirs(ev_dir, exist_ok=True)

    @ray.remote
    def gen_chunk(i: int) -> None:
        import pyarrow.parquet as pq

        from airbyte_ray import gen

        n = min(CHUNK, N_EVENTS - i)
        # disjoint lsn ranges per chunk: chunk i owns [1 + 3*i, 1 + 3*(i+n))
        t = gen.gen_events(n, N_BASE, seed=1000 + i, start_lsn=1 + 3 * i, dup_prob=0.02)
        pq.write_table(t, os.path.join(ev_dir, f"chunk-{i:09d}.parquet"))

    @ray.remote
    def gen_base_t() -> None:
        import pyarrow.parquet as pq

        from airbyte_ray import gen

        pq.write_table(gen.gen_base(N_BASE, seed=42), base_path)

    ray.get([gen_base_t.remote()] + [gen_chunk.remote(i) for i in range(0, N_EVENTS, CHUNK)])
    with open(done, "w") as f:
        f.write("ok")
    return base_path, ev_dir


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from airbyte_ray.driver_queries import (
        q_agg_partial,
        q_ann_topk,
        q_dedup_exact,
        q_join_partitioned,
        q_token_count,
    )
    from airbyte_ray.pipelines.replay import LakeTable, ReplayConfig

    base_path, ev_dir = ensure_inputs()

    # warm page cache (untimed)
    ray.data.read_parquet(ev_dir).count()

    timings: dict[str, float] = {}

    # ---- headline: sustained CDC replay into the lake (snapshot is the
    # one-time bootstrap, timed separately) ----
    lake_dir = os.path.join(BENCH_ROOT, f"lake_cpus{NUM_CPUS}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    # merge-applier actor exchange: each byte moves once, no sort machinery;
    # equivalence with the groupby-shuffle path is pytest-verified
    lake = LakeTable(
        lake_dir,
        ReplayConfig(num_partitions=64, salt_factor=1, exchange="actors", num_appliers=16),
    )
    t0 = time.perf_counter()
    lake.init_snapshot(ray.data.read_parquet(base_path))
    t1 = time.perf_counter()
    stats = lake.apply_log(ev_dir)
    headline = time.perf_counter() - t1
    timings["snapshot"] = round(t1 - t0, 3)
    timings["cdc_replay"] = round(headline, 3)
    applied = stats["applied_events"]

    # ---- operator pipelines over the sf dir ----
    def timed(name, fn):
        t = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize()
        timings[name] = round(time.perf_counter() - t, 3)

    if os.environ.get("BENCH_QUERIES", "1") != "0":
        timed("agg_partial", q_agg_partial)
        timed("join_partitioned", q_join_partitioned)
        timed("dedup_exact", q_dedup_exact)
        timed("token_count", q_token_count)
        timed("ann_topk", q_ann_topk)

    ray.shutdown()
    return {
        "metric": "cdc_replay_sec",
        "value": timings["cdc_replay"],
        "unit": "sec",
        "queries": timings,
        "sf": float(SF),
        "num_cpus": NUM_CPUS,
        "events_applied": applied,
        "events_per_sec": round(applied / headline, 1),
    }


def run_scaling(repeats: int = 3) -> dict:
    """Same job, fresh processes, interleaved 8/32-CPU runs, ``repeats``
    each; min() per level filters host-contention noise (this sandbox's VM
    shows 3-5× wall-time swings under an identical workload — interleaving
    decorrelates the drift from the level)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_QUERIES="0")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    los, his = [], []
    for _ in range(repeats):
        los.append(one(8))
        his.append(one(32))
    lo = min(r["value"] for r in los)
    hi = min(r["value"] for r in his)
    eff = (lo / hi) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo,
        "sec_32": hi,
        "sec_8_runs": [r["value"] for r in los],
        "sec_32_runs": [r["value"] for r in his],
        "events_per_sec_8": round(max(r["events_per_sec"] for r in los), 1),
        "events_per_sec_32": round(max(r["events_per_sec"] for r in his), 1),
        "sf": los[0]["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
