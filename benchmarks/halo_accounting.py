"""Halo-exchange wire accounting + flagship-scale plan build (r2 verdict
item 6): what multi-chip story is checkable WITHOUT multi-chip hardware.

For flagship-shaped frames (2816 points, k=20, the reference's
configuration_radarscenes.yml workload) this script

  1. builds the halo-windowed plans at mp ∈ {2, 4, 8} with the production
     planner (`build_halo_windowed_plan`) and records its wall time — the
     vectorized planner's first flagship-scale cost numbers,
  2. derives the exact bytes-on-the-wire of the per-layer boundary
     `all_to_all` from the plan's static send budgets (the same arrays the
     kernel ships: outbound [mp, B, D] bf16-equivalent per shard per
     direction, forward + transposed backward per conv layer),
  3. predicts weak-scaling efficiency against v5e ICI bandwidth using the
     measured single-chip step time (bench.py) as the compute term:

         t_comp(mp)  = t_step_1chip / mp          (edges split evenly)
         t_ici(mp)   = max over chips of per-chip wire bytes / BW_ICI
         efficiency  = t_comp / max(t_comp, t_ici)

     The all_to_all is issued BEFORE the tile compute (halo_windowed.py)
     with no data dependency on it, so transfer ≤ compute ⇒ fully hidden;
     beyond that the step is transfer-bound. This is a first-order model —
     it ignores collective latency floors (~µs) which only matter when the
     payload model already predicts ≈1.0 efficiency.

Optionally (--compile) jits ONE flagship-scale halo train step on an
8-virtual-CPU-device mesh to prove plan → compile → execute at scale.

Usage:  python benchmarks/halo_accounting.py [--points 2816] [--graphs 5]
            [--mps 2,4,8] [--compile]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


# v5e ICI: 4 links/chip at 400 Gbps each (1600 Gbps aggregate per chip,
# published v5e spec) ≈ 200 GB/s aggregate; a 1-D "model" ring uses 2 links
# ⇒ ~100 GB/s usable per chip for the all_to_all payload. Stated as an
# assumption, not a measurement.
ICI_BYTES_PER_S = 100e9
# per conv layer input widths of the flagship stack (after the 224-wide
# node embedding): conv dims [224,224,128,64,32]
LAYER_DIMS = [224, 224, 224, 128, 64]
BYTES_PER_EL = 2        # features ship bf16 on the compute path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=2816)
    ap.add_argument("--graphs", type=int, default=5)
    ap.add_argument("--mps", type=str, default="2,4,8")
    ap.add_argument("--step-ms", type=float, default=29.6,
                    help="measured single-chip flagship step time (bench)")
    ap.add_argument("--compile", action="store_true",
                    help="jit one flagship-scale halo train step on an "
                         "8-virtual-device CPU mesh (slow: minutes)")
    args = ap.parse_args()

    import numpy as np

    if args.compile:
        import jax
        jax.config.update("jax_platforms", "cpu")
        flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.ops.pallas_kernels import morton_order
    from radargnn_tpu.parallel.halo_windowed import build_halo_windowed_plan

    t0 = time.perf_counter()
    samples = make_samples(num_frames=args.graphs, num_points=args.points,
                           seed=0)
    t_gen = time.perf_counter() - t0

    rows = []
    for mp in map(int, args.mps.split(",")):
        plans = []
        t0 = time.perf_counter()
        for s in samples:
            order = morton_order(s.pos)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order), dtype=np.int32)
            plans.append(build_halo_windowed_plan(
                inv[s.senders], inv[s.receivers], s.pos.shape[0], mp,
                node_block=256, edge_tile=512, window_blocks=3,
                ovf_frac=0.5))
        t_plan = time.perf_counter() - t0

        # exact wire bytes from the static send budgets: each shard sends
        # outbound [mp, B, D] and receives the same; fwd + transposed bwd
        # per conv layer. B varies per graph; per step = sum over the
        # batch's graphs.
        b_per_graph = [p.halo.send_idx.shape[-1] for p in plans]
        real_sends = [int((p.halo.send_idx >= 0).sum()) / mp
                      for p in plans]     # avg real rows per shard
        per_chip_bytes = sum(
            2 * sum(LAYER_DIMS) * BYTES_PER_EL * mp * b
            for b in b_per_graph)
        t_ici_ms = per_chip_bytes / ICI_BYTES_PER_S * 1e3
        t_comp_ms = args.step_ms / mp
        eff = t_comp_ms / max(t_comp_ms, t_ici_ms)
        rows.append(dict(
            mp=mp, plan_s=round(t_plan, 2),
            halo_b=b_per_graph, real_avg=[round(r) for r in real_sends],
            wire_mb_per_chip=round(per_chip_bytes / 1e6, 2),
            t_ici_ms=round(t_ici_ms, 3), t_comp_ms=round(t_comp_ms, 2),
            predicted_efficiency=round(eff, 3)))
        print(json.dumps(rows[-1]))

    print(json.dumps({"frame_gen_s": round(t_gen, 2),
                      "points": args.points, "graphs": args.graphs,
                      "assumed_ici_gbps": ICI_BYTES_PER_S * 8 / 1e9}))

    if args.compile:
        import jax
        t0 = time.perf_counter()
        import __graft_entry__ as g
        g.dryrun_multichip(8, points=args.points, k=20,
                   flagship=True, compile_only=True)
        print(json.dumps({"flagship_dryrun_s":
                          round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
