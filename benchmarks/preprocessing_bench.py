"""Host-side dataset-creation throughput: graph construction + GT labels.

The reference's preprocessing stage is its only parallel component (Ray CPU
fan-out over sequences, `preprocessor/radarscenes/dataset_creation.py:110-127`
in /root/reference) because its per-edge Python feature loop
(`graph_constructor/graph.py:172-223`) and sklearn ball-tree kNN dominate.
This benchmark measures our vectorized replacement on the same work: kNN
graph build + invariant node/edge features + 3-format GT boxes per frame.

Usage: python benchmarks/preprocessing_bench.py [--points N] [--frames N]
       [--no-native] [--workers N]

Prints per-stage points/s and edges/s, single-process and process-pool.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def _make_frames(num_frames, num_points, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(num_frames):
        pos = rng.uniform(0, 100, (num_points, 2)).astype(np.float64)
        vel = rng.normal(0, 3, (num_points, 2)).astype(np.float64)
        rcs = rng.normal(0, 5, (num_points, 1)).astype(np.float64)
        t = rng.uniform(0, 0.5, (num_points, 1)).astype(np.float64)
        n_obj = max(num_points // 60, 1)
        track = rng.integers(-1, n_obj, num_points)
        frames.append((pos, vel, rcs, t, track))
    return frames


def _process_frame(args):
    frame, k = args
    import numpy as np

    from radargnn_tpu.configs import GraphConstructionConfiguration
    from radargnn_tpu.data.ground_truth import create_2d_bounding_boxes
    from radargnn_tpu.graph.build import build_geometric_graph

    pos, vel, rcs, t, track = frame
    cfg = GraphConstructionConfiguration(
        graph_construction_algorithm="knn",
        graph_construction_settings={"k": k, "r": 1.0},
        node_features=["rcs", "time_index", "degree"],
        edge_features=["point_pair_features"],
        edge_mode="directed",
        distance_definition="X")
    g = build_geometric_graph(cfg, pos, vel, rcs, t)
    boxes = create_2d_bounding_boxes(pos, track, aligned=False,
                                     bb_invariance="translation")
    return g.edges.shape[0], np.isfinite(boxes).sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=2816)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--workers", type=int, default=_os.cpu_count())
    ap.add_argument("--no-native", action="store_true",
                    help="disable the C++ host kernels (numpy fallbacks)")
    args = ap.parse_args()
    if args.no_native:
        _os.environ["RADARGNN_NO_NATIVE"] = "1"

    frames = _make_frames(args.frames, args.points, seed=0)
    work = [(f, args.k) for f in frames]

    _process_frame(work[0])                      # warm imports + native build
    t0 = time.perf_counter()
    edges = sum(_process_frame(w)[0] for w in work)
    dt1 = time.perf_counter() - t0
    pts = args.frames * args.points
    print(f"single-process: {pts / dt1:,.0f} points/s, "
          f"{edges / dt1:,.0f} edges/s ({dt1:.2f} s, native="
          f"{not args.no_native})")

    if args.workers and args.workers > 1:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=args.workers) as ex:
            list(ex.map(_process_frame, work[:2]))   # pool warmup
            t0 = time.perf_counter()
            total = sum(e for e, _ in ex.map(_process_frame, work))
            dt2 = time.perf_counter() - t0
        print(f"{args.workers}-process pool: {pts / dt2:,.0f} points/s, "
              f"{total / dt2:,.0f} edges/s ({dt2:.2f} s)")


if __name__ == "__main__":
    main()
