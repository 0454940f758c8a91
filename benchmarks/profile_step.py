"""Capture a jax.profiler trace of the flagship train step and print the
op-level time breakdown (top HLO ops by self-time on the device).

Usage:  python benchmarks/profile_step.py [--fused 0|1] [--top N]

This is the measurement tool behind the kernel-optimization work: it tells
us which E-wide ops (gathers, scatter-adds, Pallas kernels, matmuls) the
223 ms step actually spends its time in, rather than guessing from
first principles.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--points", type=int, default=2816)
    ap.add_argument("--graphs", type=int, default=8)
    args = ap.parse_args()

    os.environ["BENCH_FUSED"] = str(args.fused)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer

    fused = args.fused == 1
    arch = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[224, 224, 128, 64, 32],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[16, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[32, 64, 128, 224],
        edge_feature_embedding_layer_dimensions=[4, 8, 16],
        conv_layer_type="MPNNConv", batch_norm_in_mlps=False,
        compute_dtype="bfloat16", assume_sorted_edges=True,
        use_fused_aggregation=fused,
        # default matches bench.py (strict routing) so profiles trace the
        # configuration the driver headline measures
        fused_bf16_max=os.environ.get("BENCH_BF16_MAX", "0") == "1")
    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=1e-3, epochs=1,
        batch_size=args.graphs, shuffle=False, bg_index=5,
        bb_loss_weight=0.5, regularization_strength=5e-6,
        adapt_orientation_angle=True)

    k = 20
    samples = make_samples(num_frames=args.graphs, num_points=args.points,
                           seed=0)
    if fused:
        from radargnn_tpu.models.layers import (
            FUSED_DENSE_EXTRA_SLOTS, FUSED_DENSE_R_TILE, FUSED_EDGE_TILE,
            FUSED_NODE_BLOCK, FUSED_WINDOW_BLOCKS,
        )
        # default mirrors bench.py's shipping default (dense since r4) so
        # an unconfigured profile run traces the same kernel family as the
        # driver headline; BENCH_TILING=windowed/csr selects the other
        # families (the legacy BENCH_WINDOWS knob is intentionally NOT
        # consulted here — its name no longer matches the family it would
        # select)
        mode = os.environ.get("BENCH_TILING", "dense")
        if mode == "dense":
            tiling = {"mode": "dense", "node_block": FUSED_NODE_BLOCK,
                      "r_tile": FUSED_DENSE_R_TILE,
                      "k": k + FUSED_DENSE_EXTRA_SLOTS,
                      "window_blocks": FUSED_WINDOW_BLOCKS,
                      "ovf_ssum": os.environ.get(
                          "RADARGNN_FUSED_OVF_SSUM", "0") == "1",
                      "ovf_frac": float(os.environ.get("BENCH_OVF_FRAC",
                                                       "0.06"))}
        else:
            tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
            if mode == "windowed":
                tiling = tiling + (FUSED_WINDOW_BLOCKS,
                                   float(os.environ.get("BENCH_OVF_FRAC",
                                                        "0.04")))
                # default matches bench.py so profiles trace the same
                # kernel configuration the bench measures
                run_cap = int(os.environ.get("BENCH_RUN_CAP", "4"))
                if run_cap:
                    tiling = tiling + (run_cap,)
    else:
        tiling = None
    batch = stack_samples(samples, max_nodes=args.points, bg_index=5,
                          max_edges=args.points * k, csr_tiling=tiling)

    model, variables = create_detnet_state(arch, jax.random.key(0), batch)
    trainer = Trainer(tcfg, model, variables)

    step = jax.jit(trainer.train_step_fn, donate_argnums=(0,))
    state = trainer.state
    state, losses = step(state, batch)
    jax.block_until_ready(losses)

    logdir = tempfile.mkdtemp(prefix="radargnn_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, losses = step(state, batch)
        jax.block_until_ready(losses)

    # ---- parse the xplane with the tensorboard profile plugin ----
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured; logdir:", logdir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_op_profile", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except Exception:
            pass
        data = data.decode("utf-8", errors="replace")
    try:
        prof = json.loads(data)
    except Exception:
        # fall back: op_stats tool
        print(data[:2000])
        return

    # The hlo_op_profile json: byProgram → children tree with metrics
    def walk(node, depth=0, out=None):
        out = out if out is not None else []
        m = node.get("metrics", {})
        name = node.get("name", "?")
        t = m.get("rawTime", 0)
        out.append((t, name, m.get("flops", 0), m.get("bandwidthUtils", None),
                    depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    root = prof.get("byCategory") or prof.get("byProgram") or prof
    rows = walk(root)
    rows.sort(reverse=True)
    total = rows[0][0] if rows else 1
    print(f"{'self+child time':>16}  {'%':>6}  name")
    for t, name, flops, bw, depth in rows[:args.top]:
        print(f"{t:>16}  {100.0 * t / max(total, 1):>6.2f}  {'  ' * depth}{name[:110]}")
    print("logdir:", logdir)


if __name__ == "__main__":
    main()
