"""Benchmark: edges/s through the flagship RadarScenes edge-conv train step.

Measures the full training step (forward + backward + Adam update) of the
translation-invariant RadarScenes model (configuration_radarscenes.yml: k=20
kNN, conv dims [224,224,128,64,32], node/edge embedding MLPs) on synthetic
frames shaped like cropped RadarScenes clouds.

TPU-idiomatic measurement: the step loop runs ON DEVICE via `lax.scan` over a
stack of pre-staged batches (one dispatch per measurement window), and the
timer syncs by `jax.device_get` of the final losses — robust against host
dispatch latency (the dev tunnel adds ~10-100 ms per dispatch, which would
otherwise dominate).

Baseline: the reference trains this stack via PyG/torch-scatter on GPU; the
north-star target (BASELINE.md) is ≥5× an A100 PyG baseline per chip. No
measured baseline exists in-repo, so we derive one: the flagship stack costs
≈1.1 MFLOP/edge forward (dominated by the per-edge pre-MLPs: 464²+464²+272²
+144²+80² ≈ 0.53M MACs), ≈3.3 MFLOP/edge for a full train step. A100 PyG
typically sustains ~15% of 156 TFLOP/s TF32 on gather/scatter-bound edge
MLPs → ≈ 23 TFLOP/s / 3.3 MFLOP ≈ 7e6 edges/s. `vs_baseline` is
edges_per_s / 7e6 (target ≥ 5).

The MFU-based statement that supersedes that derived anchor
(docs/ROOFLINE.md r4): the default measures the dense fixed-degree (v4)
kNN kernels with exact strict routing — 10.98M edges/s ≈ 18.3%
model-MFU on a v5e; the dense family's kernel MXU floor puts its ceiling
at ≈25M edges/s, and the fused kernels run ~8.1× the unfused XLA
formulation measured on the SAME chip — `vs_baseline` is kept only
because the driver schema requires a single scalar against the derived
cross-hardware proxy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BENCH_MODE=infer measures the serving path instead (jitted batched forward
+ softmax, the Predictor's device work) as infer_edges_per_s.

Reliability: `python bench.py` runs a SUPERVISOR that (1) probes backend
availability with a cheap bounded subprocess (a hung `jax.devices()` dies in
BENCH_PROBE_TIMEOUT s instead of stalling the run — observed in round 1: a
backend-init hang ate 25+ min), (2) launches the real measurement as a
`--worker` subprocess under a hard per-attempt timeout, and (3) retries with
short sleeps while the total BENCH_BUDGET allows. The first successful worker
JSON line is echoed and the supervisor exits 0.

CPU smoke test of the harness itself (no TPU required):
  BENCH_PLATFORM=cpu BENCH_FUSED=0 BENCH_POINTS=256 BENCH_GRAPHS=2 \
  BENCH_STEPS=4 python bench.py
(BENCH_FUSED=0 because the Mosaic kernels only run on TPU.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# supervisor knobs (seconds). The default budget covers a full cold
# compile of the fused train step over a degraded tunnel (~40 min
# observed) — warm-cache runs return in ~3-5 min regardless.
BENCH_BUDGET = float(os.environ.get("BENCH_BUDGET", 3300))
PROBE_TIMEOUT = float(os.environ.get("BENCH_PROBE_TIMEOUT", 120))
RETRY_SLEEP = float(os.environ.get("BENCH_RETRY_SLEEP", 40))
# one long attempt beats several timed-out ones: remote (tunnel) compiles
# of the full fused train step have been observed to take >10 min when the
# tunnel is degraded, so the first attempt gets most of the budget by
# default (a genuinely hung backend is caught by the cheap probe above)
ATTEMPT_TIMEOUT = float(os.environ.get(
    "BENCH_ATTEMPT_TIMEOUT", max(620.0, BENCH_BUDGET - PROBE_TIMEOUT - 90)))

A100_PYG_EDGES_PER_S = 7e6  # derived estimate, see module docstring

NUM_POINTS = int(os.environ.get("BENCH_POINTS", 2816))
# batch of 5 frames = the reference's training batch size
# (configuration_radarscenes.yml); also near the measured per-edge optimum
# (batch sweep: 4 -> 9.21M, 5 -> 9.15M, 8 -> 9.01M, 12 -> 8.69M edges/s —
# the x_g residual streams grow with batch and HBM pressure wins)
GRAPHS = int(os.environ.get("BENCH_GRAPHS", 5))
SCAN_STEPS = int(os.environ.get("BENCH_STEPS", 32))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
FUSED = os.environ.get("BENCH_FUSED", "1") == "1"
# windowed (v3) kernels: Morton node order + in-kernel windowed gathers;
# 0 falls back to the v2 CSR tiling
WINDOWS = os.environ.get("BENCH_WINDOWS", "1") == "1"
# tiling family: "dense" (v4 fixed-degree kNN kernels — no landing matmul,
# no backward one-hot gathers; the DEFAULT since r4: 10.31M vs the
# windowed strict path, and its strict routing is exact by construction),
# "windowed" (v3), or "csr" (v2, same as BENCH_WINDOWS=0). Overrides
# BENCH_WINDOWS when set.
TILING = os.environ.get("BENCH_TILING",
                        "dense" if WINDOWS else "csr")
# overflow budget: 3% fits the flagship clouds' window overflow (~2.9%)
# for contiguous CSR runs; spread tiling (run_cap) pushes frame 3 of the
# bench clouds to 2055 overflow edges (> the 2048 slots of 3%), so
# windowed pairs run_cap=4 with 4%. Dense tiling adds the over-degree
# spill (~2.4% at +4 slots) on top of its window overflow (measured 5.1%
# total at the flagship clouds); 6% is the measured-winning budget
# (10.98M vs 10.62M at 8% — the overflow path processes its full padded
# budget every step).
OVF_FRAC = float(os.environ.get(
    "BENCH_OVF_FRAC",
    "0.06" if TILING == "dense"
    else "0.04" if os.environ.get("BENCH_RUN_CAP", "4") != "0"
    else "0.03"))
# spread-tiling run cap (0 = contiguous CSR runs); see
# configs.GNNArchitectureConfig.fused_run_cap. Measured (docs/RESULTS.md):
# cap=4 @ 4% ovf = 9.66M edges/s vs baseline 9.52M @ 3% (+1.4% net; +3.8%
# at equal overflow budget — the bigger padded overflow arrays eat ~2%)
RUN_CAP = int(os.environ.get("BENCH_RUN_CAP", "4"))
# bf16 backward max-gradient routing (fused_bf16_max). OFF in the model
# config by default because bf16-tied messages each receive the full
# cotangent (k ties => k*g, not a valid subgradient). The bench default
# matches the shipping model-config default (strict routing) so the driver
# headline measures what users get; BENCH_BF16_MAX=1 is the documented
# opt-in speed knob (r3 measured: 9.92M opt-in vs 9.86M strict, +0.6%;
# convergence measured equivalent on the flagship runs, docs/RESULTS.md).
BF16_MAX = os.environ.get("BENCH_BF16_MAX", "0") == "1"


def main():
    import jax

    # smoke-test hook: BENCH_PLATFORM=cpu runs the whole bench on host CPU
    # (the axon plugin ignores the JAX_PLATFORMS env var, so set via config)
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: repeat bench runs skip the multi-minute
    # remote compile
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(__file__) or ".",
                                            ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer

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
        compute_dtype=DTYPE, assume_sorted_edges=True,
        use_fused_aggregation=FUSED, fused_bf16_max=BF16_MAX)

    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=1e-3, epochs=1,
        batch_size=GRAPHS, shuffle=False, bg_index=5, bb_loss_weight=0.5,
        regularization_strength=5e-6, adapt_orientation_angle=True)

    k = 20
    samples = make_samples(num_frames=GRAPHS, num_points=NUM_POINTS, seed=0)
    if FUSED:
        from radargnn_tpu.models.layers import (
            FUSED_DENSE_R_TILE, FUSED_EDGE_TILE, FUSED_NODE_BLOCK,
            FUSED_WINDOW_BLOCKS,
        )
        if TILING == "dense":
            from radargnn_tpu.models.layers import FUSED_DENSE_EXTRA_SLOTS
            tiling = {"mode": "dense", "node_block": FUSED_NODE_BLOCK,
                      "r_tile": FUSED_DENSE_R_TILE,
                      "k": k + FUSED_DENSE_EXTRA_SLOTS,
                      "window_blocks": FUSED_WINDOW_BLOCKS,
                      "ovf_ssum": os.environ.get(
                          "RADARGNN_FUSED_OVF_SSUM", "0") == "1",
                      "ovf_frac": OVF_FRAC}
        else:
            tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
            if TILING == "windowed":
                tiling = tiling + (FUSED_WINDOW_BLOCKS, OVF_FRAC)
                if RUN_CAP:
                    tiling = tiling + (RUN_CAP,)
    else:
        tiling = None
    batch = stack_samples(samples, max_nodes=NUM_POINTS, bg_index=5,
                          max_edges=NUM_POINTS * k, csr_tiling=tiling)

    model, variables = create_detnet_state(arch, jax.random.key(0), batch)
    trainer = Trainer(tcfg, model, variables)

    # vary the node features per scan step so no layer of the stack can be
    # deduplicated/cached anywhere
    noise = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(SCAN_STEPS, 1, 1, batch.node_feat.shape[-1]))
        .astype(np.float32) * 0.01)

    @jax.jit
    def run_epoch(state, batch, noise):
        def body(state, eps):
            b = batch.replace(node_feat=batch.node_feat + eps)
            new_state, losses = trainer.train_step_fn(state, b)
            return new_state, losses[0]

        return jax.lax.scan(body, state, noise)

    valid_edges = GRAPHS * NUM_POINTS * k
    if os.environ.get("BENCH_MODE", "train") == "infer":
        # serving path: jitted batched forward + softmax (no optimizer,
        # no grads) — the Predictor's device work (postprocess.inference)
        @jax.jit
        def run_infer(variables, batch, noise):
            def body(_, eps):
                b = batch.replace(node_feat=batch.node_feat + eps)
                (cls, bb), _ = model.apply_to_batch(
                    variables, b, train=True, mutable=["batch_stats"])
                return 0, (jax.nn.softmax(cls, axis=-1).sum(), bb.sum())
            return jax.lax.scan(body, 0, noise)[1]

        infer_vars = {"params": trainer.state.params,
                      "batch_stats": trainer.state.batch_stats}
        checks = jax.device_get(run_infer(infer_vars, batch, noise))
        t0 = time.perf_counter()
        checks = jax.device_get(run_infer(infer_vars, batch, noise))
        dt = time.perf_counter() - t0
        assert all(np.isfinite(c).all() for c in checks)
        edges_per_s = valid_edges * SCAN_STEPS / dt
        print(json.dumps({
            "metric": "infer_edges_per_s",
            "value": round(edges_per_s, 1),
            "unit": "edges/s/chip",
            "vs_baseline": round(edges_per_s / A100_PYG_EDGES_PER_S, 3),
        }))
        return

    state, losses = run_epoch(trainer.state, batch, noise)
    jax.device_get(losses)                      # warmup + compile sync

    t0 = time.perf_counter()
    state, losses = run_epoch(state, batch, noise)
    losses = jax.device_get(losses)             # hard sync on real data
    dt = time.perf_counter() - t0

    assert np.isfinite(losses).all()
    edges_per_s = valid_edges * SCAN_STEPS / dt

    print(json.dumps({
        "metric": "train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(edges_per_s / A100_PYG_EDGES_PER_S, 3),
    }))


def _probe_backend(deadline_left: float) -> bool:
    """Cheap bounded check that the TPU backend can initialize at all."""
    budget = min(PROBE_TIMEOUT, max(deadline_left, 10))
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import os, jax;"
             "p = os.environ.get('BENCH_PLATFORM');"
             "p and jax.config.update('jax_platforms', p);"
             "jax.devices(); print('BENCH_BACKEND_OK')"],
            capture_output=True, text=True, timeout=budget)
        return "BENCH_BACKEND_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def _supervise() -> int:
    t0 = time.monotonic()
    attempt = 0
    fast_failures = 0
    while True:
        left = BENCH_BUDGET - (time.monotonic() - t0)
        if left < 60:
            print("bench: budget exhausted without a measurement",
                  file=sys.stderr)
            return 1
        if not _probe_backend(left):
            print(f"bench: backend probe failed "
                  f"({left:.0f}s budget left); sleeping {RETRY_SLEEP:.0f}s",
                  file=sys.stderr)
            time.sleep(min(RETRY_SLEEP, max(left - 60, 1)))
            continue
        attempt += 1
        budget = min(ATTEMPT_TIMEOUT, left)
        t_attempt = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True, text=True, timeout=budget)
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {attempt} hit the {budget:.0f}s "
                  "attempt timeout", file=sys.stderr)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith('{"metric"'):
                print(line, flush=True)
                return 0
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        print(f"bench: attempt {attempt} rc={proc.returncode}: "
              + " | ".join(tail), file=sys.stderr)
        # a worker that dies quickly with a Python traceback is a
        # deterministic bug (bad config/budget), not a tunnel flake —
        # retrying forever just burns the budget silently
        fast = time.monotonic() - t_attempt < 120
        if fast and "Traceback" in (proc.stderr or ""):
            fast_failures += 1
            if fast_failures >= 2:
                print("bench: two fast tracebacks — deterministic failure, "
                      "aborting", file=sys.stderr)
                return 1
        else:
            fast_failures = 0
        time.sleep(min(RETRY_SLEEP, max(left - 60, 1)))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        sys.exit(_supervise())
