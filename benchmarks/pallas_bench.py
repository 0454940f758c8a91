"""Pallas fused matmul+segment-max vs XLA at flagship scale (on-chip).

Scan-amortized comparison (see bench.py protocol) of:
  A. XLA: m_in @ W + b → segment_max (sorted)
  B. Pallas fused_message_segment_max (no [E,H] round trip through HBM)

Prints one JSON line per variant.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radargnn_tpu.ops.pallas_kernels import (
        fused_message_segment_max, prepare_csr_tiles,
    )
    from radargnn_tpu.ops.segment import segment_max

    parser = argparse.ArgumentParser()
    parser.add_argument("--edges", type=int, default=450_560)
    parser.add_argument("--nodes", type=int, default=22_528)
    parser.add_argument("--din", type=int, default=464)
    parser.add_argument("--h", type=int, default=464)
    parser.add_argument("--steps", type=int, default=16)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    e, n, din, h = args.edges, args.nodes, args.din, args.h
    m_in = rng.normal(size=(e, din)).astype(np.float32) * 0.05
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    mask = np.ones(e, bool)
    w = rng.normal(size=(din, h)).astype(np.float32) * 0.05
    b = rng.normal(size=(h,)).astype(np.float32)

    noise = jnp.asarray(rng.normal(size=(args.steps, 1, din))
                        .astype(np.float32) * 0.01)

    def bench(name, fn, *arrays):
        @jax.jit
        def run(noise, *arrays):
            def body(carry, eps):
                out = fn(arrays[0] + eps, *arrays[1:])
                return carry + out[0, 0], out[0, 0]
            return jax.lax.scan(body, jnp.float32(0), noise)

        arrays = tuple(jnp.asarray(a) for a in arrays)
        _, outs = run(noise, *arrays)
        jax.device_get(outs)
        t0 = time.perf_counter()
        _, outs = run(noise, *arrays)
        jax.device_get(outs)
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"metric": f"segmax_{name}_ms", "value":
                          round(dt * 1000, 2), "unit": "ms/step"}))
        return dt

    # A: XLA
    wj, bj, rj = jnp.asarray(w), jnp.asarray(b), jnp.asarray(receivers)
    maskj = jnp.asarray(mask)

    def xla_fn(m_in_, w_, b_, r_, mk_):
        m = m_in_ @ w_ + b_
        return segment_max(m, r_, n, mk_, indices_are_sorted=True)

    bench("xla", xla_fn, m_in, w, b, receivers, mask)

    # B: Pallas fused
    node_block, edge_tile = 128, 256
    perm, tile_blocks, padded_recv = prepare_csr_tiles(
        receivers, mask, n, node_block, edge_tile)
    m_in_p = m_in[perm]

    for variant in ("onehot", "scan"):
        def pallas_fn(m_in_, w_, b_, pr_, tb_, _v=variant):
            return fused_message_segment_max(
                m_in_, w_, b_, pr_, tb_, num_nodes=n,
                node_block=node_block, edge_tile=edge_tile, interpret=False,
                variant=_v)

        bench(f"pallas_{variant}", pallas_fn, m_in_p, w, b, padded_recv,
              tile_blocks)


if __name__ == "__main__":
    main()
