"""Validates the Pallas kernels compiled on the actual TPU (vs jnp refs)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp, time
from radargnn_tpu.ops.pallas_kernels import (
    fused_linear, fused_linear_reference,
    fused_message_segment_max, fused_message_segment_max_reference,
    prepare_csr_tiles)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(4096, 256)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * 0.05)
b = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
got = fused_linear(x, w, b, relu=True, interpret=False)
exp = fused_linear_reference(x, w, b, relu=True)
err = float(jnp.max(jnp.abs(got - exp)))
print("fused_linear max err:", err)
assert err < 1e-3

E, N, Din, H = 20480, 1024, 64, 128
m_in = rng.normal(size=(E, Din)).astype(np.float32)
recv = rng.integers(0, N, E).astype(np.int32)
mask = rng.random(E) < 0.9
w2 = rng.normal(size=(Din, H)).astype(np.float32) * 0.1
b2 = rng.normal(size=(H,)).astype(np.float32)
perm, tb, padded_recv = prepare_csr_tiles(recv, mask, N, node_block=128, edge_tile=128)
got = fused_message_segment_max(
    jnp.asarray(m_in[perm]), jnp.asarray(w2), jnp.asarray(b2),
    jnp.asarray(padded_recv), jnp.asarray(tb),
    num_nodes=N, node_block=128, edge_tile=128, interpret=False)
exp = fused_message_segment_max_reference(
    jnp.asarray(m_in), jnp.asarray(w2), jnp.asarray(b2),
    jnp.asarray(recv), jnp.asarray(mask), N)
err = float(jnp.max(jnp.abs(got - exp)))
print("fused_message_segment_max max err:", err)
assert err < 1e-3
print("PALLAS TPU OK")
