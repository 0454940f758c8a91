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

# dense fixed-degree (v4) kernels on the chip: forward + grads vs the XLA
# hoisted formulation computed at the SAME bf16 operand precision the
# kernels use (gather_dtype=bf16 on TPU; tile-split f32 accumulation makes
# tiny residual diffs)
from radargnn_tpu.ops.pallas_kernels import (
    make_fused_dense_aggregate, prepare_dense_knn_tiles, window_part_mask)
from radargnn_tpu.ops.segment import hoisted_segment_max

n, K, r_tile, node_block, wb = 512, 8, 16, 128, 2
e = 3000
send = rng.integers(0, n, e).astype(np.int32)
recv = rng.integers(0, n, e).astype(np.int32)
mask3 = rng.random(e) < 0.9
d_in, de, h = 64, 8, 128
x3 = rng.normal(size=(n, d_in)).astype(np.float32)
w_s3 = (rng.normal(size=(d_in, h)) * 0.1).astype(np.float32)
e3 = rng.normal(size=(e, de)).astype(np.float32)
w_e3 = (rng.normal(size=(de, h)) * 0.1).astype(np.float32)
off3 = rng.normal(size=(n, h)).astype(np.float32)
te = r_tile * K
perm, sloc, twin, ovf_idx = prepare_dense_knn_tiles(
    send, recv, mask3, n, K, r_tile, node_block, wb,
    ovf_budget=-(-e // te) * te)
pmask = window_part_mask(twin, -(-n // node_block), wb)
ovf_valid = ovf_idx >= 0
ovf_s = np.where(ovf_valid, send[np.maximum(ovf_idx, 0)], 0)
ovf_r = np.where(ovf_valid, recv[np.maximum(ovf_idx, 0)], -1)
e_ovf = np.where(ovf_valid[:, None], e3[np.maximum(ovf_idx, 0)], 0.0
                 ).astype(np.float32)
fused = make_fused_dense_aggregate(n, K, r_tile, node_block, wb,
                                   interpret=False)
consts = tuple(map(jnp.asarray, (twin, sloc, pmask, ovf_s, ovf_r)))


def f_dense(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
    return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)


def f_ref(x_, w_s_, e_feat_, w_e_, offset_):
    cd = jnp.bfloat16
    ys = jnp.dot(x_.astype(cd), w_s_.astype(cd),
                 preferred_element_type=jnp.float32)
    ye = jnp.dot(e_feat_.astype(cd), w_e_.astype(cd),
                 preferred_element_type=jnp.float32)
    op = ys.astype(cd).astype(jnp.float32)[jnp.asarray(send)] + ye
    return hoisted_segment_max(op, jnp.asarray(recv), n,
                               jnp.asarray(mask3), False, offset_)


args_d = tuple(map(jnp.asarray, (x3, w_s3, e3[perm], w_e3, off3, e_ovf)))
args_r = tuple(map(jnp.asarray, (x3, w_s3, e3, w_e3, off3)))
got = f_dense(*args_d)
exp = f_ref(*args_r)
err = float(jnp.max(jnp.abs(got - exp)))
print("fused_dense_aggregate fwd max err:", err)
assert err < 2e-2

g_d = jax.grad(lambda *a: (f_dense(*a) ** 2).sum(), argnums=(1, 3, 4))(*args_d)
g_r = jax.grad(lambda *a: (f_ref(*a) ** 2).sum(), argnums=(1, 3, 4))(*args_r)
for nm, a_, b_ in zip(("w_s", "w_e", "offset"), g_d, g_r):
    rel = float(jnp.max(jnp.abs(a_ - b_)) / (jnp.max(jnp.abs(b_)) + 1e-9))
    print(f"fused_dense_aggregate d{nm} max rel err: {rel}")
    assert rel < 5e-2, nm
print("PALLAS DENSE TPU OK")
