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

# v3 strict-routing gradient regression guard (r4): Mosaic's default f32
# dot runs ONE bf16 pass on TPU, which bf16-rounded the "f32" landing and
# made the strict 1e-5 routing equality miss the true argmax — measured
# pre-fix: only 2.1% of the expected x-gradient magnitude survived
# (bf16_max: 100.3%). _SEL_PRECISION on the selection dots restores it;
# this check pins the ratio.
from radargnn_tpu.ops.pallas_kernels import (
    make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
    window_part_mask)

n4, e4, d4, de4, h4 = 512, 4000, 32, 8, 64
nb4, te4, wb4 = 128, 128, 2
x4 = rng.normal(size=(n4, d4)).astype(np.float32)
ws4 = (rng.normal(size=(d4, h4)) * 0.3).astype(np.float32)
ef4 = rng.normal(size=(e4, de4)).astype(np.float32)
we4 = (rng.normal(size=(de4, h4)) * 0.3).astype(np.float32)
off4 = rng.normal(size=(n4, h4)).astype(np.float32)
base4 = rng.integers(0, n4, e4)
send4 = base4.astype(np.int32)
recv4 = np.clip(base4 + rng.integers(-40, 40, e4), 0, n4 - 1).astype(np.int32)
mask4 = np.ones(e4, bool)
(perm4, tb4, prec4, sloc4, twin4, ovfi4) = prepare_windowed_csr_tiles(
    send4, recv4, mask4, n4, nb4, te4, wb4,
    ovf_budget=-(-e4 // te4) * te4)
pmask4 = window_part_mask(twin4, -(-n4 // nb4), wb4)
ov4 = ovfi4 >= 0
ovs4 = np.where(ov4, send4[np.maximum(ovfi4, 0)], 0)
ovr4 = np.where(ov4, recv4[np.maximum(ovfi4, 0)], -1)
ove4 = np.where(ov4[:, None], ef4[np.maximum(ovfi4, 0)], 0.0
                ).astype(np.float32)
consts4 = tuple(map(jnp.asarray, (prec4, tb4, twin4, sloc4, pmask4,
                                  ovs4, ovr4)))
args4 = tuple(map(jnp.asarray, (x4, ws4, ef4[perm4], we4, off4, ove4)))


def _f_xla4(x_):
    op = (x_ @ jnp.asarray(ws4))[jnp.asarray(send4)] \
        + jnp.asarray(ef4) @ jnp.asarray(we4)
    m = jnp.where(jnp.asarray(mask4)[:, None], op, -3.0e38)
    inner = jax.ops.segment_max(m, jnp.asarray(recv4), num_segments=n4)
    has = inner > -1.5e38
    return jnp.where(has, jnp.asarray(off4) + inner, 0.0)


gx_ref4 = np.asarray(jax.grad(lambda x_: _f_xla4(x_).sum())(jnp.asarray(x4)))
fused4 = make_fused_hoisted_aggregate_v3(n4, nb4, te4, wb4,
                                         interpret=False)
gx4 = np.asarray(jax.grad(lambda *a: fused4(*a, *consts4).sum(),
                          argnums=0)(*args4))
ratio = np.abs(gx4).sum() / np.abs(gx_ref4).sum()
print("v3 strict x-grad magnitude ratio vs XLA:", round(float(ratio), 4))
assert 0.97 < ratio < 1.03, "strict routing is dropping max-gradients"
print("PALLAS STRICT-ROUTING TPU OK")
