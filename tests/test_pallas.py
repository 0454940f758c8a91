"""Pallas kernels vs. jnp references (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radargnn_tpu.ops.pallas_kernels import (
    fused_linear, fused_linear_reference,
    fused_message_segment_max, fused_message_segment_max_reference,
    prepare_csr_tiles,
)


def test_fused_linear_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    for relu in (False, True):
        got = fused_linear(x, w, b, relu=relu, tile=256)
        expect = fused_linear_reference(x, w, b, relu=relu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)


def _run_fused_segmax(rng, e, n, din, h, mask_frac=0.85, node_block=32,
                      edge_tile=32, total_tiles=None):
    m_in = rng.normal(size=(e, din)).astype(np.float32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < mask_frac
    w = rng.normal(size=(din, h)).astype(np.float32) * 0.1
    b = rng.normal(size=(h,)).astype(np.float32)

    perm, tile_blocks, padded_recv = prepare_csr_tiles(
        receivers, mask, n, node_block, edge_tile, total_tiles)
    m_in_p = m_in[perm]

    got = fused_message_segment_max(
        jnp.asarray(m_in_p), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(padded_recv), jnp.asarray(tile_blocks),
        num_nodes=n, node_block=node_block, edge_tile=edge_tile)
    expect = fused_message_segment_max_reference(
        jnp.asarray(m_in), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(receivers), jnp.asarray(mask), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_fused_message_segment_max_matches_reference():
    rng = np.random.default_rng(1)
    _run_fused_segmax(rng, e=600, n=100, din=24, h=40)


def test_fused_message_segment_max_empty_blocks():
    """Nodes with no incoming edges (whole empty node blocks) give 0."""
    rng = np.random.default_rng(2)
    e, n = 120, 128
    m_in = rng.normal(size=(e, 8)).astype(np.float32)
    receivers = rng.integers(0, 30, e).astype(np.int32)  # only first block
    mask = np.ones(e, bool)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    b = np.zeros(16, np.float32)

    perm, tile_blocks, padded_recv = prepare_csr_tiles(receivers, mask, n, 32, 32)
    got = fused_message_segment_max(
        jnp.asarray(m_in[perm]), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(padded_recv),
        jnp.asarray(tile_blocks), num_nodes=n, node_block=32, edge_tile=32)
    assert np.allclose(np.asarray(got)[32:], 0.0)
    expect = fused_message_segment_max_reference(
        jnp.asarray(m_in), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(receivers), jnp.asarray(mask), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_fused_message_segment_max_static_tile_budget():
    rng = np.random.default_rng(3)
    _run_fused_segmax(rng, e=300, n=64, din=16, h=24, total_tiles=40)


def test_prepare_csr_tiles_budget_exceeded():
    with pytest.raises(ValueError):
        prepare_csr_tiles(np.zeros(100, np.int32), np.ones(100, bool),
                          num_nodes=16, node_block=8, edge_tile=8,
                          total_tiles=2)


def test_fused_segmax_all_negative_messages():
    """Negative maxima must survive (no clamping at 0)."""
    n, e = 8, 16
    m_in = -np.ones((e, 4), np.float32)
    receivers = np.repeat(np.arange(4), 4).astype(np.int32)
    mask = np.ones(e, bool)
    w = np.eye(4, dtype=np.float32)
    b = np.zeros(4, np.float32)
    perm, tb, padded_recv = prepare_csr_tiles(receivers, mask, n, 8, 8)
    got = fused_message_segment_max(
        jnp.asarray(m_in[perm]), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(padded_recv), jnp.asarray(tb),
        num_nodes=n, node_block=8, edge_tile=8)
    np.testing.assert_allclose(np.asarray(got)[:4], -1.0)
    np.testing.assert_allclose(np.asarray(got)[4:], 0.0)


def test_fused_hoisted_aggregate_forward_and_grad():
    """Model-integration op: pallas forward matches the XLA hoisted max;
    custom-VJP gradients match jax.grad of the XLA formulation."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate, prepare_csr_tiles,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    rng = np.random.default_rng(9)
    n, e, de, h = 96, 500, 8, 32
    node_block, edge_tile = 32, 32

    y_s = rng.normal(size=(n, h)).astype(np.float32)
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    b = rng.normal(size=(h,)).astype(np.float32)
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    perm, tile_blocks, padded_recv = prepare_csr_tiles(
        receivers, mask, n, node_block, edge_tile)
    senders_t = senders[perm]
    e_t = e_feat[perm]

    fused = make_fused_hoisted_aggregate(n, node_block, edge_tile)

    def f_pallas(y_s_, e_t_, w_e_, b_, offset_):
        out = fused(y_s_, e_t_, w_e_, b_, jnp.asarray(senders_t),
                    jnp.asarray(padded_recv), jnp.asarray(tile_blocks),
                    offset_)
        return out

    def f_xla(y_s_, e_feat_, w_e_, b_, offset_):
        operand = y_s_[jnp.asarray(senders)] + e_feat_ @ w_e_
        return hoisted_segment_max(operand + b_ - b_ + 0.0,
                                   jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False,
                                   offset_ + b_)

    args_p = tuple(map(jnp.asarray, (y_s, e_t, w_e, b, offset)))
    args_x = tuple(map(jnp.asarray, (y_s, e_feat, w_e, b, offset)))

    out_p = f_pallas(*args_p)
    out_x = f_xla(*args_x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)

    # gradients (scalar loss)
    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 2, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(),
                   argnums=(0, 2, 3, 4))(*args_x)
    names = ("y_s", "w_e", "b", "offset")
    for nm, a, bb_ in zip(names, g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_detnet_fused_aggregation_matches_default():
    """Full model + trainer step with use_fused_aggregation must match the
    XLA path (forward and training losses) on tiled loader batches — for
    both the v2 CSR tiling and the v3 Morton-windowed tiling."""
    import jax

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.models.layers import FUSED_EDGE_TILE, FUSED_NODE_BLOCK
    from radargnn_tpu.train.trainer import Trainer, set_seeds

    samples = make_samples(num_frames=4, num_points=100, seed=0)
    losses = {}
    for fused in (False, True, "windowed"):
        arch = GNNArchitectureConfig(
            node_feature_dimension=samples[0].node_feat.shape[1],
            edge_feature_dimension=2, conv_layer_dimensions=[16, 16],
            classification_head_layer_dimensions=[6],
            regression_head_layer_dimensions=[5],
            initial_node_feature_embedding=True,
            initial_edge_feature_embedding=True,
            node_feature_embedding_layer_dimensions=[16],
            edge_feature_embedding_layer_dimensions=[8],
            batch_norm_in_mlps=False, assume_sorted_edges=True,
            use_fused_aggregation=bool(fused))
        tcfg = TrainingConfig(
            dataset="radarscenes", learning_rate=1e-3, epochs=2, batch_size=2,
            shuffle=False, bg_index=5, adapt_orientation_angle=True,
            deterministic=True, seed=3)
        key = set_seeds(3)
        if fused == "windowed":
            # small blocks so 100-node graphs tile; dense tiny graphs
            # overflow a lot, so give the overflow path a big budget
            tiling = (32, 32, 2, 0.5)
        elif fused:
            tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
        else:
            tiling = None
        tr = GraphDataLoader(samples[:2], 2, False, 5, seed=1,
                             csr_tiling=tiling)
        va = GraphDataLoader(samples[2:], 2, False, 5, seed=1,
                             max_nodes=tr.max_nodes, max_edges=tr.max_edges,
                             csr_tiling=tiling)
        batch = next(iter(tr))
        model, variables = create_detnet_state(arch, key, batch)
        trainer = Trainer(tcfg, model, variables)
        trainer.fit({"train": tr, "validate": va}, verbose=False)
        losses[fused] = (trainer.train_loss, trainer.valid_loss)

    np.testing.assert_allclose(losses[True][0], losses[False][0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses[True][1], losses[False][1],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses["windowed"][0], losses[False][0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses["windowed"][1], losses[False][1],
                               rtol=1e-3, atol=1e-4)


def test_fused_hoisted_aggregate_pallas_bwd_matches():
    """Pallas-backward variant: gradients match the XLA formulation."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_pallas_bwd, prepare_csr_tiles,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    rng = np.random.default_rng(11)
    n, e, de, h = 96, 500, 8, 32
    node_block, edge_tile = 32, 32

    y_s = rng.normal(size=(n, h)).astype(np.float32)
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    b = rng.normal(size=(h,)).astype(np.float32)
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    perm, tile_blocks, padded_recv = prepare_csr_tiles(
        receivers, mask, n, node_block, edge_tile)
    senders_t = senders[perm]
    e_t = e_feat[perm]

    fused = make_fused_hoisted_aggregate_pallas_bwd(n, node_block, edge_tile)

    def f_pallas(y_s_, e_t_, w_e_, b_, offset_):
        return fused(y_s_, e_t_, w_e_, b_, jnp.asarray(senders_t),
                     jnp.asarray(padded_recv), jnp.asarray(tile_blocks),
                     offset_)

    def f_xla(y_s_, e_feat_, w_e_, b_, offset_):
        operand = y_s_[jnp.asarray(senders)] + e_feat_ @ w_e_ + b_
        return hoisted_segment_max(operand, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, offset_ + b_ * 0)

    args_p = tuple(map(jnp.asarray, (y_s, e_t, w_e, b, offset)))
    args_x = tuple(map(jnp.asarray, (y_s, e_feat, w_e, b, offset)))

    # note: XLA puts b inside the max operand; fused puts it inside the
    # kernel too — same math
    out_p = f_pallas(*args_p)
    # adapt: XLA formulation with b inside operand and offset separate
    def f_xla2(y_s_, e_feat_, w_e_, b_, offset_):
        operand = y_s_[jnp.asarray(senders)] + e_feat_ @ w_e_ + b_
        return hoisted_segment_max(operand, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, offset_)
    out_x = f_xla2(*args_x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)

    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 2, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_xla2(*a) ** 2).sum(),
                   argnums=(0, 2, 3, 4))(*args_x)
    for nm, a, bb_ in zip(("y_s", "w_e", "b", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)

    # e gradient: map tiled cotangent back through the perm gather
    ge_p = jax.grad(lambda et: (f_pallas(args_p[0], et, *args_p[2:]) ** 2)
                    .sum())(args_p[1])
    ge_x = jax.grad(lambda ef: (f_xla2(args_x[0], ef, *args_x[2:]) ** 2)
                    .sum())(args_x[1])
    ge_p_scattered = np.zeros_like(e_feat)
    np.add.at(ge_p_scattered, perm, np.asarray(ge_p))
    # dummy slots map to edge 0 with zero cotangent, so scatter matches
    np.testing.assert_allclose(ge_p_scattered, np.asarray(ge_x),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("use_ssum", [False, True])
def test_fused_hoisted_aggregate_v2_matches(use_ssum):
    """v2 (sender projection in-kernel, one-directional scan, bf16 d_xg):
    forward and all gradients match the XLA formulation — with and without
    the sender-sorted Pallas segment-sum backward."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v2, prepare_csr_tiles, tile_roll_passes,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    rng = np.random.default_rng(13)
    n, e, d_in, de, h = 96, 500, 24, 8, 32
    node_block, edge_tile = 32, 32

    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = rng.normal(size=(d_in, h)).astype(np.float32) * 0.3
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    perm, tile_blocks, padded_recv = prepare_csr_tiles(
        receivers, mask, n, node_block, edge_tile)
    senders_t = senders[perm]
    e_t = e_feat[perm]
    if use_ssum:
        s_perm, s_blocks, s_padded = prepare_csr_tiles(
            senders_t, padded_recv >= 0, n, node_block, edge_tile)
        ssum = tuple(map(jnp.asarray, (s_perm, s_padded, s_blocks)))
    else:
        ssum = (None, None, None)

    fused = make_fused_hoisted_aggregate_v2(n, node_block, edge_tile)

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_):
        return fused(x_, w_s_, e_t_, w_e_, jnp.asarray(senders_t),
                     jnp.asarray(padded_recv), jnp.asarray(tile_blocks),
                     offset_, *ssum)

    def f_xla(x_, w_s_, e_feat_, w_e_, offset_):
        operand = (x_ @ w_s_)[jnp.asarray(senders)] + e_feat_ @ w_e_
        return hoisted_segment_max(operand, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, offset_)

    args_p = tuple(map(jnp.asarray, (x, w_s, e_t, w_e, offset)))
    args_x = tuple(map(jnp.asarray, (x, w_s, e_feat, w_e, offset)))

    out_p = f_pallas(*args_p)
    out_x = f_xla(*args_x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)

    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, a, bb_ in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)

    ge_p = jax.grad(lambda et: (f_pallas(args_p[0], args_p[1], et,
                                         *args_p[3:]) ** 2).sum())(args_p[2])
    ge_x = jax.grad(lambda ef: (f_xla(args_x[0], args_x[1], ef,
                                      *args_x[3:]) ** 2).sum())(args_x[2])
    ge_p_scattered = np.zeros_like(e_feat)
    np.add.at(ge_p_scattered, perm, np.asarray(ge_p))
    np.testing.assert_allclose(ge_p_scattered, np.asarray(ge_x),
                               rtol=2e-3, atol=2e-3)


def test_pallas_segment_sum_csr_matches_reference():
    """CSR-tiled one-hot-matmul segment sum vs jax.ops.segment_sum."""
    from radargnn_tpu.ops.pallas_kernels import (
        pallas_segment_sum_csr, pallas_segment_sum_csr_reference,
        prepare_csr_tiles,
    )

    rng = np.random.default_rng(17)
    n, e, d = 96, 700, 24
    node_block, edge_tile = 32, 32
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.85

    perm, tile_blocks, padded_seg = prepare_csr_tiles(
        seg, mask, n, node_block, edge_tile)
    got = pallas_segment_sum_csr(
        jnp.asarray(data[perm]), jnp.asarray(padded_seg),
        jnp.asarray(tile_blocks), num_nodes=n, node_block=node_block,
        edge_tile=edge_tile)
    # reference over the ORIGINAL (unsorted) layout
    import jax
    expect = jax.ops.segment_sum(
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(data), 0.0),
        jnp.asarray(seg), num_segments=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)
    # and the padded-layout reference helper agrees too
    expect2 = pallas_segment_sum_csr_reference(
        jnp.asarray(data[perm]), jnp.asarray(padded_seg), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect2),
                               rtol=1e-4, atol=1e-4)


def test_tile_roll_passes():
    from radargnn_tpu.ops.pallas_kernels import tile_roll_passes

    # tile 0: runs of 3,2,3 -> max 3 -> 2 passes; tile 1: single run of 8
    # -> 3 passes; tile 2: all padding -> 0; tile 3: all distinct -> 0
    seg = np.array([5, 5, 5, 6, 6, 7, 7, 7,
                    9, 9, 9, 9, 9, 9, 9, 9,
                    -1, -1, -1, -1, -1, -1, -1, -1,
                    1, 2, 3, 4, 5, 6, 7, -1], np.int32)
    got = tile_roll_passes(seg, edge_tile=8)
    np.testing.assert_array_equal(got, [2, 3, 0, 0])


def test_fused_hoisted_aggregate_v3_windowed_matches():
    """v3 windowed kernels (in-kernel one-hot gather + dx window landing +
    overflow path): forward and all gradients match the XLA formulation.
    Random senders force a large overflow fraction, exercising both paths."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
        window_part_mask,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    rng = np.random.default_rng(23)
    n, e, d_in, de, h = 96, 500, 24, 8, 32
    node_block, edge_tile, wb = 16, 32, 2

    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = rng.normal(size=(d_in, h)).astype(np.float32) * 0.3
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=-(-e // edge_tile) * edge_tile)
    assert (ovf_idx >= 0).sum() > 20, "test should exercise overflow"
    nblocks = -(-n // node_block)
    pmask = window_part_mask(tile_win, nblocks, wb)

    e_t = e_feat[perm]
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, senders[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, receivers[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None],
                     e_feat[np.maximum(ovf_idx, 0)], 0.0).astype(np.float32)

    fused = make_fused_hoisted_aggregate_v3(n, node_block, edge_tile, wb)
    consts = tuple(map(jnp.asarray, (padded_recv, tile_blocks, tile_win,
                                     senders_local, pmask, ovf_s, ovf_r)))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    def f_xla(x_, w_s_, e_feat_, w_e_, offset_):
        operand = (x_ @ w_s_)[jnp.asarray(senders)] + e_feat_ @ w_e_
        return hoisted_segment_max(operand, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, offset_)

    args_p = tuple(map(jnp.asarray, (x, w_s, e_t, w_e, offset, e_ovf)))
    args_x = tuple(map(jnp.asarray, (x, w_s, e_feat, w_e, offset)))

    out_p = f_pallas(*args_p)
    out_x = f_xla(*args_x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)

    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, a, bb_ in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)

    # edge-feature gradient: tile + overflow cotangents scatter back to the
    # original edge layout and must match the XLA e-grad
    ge = jax.grad(lambda et, eo: (f_pallas(args_p[0], args_p[1], et,
                                           args_p[3], args_p[4], eo) ** 2)
                  .sum(), argnums=(0, 1))(args_p[2], args_p[5])
    ge_x = jax.grad(lambda ef: (f_xla(args_x[0], args_x[1], ef,
                                      *args_x[3:]) ** 2).sum())(args_x[2])
    ge_scattered = np.zeros_like(e_feat)
    np.add.at(ge_scattered, perm, np.asarray(ge[0]))
    np.add.at(ge_scattered, np.maximum(ovf_idx, 0),
              np.where(ovf_valid[:, None], np.asarray(ge[1]), 0.0))
    np.testing.assert_allclose(ge_scattered, np.asarray(ge_x),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("run_cap", [1, 2, 4])
def test_fused_hoisted_aggregate_v3_spread_run_cap_matches(run_cap):
    """Spread tiling (run_cap): forward and gradients match the XLA
    formulation with roll_passes = log2(run_cap) — run_cap=1 exercises the
    no-roll-loop landing-only reduction plus a heavy leftover-overflow
    load (capacity per receiver is only tiles*run_cap)."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
        window_part_mask,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    rng = np.random.default_rng(31 + run_cap)
    n, e, d_in, de, h = 96, 500, 24, 8, 32
    node_block, edge_tile, wb = 16, 32, 2

    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = rng.normal(size=(d_in, h)).astype(np.float32) * 0.3
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=-(-e // edge_tile) * edge_tile, run_cap=run_cap)

    # spread invariants: run length <= cap, one run per receiver per tile
    v = padded_recv.reshape(-1, edge_tile)
    for row in v:
        vals = row[row >= 0]
        if not len(vals):
            continue
        runs = np.split(vals, np.flatnonzero(np.diff(vals)) + 1)
        assert max(len(r) for r in runs) <= run_cap
        heads = [r[0] for r in runs]
        assert len(heads) == len(set(heads))

    # edge conservation (tiles + overflow exactly covers the valid edges)
    placed = perm[(padded_recv >= 0)]
    all_e = np.concatenate([placed, ovf_idx[ovf_idx >= 0]])
    assert len(all_e) == len(np.unique(all_e)) == mask.sum()

    nblocks = -(-n // node_block)
    pmask = window_part_mask(tile_win, nblocks, wb)
    e_t = e_feat[perm]
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, senders[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, receivers[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None],
                     e_feat[np.maximum(ovf_idx, 0)], 0.0).astype(np.float32)

    fused = make_fused_hoisted_aggregate_v3(
        n, node_block, edge_tile, wb,
        roll_passes=(run_cap - 1).bit_length())
    consts = tuple(map(jnp.asarray, (padded_recv, tile_blocks, tile_win,
                                     senders_local, pmask, ovf_s, ovf_r)))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    def f_xla(x_, w_s_, e_feat_, w_e_, offset_):
        operand = (x_ @ w_s_)[jnp.asarray(senders)] + e_feat_ @ w_e_
        return hoisted_segment_max(operand, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, offset_)

    args_p = tuple(map(jnp.asarray, (x, w_s, e_t, w_e, offset, e_ovf)))
    args_x = tuple(map(jnp.asarray, (x, w_s, e_feat, w_e, offset)))

    np.testing.assert_allclose(np.asarray(f_pallas(*args_p)),
                               np.asarray(f_xla(*args_x)),
                               rtol=1e-4, atol=1e-4)
    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, a, bb_ in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_prepare_windowed_csr_tiles_partition():
    """Every valid edge lands exactly once in (in-window tiles) or overflow;
    senders_local is consistent; tile_win is monotone."""
    from radargnn_tpu.ops.pallas_kernels import prepare_windowed_csr_tiles

    rng = np.random.default_rng(29)
    n, e = 128, 600
    node_block, edge_tile, wb = 16, 32, 3
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.85

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=e)

    assert np.all(np.diff(tile_win) >= 0)
    valid = padded_recv >= 0
    in_win_edges = perm[valid]
    ovf_edges = ovf_idx[ovf_idx >= 0]
    all_edges = np.concatenate([in_win_edges, ovf_edges])
    assert len(all_edges) == len(set(all_edges.tolist())) == mask.sum()
    # receiver ids survive the permutation
    np.testing.assert_array_equal(padded_recv[valid], receivers[in_win_edges])
    # senders_local maps back to global senders through the tile window
    e_win = np.repeat(tile_win, edge_tile) * node_block
    np.testing.assert_array_equal(
        (senders_local + e_win)[valid], senders[in_win_edges])
    assert senders_local[valid].min() >= 0
    assert senders_local[valid].max() < wb * node_block


def test_morton_order_locality():
    from radargnn_tpu.ops.pallas_kernels import morton_order

    rng = np.random.default_rng(31)
    pos = rng.uniform(0, 80, size=(512, 2))
    perm = morton_order(pos)
    assert sorted(perm.tolist()) == list(range(512))
    # neighbors in sorted order are spatially close on average vs random
    p = pos[perm]
    d_sorted = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
    assert d_sorted < d_rand / 3


def test_windowed_tiling_handles_empty_padding_sample():
    """The loader pads short batches with zero-node samples; the windowed
    (v3) tiling must survive them (morton_order on an empty cloud)."""
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import make_samples

    samples = make_samples(num_frames=3, num_points=100, seed=0)
    ld = GraphDataLoader(samples, 2, False, 5, seed=1,
                         csr_tiling=(32, 32, 2, 0.5))
    batches = list(ld)
    assert len(batches) == 2
    # second batch holds one real + one empty sample
    assert int(np.asarray(batches[1].num_valid_nodes())) == 100
    assert batches[1].win_senders_local is not None


def test_windowed_path_radius_graph_hub_degrees():
    """Radius graphs have unbounded, highly variable in-degree (hubs) —
    the windowed kernels' roll-pass bound and per-tile windows must stay
    exact. Compares the fused windowed model forward+loss against the XLA
    path on radius-built synthetic frames."""
    import dataclasses

    import jax

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import DEFAULT_GRAPH_CONFIG, make_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer, set_seeds

    cfg = dataclasses.replace(
        DEFAULT_GRAPH_CONFIG, graph_construction_algorithm="radius",
        graph_construction_settings={"k": 20, "r": 18.0})
    cfg.__post_init__()
    samples = make_samples(num_frames=2, num_points=150, seed=5,
                           graph_config=cfg)
    deg = max(int(np.bincount(s.receivers, minlength=s.num_nodes).max())
              for s in samples)
    assert deg > 20, f"want hub degrees, got max {deg}"

    losses = {}
    for fused in (False, True):
        arch = GNNArchitectureConfig(
            node_feature_dimension=samples[0].node_feat.shape[1],
            edge_feature_dimension=2, conv_layer_dimensions=[16],
            classification_head_layer_dimensions=[6],
            regression_head_layer_dimensions=[5],
            conv_layer_type="MPNNConv",
            initial_node_feature_embedding=False,
            initial_edge_feature_embedding=False,
            batch_norm_in_mlps=False, assume_sorted_edges=True,
            use_fused_aggregation=fused)
        tcfg = TrainingConfig(
            dataset="radarscenes", learning_rate=1e-3, epochs=1, batch_size=2,
            shuffle=False, bg_index=5, deterministic=True, seed=3)
        key = set_seeds(3)
        tiling = (32, 64, 2, 0.6) if fused else None
        tr = GraphDataLoader(samples, 2, False, 5, seed=1, csr_tiling=tiling)
        va = GraphDataLoader(samples, 2, False, 5, seed=1, csr_tiling=tiling)
        batch = next(iter(tr))
        model, variables = create_detnet_state(arch, key, batch)
        trainer = Trainer(tcfg, model, variables)
        trainer.fit({"train": tr, "validate": va}, verbose=False)
        losses[fused] = (trainer.train_loss, trainer.valid_loss)

    np.testing.assert_allclose(losses[True][0], losses[False][0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses[True][1], losses[False][1],
                               rtol=1e-3, atol=1e-4)


def test_windowed_spread_run_cap_trains_like_xla():
    """End-to-end plumbing of the spread (run_cap) tiling: loader 5-tuple
    csr_tiling -> stack_samples -> FlatTiling.roll_passes ->
    make_fused_hoisted_aggregate_v3 — one Trainer epoch on radius graphs
    (hub in-degrees) matches the XLA path losses. run_cap=1 exercises the
    zero-roll-pass kernel and the leftover-overflow route through the model."""
    import dataclasses

    import jax

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import DEFAULT_GRAPH_CONFIG, make_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer, set_seeds

    cfg = dataclasses.replace(
        DEFAULT_GRAPH_CONFIG, graph_construction_algorithm="radius",
        graph_construction_settings={"k": 20, "r": 18.0})
    cfg.__post_init__()
    samples = make_samples(num_frames=2, num_points=150, seed=5,
                           graph_config=cfg)

    losses = {}
    for tiling in (None, (32, 64, 2, 0.9, 1), (32, 64, 2, 0.7, 4)):
        arch = GNNArchitectureConfig(
            node_feature_dimension=samples[0].node_feat.shape[1],
            edge_feature_dimension=2, conv_layer_dimensions=[16],
            classification_head_layer_dimensions=[6],
            regression_head_layer_dimensions=[5],
            conv_layer_type="MPNNConv",
            initial_node_feature_embedding=False,
            initial_edge_feature_embedding=False,
            batch_norm_in_mlps=False, assume_sorted_edges=True,
            use_fused_aggregation=tiling is not None)
        tcfg = TrainingConfig(
            dataset="radarscenes", learning_rate=1e-3, epochs=1, batch_size=2,
            shuffle=False, bg_index=5, deterministic=True, seed=3)
        key = set_seeds(3)
        tr = GraphDataLoader(samples, 2, False, 5, seed=1, csr_tiling=tiling)
        if tiling is not None:
            assert tr.roll_passes == (tiling[4] - 1).bit_length()
        va = GraphDataLoader(samples, 2, False, 5, seed=1, csr_tiling=tiling)
        batch = next(iter(tr))
        model, variables = create_detnet_state(arch, key, batch)
        trainer = Trainer(tcfg, model, variables)
        trainer.fit({"train": tr, "validate": va}, verbose=False)
        losses[tiling] = (trainer.train_loss, trainer.valid_loss)

    ref = losses[None]
    for tiling, got in losses.items():
        if tiling is None:
            continue
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-3, atol=1e-4)


def test_fused_hoisted_aggregate_v3_bf16_max_semantics():
    """bf16_max (backward-only): the forward stays exact f32; the backward
    gathers bf16(inner) and routes gradients by exact bf16 equality. A
    straight-through jnp reference replicates those semantics precisely, so
    forward AND gradients must match it tightly — including edges tied at
    bf16 resolution sharing the gradient."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
        window_part_mask,
    )

    rng = np.random.default_rng(31)
    n, e, d_in, de, h = 96, 500, 24, 8, 32
    node_block, edge_tile, wb = 16, 32, 2

    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = rng.normal(size=(d_in, h)).astype(np.float32) * 0.3
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=-(-e // edge_tile) * edge_tile)
    assert (ovf_idx >= 0).sum() > 20, "test should exercise overflow"
    nblocks = -(-n // node_block)
    pmask = window_part_mask(tile_win, nblocks, wb)

    e_t = e_feat[perm]
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, senders[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, receivers[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None],
                     e_feat[np.maximum(ovf_idx, 0)], 0.0).astype(np.float32)

    fused = make_fused_hoisted_aggregate_v3(n, node_block, edge_tile, wb,
                                            bf16_max=True)
    consts = tuple(map(jnp.asarray, (padded_recv, tile_blocks, tile_win,
                                     senders_local, pmask, ovf_s, ovf_r)))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    r_j = jnp.asarray(receivers)
    m_j = jnp.asarray(mask)

    def f_ref(x_, w_s_, e_feat_, w_e_, offset_):
        op = (x_ @ w_s_)[jnp.asarray(senders)] + e_feat_ @ w_e_
        neg = jnp.float32(-3.0e38)
        op_m = jnp.where(m_j[:, None], op, neg)
        inner = jax.lax.stop_gradient(
            jax.ops.segment_max(op_m, r_j, num_segments=n))
        inner16 = inner.astype(jnp.bfloat16).astype(jnp.float32)
        # straight-through: forward value = exact f32 max; gradient flows
        # to every edge whose operand bf16-rounds to bf16(inner) (the
        # kernel's backward sel)
        eqm = m_j[:, None] & (op.astype(jnp.bfloat16)
                              == inner16[r_j].astype(jnp.bfloat16))
        flow = jax.ops.segment_sum(
            jnp.where(eqm, op - jax.lax.stop_gradient(op), 0.0), r_j,
            num_segments=n)
        has = inner > neg / 2
        return jnp.where(has, offset_ + inner + flow, 0.0)

    args_p = tuple(map(jnp.asarray, (x, w_s, e_t, w_e, offset, e_ovf)))
    args_x = tuple(map(jnp.asarray, (x, w_s, e_feat, w_e, offset)))

    np.testing.assert_allclose(np.asarray(f_pallas(*args_p)),
                               np.asarray(f_ref(*args_x)),
                               rtol=1e-6, atol=1e-6)

    g_p = jax.grad(lambda *a: (f_pallas(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *a: (f_ref(*a) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, a, bb_ in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=1e-4, atol=1e-4, err_msg=nm)


def test_radarpointgnn_fused_aggregation_matches_default():
    """RadarPointGNNConv through the fused kernels (hoisted bias offset, no
    receiver term) must match its XLA path — v2 CSR and v3 windowed — over
    full training epochs."""
    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.models.layers import FUSED_EDGE_TILE, FUSED_NODE_BLOCK
    from radargnn_tpu.train.trainer import Trainer, set_seeds

    samples = make_samples(num_frames=4, num_points=100, seed=2)
    losses = {}
    for fused in (False, True, "windowed"):
        arch = GNNArchitectureConfig(
            node_feature_dimension=samples[0].node_feat.shape[1],
            edge_feature_dimension=2,
            conv_layer_dimensions=[16, 16],   # forced = emb dim by the layer
            classification_head_layer_dimensions=[6],
            regression_head_layer_dimensions=[5],
            initial_node_feature_embedding=True,
            initial_edge_feature_embedding=True,
            node_feature_embedding_layer_dimensions=[16],
            edge_feature_embedding_layer_dimensions=[8],
            conv_layer_type="RadarPointGNNConv",
            batch_norm_in_mlps=False, assume_sorted_edges=True,
            use_fused_aggregation=bool(fused))
        tcfg = TrainingConfig(
            dataset="radarscenes", learning_rate=1e-3, epochs=2, batch_size=2,
            shuffle=False, bg_index=5, adapt_orientation_angle=True,
            deterministic=True, seed=3)
        key = set_seeds(3)
        if fused == "windowed":
            tiling = (32, 32, 2, 0.5)
        elif fused:
            tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
        else:
            tiling = None
        tr = GraphDataLoader(samples[:2], 2, False, 5, seed=1,
                             csr_tiling=tiling)
        va = GraphDataLoader(samples[2:], 2, False, 5, seed=1,
                             max_nodes=tr.max_nodes, max_edges=tr.max_edges,
                             csr_tiling=tiling)
        batch = next(iter(tr))
        model, variables = create_detnet_state(arch, key, batch)
        trainer = Trainer(tcfg, model, variables)
        trainer.fit({"train": tr, "validate": va}, verbose=False)
        losses[fused] = (trainer.train_loss, trainer.valid_loss)

    for mode in (True, "windowed"):
        np.testing.assert_allclose(losses[mode][0], losses[False][0],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(losses[mode][1], losses[False][1],
                                   rtol=1e-3, atol=1e-4)

def test_default_routing_is_valid_subgradient_on_bf16_tie():
    """VERDICT r2 item 5: two edges into one receiver whose operands are
    EQUAL at bf16 resolution but distinct in f32 (gap above the f32 routing
    tolerance). The default path (bf16_max=False) must route the upstream
    cotangent to the true f32 argmax only — total routed mass exactly 1·g
    (a valid subgradient). The opt-in bf16_max=True path routes the full
    cotangent to BOTH tied edges (2·g) — the documented trade."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
        window_part_mask,
    )

    n, de, h = 16, 1, 8
    node_block, edge_tile, wb = 16, 32, 1
    e = 4
    senders = np.array([0, 1, 2, 3], np.int32)
    receivers = np.array([0, 0, 1, 1], np.int32)
    mask = np.ones(e, bool)
    # operand[edge, :] = e_feat[edge] broadcast over channels (w_e = ones,
    # w_s = 0): edges 0/1 tie at bf16 (1.0 vs 1.001 → both bf16 1.0), edge 0
    # is the strict f32 max; edges 2/3 are far apart (control)
    e_feat = np.array([[1.001], [1.0], [5.0], [2.0]], np.float32)
    x = np.zeros((n, 2), np.float32)
    w_s = np.zeros((2, h), np.float32)
    w_e = np.ones((de, h), np.float32)
    offset = np.zeros((n, h), np.float32)

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=edge_tile)
    pmask = window_part_mask(tile_win, -(-n // node_block), wb)
    e_t = e_feat[perm]
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, senders[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, receivers[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None],
                     e_feat[np.maximum(ovf_idx, 0)], 0.0).astype(np.float32)
    consts = tuple(map(jnp.asarray, (padded_recv, tile_blocks, tile_win,
                                     senders_local, pmask, ovf_s, ovf_r)))

    def routed_mass(bf16_max):
        fused = make_fused_hoisted_aggregate_v3(
            n, node_block, edge_tile, wb, bf16_max=bf16_max)

        def loss(e_t_, e_ovf_):
            out = fused(jnp.asarray(x), jnp.asarray(w_s), e_t_,
                        jnp.asarray(w_e), jnp.asarray(offset), e_ovf_,
                        *consts)
            return out.sum()          # upstream cotangent g = 1 per (n, h)

        g_t, g_o = jax.grad(loss, argnums=(0, 1))(jnp.asarray(e_t),
                                                  jnp.asarray(e_ovf))
        # map tiled/overflow gradient slots back to original edges
        d_edge = np.zeros(e)
        gt = np.asarray(g_t)[:, 0]
        for slot, eid in enumerate(perm):
            if padded_recv[slot] >= 0:
                d_edge[eid] += gt[slot]
        go = np.asarray(g_o)[:, 0]
        for slot, eid in enumerate(np.maximum(ovf_idx, 0)):
            if ovf_valid[slot]:
                d_edge[eid] += go[slot]
        return d_edge

    # default: strict f32 routing — each receiver's mass sums to exactly
    # 1·g = h (one unit per channel), all of it on the f32 argmax
    d = routed_mass(False)
    np.testing.assert_allclose(d, [h, 0.0, h, 0.0], atol=1e-6)

    # opt-in bf16_max: both bf16-tied edges receive the full cotangent
    d16 = routed_mass(True)
    np.testing.assert_allclose(d16, [h, h, h, 0.0], atol=1e-6)

    # and the shipped DEFAULT of the config/layer stack is the strict path
    from radargnn_tpu.configs import GNNArchitectureConfig
    from radargnn_tpu.models.layers import MPNNConv
    assert GNNArchitectureConfig(
        node_feature_dimension=1, edge_feature_dimension=1,
        conv_layer_dimensions=[4], classification_head_layer_dimensions=[2],
        regression_head_layer_dimensions=[2]).fused_bf16_max is False
    assert MPNNConv(out_channels=4).bf16_max is False

@pytest.mark.parametrize("variant", [
    dict(precomp_eq=True),
    dict(bf16_max=True, sender_dx=True),
    dict(bf16_max=True, sender_dx=True, stream_m=True),
    dict(bf16_max=True, sender_dx=True, stream_m=True, precomp_eq=True),
    dict(bf16_max=True, bf16_landing=True),
    dict(bf16_max=True, sender_dx=True, stream_m=True, precomp_eq=True,
         bf16_landing=True),
    dict(bf16_max=True, bf16_landing=True, precomp_land=True),
    dict(precomp_eq=True, precomp_eqT=True),
    dict(bf16_max=True, precomp_eqT=True, sender_dx=True),
    dict(bf16_max=True, sender_dx=True, stream_m=True, precomp_eq=True,
         bf16_landing=True, precomp_land=True),
])
def test_fused_v3_variants_match_reference(variant):
    """The r3 profile-guided kernel variants (precomp_eq / stream_m /
    sender_dx / bf16_landing) must reproduce the baseline kernel's forward
    and gradients. f32-routing variants match tightly; bf16-routing
    variants match the straight-through bf16 reference semantics (same
    harness as test_fused_hoisted_aggregate_v3_bf16_max_semantics)."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v3, prepare_windowed_csr_tiles,
        window_part_mask,
    )

    rng = np.random.default_rng(77)
    n, e, d_in, de, h = 96, 500, 24, 8, 32
    node_block, edge_tile, wb = 16, 32, 2

    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = rng.normal(size=(d_in, h)).astype(np.float32) * 0.3
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.3
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    (perm, tile_blocks, padded_recv, senders_local, tile_win,
     ovf_idx) = prepare_windowed_csr_tiles(
        senders, receivers, mask, n, node_block, edge_tile, wb,
        ovf_budget=-(-e // edge_tile) * edge_tile)
    assert (ovf_idx >= 0).sum() > 20, "test should exercise overflow"
    pmask = window_part_mask(tile_win, -(-n // node_block), wb)
    e_t = e_feat[perm]
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, senders[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, receivers[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None],
                     e_feat[np.maximum(ovf_idx, 0)], 0.0).astype(np.float32)
    consts = tuple(map(jnp.asarray, (padded_recv, tile_blocks, tile_win,
                                     senders_local, pmask, ovf_s, ovf_r)))
    args = tuple(map(jnp.asarray, (x, w_s, e_t, w_e, offset, e_ovf)))

    def run(**kw):
        fused = make_fused_hoisted_aggregate_v3(n, node_block, edge_tile,
                                                wb, **kw)

        def f(*a):
            return fused(*a, *consts)

        out = f(*args)
        grads = jax.grad(lambda *a: (f(*a) ** 2).sum(),
                         argnums=(0, 1, 2, 3, 4, 5))(*args)
        return np.asarray(out), [np.asarray(g) for g in grads]

    base = run(bf16_max=variant.get("bf16_max", False))
    got = run(**variant)

    # forward: exact f32 unless bf16_landing rounds the window maxima
    ftol = 1e-2 if variant.get("bf16_landing") else 1e-6
    np.testing.assert_allclose(got[0], base[0], rtol=ftol, atol=ftol)
    # gradients: identical routing; sender_dx only re-associates sums.
    # bf16_landing changes which edges tie at bf16 resolution for maxima
    # that moved by rounding, so gradient support can differ there — check
    # per-receiver mass instead of elementwise equality.
    names = ("x", "w_s", "e_t", "w_e", "offset", "e_ovf")
    if not variant.get("bf16_landing"):
        for nm, a, b in zip(names, got[1], base[1]):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                       err_msg=nm)
    else:
        # self-consistency: d_offset = g_pass = 2·out under this loss
        np.testing.assert_allclose(got[1][4], 2.0 * got[0], rtol=1e-6,
                                   atol=1e-6, err_msg="offset")

def test_spread_tiler_vectorized_invariants():
    """The vectorized round-robin spread placement (r2 advisor item: the
    per-receiver Python loop was O(receivers×tiles)) must preserve every
    spread-tiling invariant on random graphs — exactly-once coverage
    (tiles + leftover), per-tile per-receiver run length ≤ cap, contiguous
    runs, receivers inside their tile's block. Small random cases also
    exercise the greedy fallback (fill overflow)."""
    from radargnn_tpu.ops.pallas_kernels import prepare_spread_csr_tiles

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(10, 300))
        e = int(rng.integers(1, 2500))
        recv = rng.integers(0, n, e)
        m = rng.random(e) < 0.9
        cap = int(rng.choice([1, 2, 4]))
        nb, te = int(rng.choice([16, 32])), int(rng.choice([32, 64]))
        perm, blocks, precv, left = prepare_spread_csr_tiles(
            recv, m, n, nb, te, cap)
        valid = precv >= 0
        covered = np.concatenate([perm[valid], left])
        assert sorted(covered.tolist()) == \
            sorted(np.flatnonzero(m).tolist()), trial
        assert perm[valid].size == np.unique(perm[valid]).size
        pr = precv.reshape(-1, te)
        for row, blk in zip(pr, blocks):
            vals, counts = np.unique(row[row >= 0], return_counts=True)
            assert (counts <= cap).all(), (trial, cap)
            for v in vals:
                idx = np.flatnonzero(row == v)
                assert idx[-1] - idx[0] + 1 == len(idx), (trial, v)
            assert ((vals // nb) == blk).all()


# ---------------------------------------------------------------------------
# dense fixed-degree (v4) kernels
# ---------------------------------------------------------------------------

def _dense_setup(seed=7, K=7, variable_degree=True):
    """Small graph + dense tiling; variable in-degree exercises the
    over-degree spill path (the reference aggregates at the kNN target
    side, so in-degree is variable — prepare_dense_knn_tiles docstring)."""
    from radargnn_tpu.ops.pallas_kernels import (
        prepare_dense_knn_tiles, window_part_mask,
    )
    rng = np.random.default_rng(seed)
    n, d_in, de, h = 96, 24, 8, 32
    r_tile, node_block, wb = 8, 16, 2
    if variable_degree:
        e = 400
        send = rng.integers(0, 80, e).astype(np.int32)
        recv = rng.integers(0, 80, e).astype(np.int32)
        mask = rng.random(e) < 0.9
    else:
        nv = 80
        recv = np.repeat(np.arange(nv), K).astype(np.int32)
        send = rng.integers(0, nv, nv * K).astype(np.int32)
        e = nv * K
        mask = np.ones(e, bool)
        mask[recv == 3] = ([True, False] * K)[:K]
    x = rng.normal(size=(n, d_in)).astype(np.float32)
    w_s = (rng.normal(size=(d_in, h)) * 0.3).astype(np.float32)
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = (rng.normal(size=(de, h)) * 0.3).astype(np.float32)
    offset = rng.normal(size=(n, h)).astype(np.float32)
    te = r_tile * K
    perm, sloc, tile_win, ovf_idx = prepare_dense_knn_tiles(
        send, recv, mask, n, K, r_tile, node_block, wb,
        ovf_budget=-(-e // te) * te)
    pmask = window_part_mask(tile_win, -(-n // node_block), wb)
    ovf_valid = ovf_idx >= 0
    ovf_s = np.where(ovf_valid, send[np.maximum(ovf_idx, 0)], 0)
    ovf_r = np.where(ovf_valid, recv[np.maximum(ovf_idx, 0)], -1)
    e_ovf = np.where(ovf_valid[:, None], e_feat[np.maximum(ovf_idx, 0)],
                     0.0).astype(np.float32)
    geo = dict(n=n, K=K, r_tile=r_tile, node_block=node_block, wb=wb)
    arrays = dict(x=x, w_s=w_s, e_feat=e_feat, w_e=w_e, offset=offset,
                  send=send, recv=recv, mask=mask, perm=perm, sloc=sloc,
                  tile_win=tile_win, ovf_idx=ovf_idx, pmask=pmask,
                  ovf_s=ovf_s, ovf_r=ovf_r,
                  e_t=e_feat[perm], e_ovf=e_ovf)
    return geo, arrays


@pytest.mark.parametrize("precomp_eq", [True, False])
@pytest.mark.parametrize("variable_degree", [True, False])
def test_fused_dense_aggregate_matches(precomp_eq, variable_degree):
    """v4 dense kernels (static-slice max, per-slice backward routing,
    over-degree spill): forward and all gradients match the XLA
    formulation — for both a true fixed-degree graph and a random
    variable-in-degree graph (spill + window overflow exercised)."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import make_fused_dense_aggregate
    from radargnn_tpu.ops.segment import hoisted_segment_max

    geo, a = _dense_setup(variable_degree=variable_degree)
    assert (a["ovf_idx"] >= 0).sum() > 10, "test should exercise overflow"

    fused = make_fused_dense_aggregate(
        geo["n"], geo["K"], geo["r_tile"], geo["node_block"], geo["wb"],
        precomp_eq=precomp_eq)
    consts = tuple(map(jnp.asarray, (a["tile_win"], a["sloc"], a["pmask"],
                                     a["ovf_s"], a["ovf_r"])))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    def f_xla(x_, w_s_, e_feat_, w_e_, offset_):
        operand = (x_ @ w_s_)[jnp.asarray(a["send"])] + e_feat_ @ w_e_
        return hoisted_segment_max(operand, jnp.asarray(a["recv"]),
                                   geo["n"], jnp.asarray(a["mask"]), False,
                                   offset_)

    args_p = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_t"], a["w_e"],
                                     a["offset"], a["e_ovf"])))
    args_x = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_feat"],
                                     a["w_e"], a["offset"])))
    np.testing.assert_allclose(np.asarray(f_pallas(*args_p)),
                               np.asarray(f_xla(*args_x)),
                               rtol=1e-4, atol=1e-4)
    g_p = jax.grad(lambda *ar: (f_pallas(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *ar: (f_xla(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, u, v in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)
    # edge-feature gradient: slot + overflow cotangents scatter back to the
    # original edge layout and must match the XLA e-grad
    ge = jax.grad(lambda et, eo: (f_pallas(args_p[0], args_p[1], et,
                                           args_p[3], args_p[4], eo) ** 2)
                  .sum(), argnums=(0, 1))(args_p[2], args_p[5])
    ge_x = jax.grad(lambda ef: (f_xla(args_x[0], args_x[1], ef,
                                      *args_x[3:]) ** 2).sum())(args_x[2])
    ge_s = np.zeros_like(a["e_feat"])
    np.add.at(ge_s, a["perm"], np.asarray(ge[0]))
    ovf_valid = a["ovf_idx"] >= 0
    np.add.at(ge_s, np.maximum(a["ovf_idx"], 0),
              np.where(ovf_valid[:, None], np.asarray(ge[1]), 0.0))
    np.testing.assert_allclose(ge_s, np.asarray(ge_x), rtol=2e-3, atol=2e-3)


def test_fused_dense_aggregate_bf16_max_semantics():
    """v4 dense kernels under bf16_max routing match the straight-through
    bf16-equality reference (same semantics as the v3 bf16_max test)."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import make_fused_dense_aggregate

    geo, a = _dense_setup(variable_degree=True)
    fused = make_fused_dense_aggregate(
        geo["n"], geo["K"], geo["r_tile"], geo["node_block"], geo["wb"],
        bf16_max=True)
    consts = tuple(map(jnp.asarray, (a["tile_win"], a["sloc"], a["pmask"],
                                     a["ovf_s"], a["ovf_r"])))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    r_j = jnp.asarray(a["recv"])
    m_j = jnp.asarray(a["mask"])

    def f_ref(x_, w_s_, e_feat_, w_e_, offset_):
        op = (x_ @ w_s_)[jnp.asarray(a["send"])] + e_feat_ @ w_e_
        neg = jnp.float32(-3.0e38)
        op_m = jnp.where(m_j[:, None], op, neg)
        inner = jax.lax.stop_gradient(
            jax.ops.segment_max(op_m, r_j, num_segments=geo["n"]))
        inner16 = inner.astype(jnp.bfloat16).astype(jnp.float32)
        eqm = m_j[:, None] & (op.astype(jnp.bfloat16)
                              == inner16[r_j].astype(jnp.bfloat16))
        flow = jax.ops.segment_sum(
            jnp.where(eqm, op - jax.lax.stop_gradient(op), 0.0), r_j,
            num_segments=geo["n"])
        has = inner > neg / 2
        return jnp.where(has, offset_ + inner + flow, 0.0)

    args_p = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_t"], a["w_e"],
                                     a["offset"], a["e_ovf"])))
    args_x = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_feat"],
                                     a["w_e"], a["offset"])))
    np.testing.assert_allclose(np.asarray(f_pallas(*args_p)),
                               np.asarray(f_ref(*args_x)),
                               rtol=1e-6, atol=1e-6)
    g_p = jax.grad(lambda *ar: (f_pallas(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *ar: (f_ref(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, u, v in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-4, err_msg=nm)


def test_detnet_dense_tiling_matches_xla_train_steps():
    """DetNet with fused_tiling='dense' (loader dict tiling) trains
    bit-comparably to the XLA path over two full train steps — the
    end-to-end plumbing check (loader -> GraphBatch geometry ->
    flat_tiling -> layers dispatch -> kernels -> trainer)."""
    import dataclasses

    import jax

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer

    k = 20
    samples = make_samples(num_frames=2, num_points=200, seed=0)
    arch = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[32, 32],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[8, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[16, 24],
        edge_feature_embedding_layer_dimensions=[4, 8],
        conv_layer_type="MPNNConv", batch_norm_in_mlps=False,
        compute_dtype="float32", assume_sorted_edges=True,
        use_fused_aggregation=True, fused_tiling="dense")
    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=1e-3, epochs=1, batch_size=2,
        shuffle=False, bg_index=5, bb_loss_weight=0.5,
        regularization_strength=0.0, adapt_orientation_angle=True)

    dense = {"mode": "dense", "node_block": 64, "r_tile": 16, "k": k + 4,
             "window_blocks": 3, "ovf_frac": 0.3}
    b_dense = stack_samples(samples, max_nodes=256, bg_index=5,
                            max_edges=256 * k, csr_tiling=dense)
    b_xla = stack_samples(samples, max_nodes=256, bg_index=5,
                          max_edges=256 * k)
    arch_x = dataclasses.replace(arch, use_fused_aggregation=False)

    model_d, var_d = create_detnet_state(arch, jax.random.key(0), b_dense)
    model_x, var_x = create_detnet_state(arch_x, jax.random.key(0), b_xla)
    td = Trainer(tcfg, model_d, var_d)
    tx = Trainer(tcfg, model_x, var_x)
    td.state = td.state.replace(params=tx.state.params,
                                batch_stats=tx.state.batch_stats)

    sd, ld = td.train_step_fn(td.state, b_dense)
    sx, lx = tx.train_step_fn(tx.state, b_xla)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lx),
                               rtol=1e-4, atol=1e-5)
    _, ld2 = td.train_step_fn(sd, b_dense)
    _, lx2 = tx.train_step_fn(sx, b_xla)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(lx2),
                               rtol=1e-3, atol=1e-4)


def test_unsorted_overflow_trips_sorted_contract_guard():
    """The sorted-overflow contract is untestable-on-CPU at the kernel level
    (XLA treats indices_are_sorted as a hint off-chip), so the host guard
    must catch unsorted overflow receivers eagerly — for the dense (v4)
    family (always sorted-lowered) and the windowed (v3) family unless
    built with the halo path's ovf_sorted=False opt-out."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import (
        check_overflow_sorted, make_fused_dense_aggregate,
    )

    geo, a = _dense_setup()
    fused = make_fused_dense_aggregate(
        geo["n"], geo["K"], geo["r_tile"], geo["node_block"], geo["wb"])
    # swap two valid overflow receivers out of order
    ovf_r = np.array(a["ovf_r"])
    valid = np.flatnonzero(ovf_r >= 0)
    assert len(valid) >= 2
    lo, hi = valid[0], valid[-1]
    assert ovf_r[lo] <= ovf_r[hi]
    ovf_r[lo], ovf_r[hi] = ovf_r[hi] + 1, ovf_r[lo]
    args = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_t"], a["w_e"],
                                   a["offset"], a["e_ovf"], a["tile_win"],
                                   a["sloc"], a["pmask"], a["ovf_s"],
                                   ovf_r)))
    with pytest.raises(ValueError, match="non-decreasing"):
        fused(*args)
    # gradient entry point guards too
    with pytest.raises(ValueError, match="non-decreasing"):
        jax.grad(lambda x_: fused(x_, *args[1:]).sum())(args[0])
    # sorted input passes the guard (identity sanity)
    check_overflow_sorted(np.asarray(a["ovf_r"]), "test")


def _ossum_setup(geo, a, te_o=16):
    """Host sender-sorted CSR tiling of the overflow slots (r5 ossum)."""
    from radargnn_tpu.ops.pallas_kernels import prepare_csr_tiles

    n, nb = geo["n"], geo["node_block"]
    ovf_valid = a["ovf_idx"] >= 0
    total_o = -(-len(a["ovf_idx"]) // te_o) + n // nb
    s_perm, s_blocks, s_send = prepare_csr_tiles(
        a["ovf_s"], ovf_valid, n, nb, te_o, total_o)
    return (s_perm, s_send, s_blocks), te_o


@pytest.mark.parametrize("variable_degree", [True, False])
def test_fused_dense_ovf_ssum_matches(variable_degree):
    """r5 sender-sorted overflow d_x landing (pallas_segment_sum_csr
    replacing XLA scatter-add) must match the XLA formulation — forward
    and all gradients."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import make_fused_dense_aggregate
    from radargnn_tpu.ops.segment import hoisted_segment_max

    geo, a = _dense_setup(variable_degree=variable_degree)
    assert (a["ovf_idx"] >= 0).sum() > 10
    ossum, te_o = _ossum_setup(geo, a)

    fused = make_fused_dense_aggregate(
        geo["n"], geo["K"], geo["r_tile"], geo["node_block"], geo["wb"],
        ovf_ssum=True, ovf_edge_tile=te_o)
    consts = tuple(map(jnp.asarray, (a["tile_win"], a["sloc"], a["pmask"],
                                     a["ovf_s"], a["ovf_r"]) + ossum))

    def f_pallas(x_, w_s_, e_t_, w_e_, offset_, e_ovf_):
        return fused(x_, w_s_, e_t_, w_e_, offset_, e_ovf_, *consts)

    def f_xla(x_, w_s_, e_feat_, w_e_, offset_):
        operand = (x_ @ w_s_)[jnp.asarray(a["send"])] + e_feat_ @ w_e_
        return hoisted_segment_max(operand, jnp.asarray(a["recv"]),
                                   geo["n"], jnp.asarray(a["mask"]), False,
                                   offset_)

    args_p = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_t"], a["w_e"],
                                     a["offset"], a["e_ovf"])))
    args_x = tuple(map(jnp.asarray, (a["x"], a["w_s"], a["e_feat"],
                                     a["w_e"], a["offset"])))
    got = np.asarray(f_pallas(*args_p))
    want = np.asarray(f_xla(*args_x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    g_p = jax.grad(lambda *ar: (f_pallas(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_p)
    g_x = jax.grad(lambda *ar: (f_xla(*ar) ** 2).sum(),
                   argnums=(0, 1, 3, 4))(*args_x)
    for nm, p_, x_ in zip(("x", "w_s", "w_e", "offset"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(p_), np.asarray(x_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_exact_split_decomposition_property():
    """The 3-part bf16 split underlying _exact_sel_dot must recombine to
    the EXACT f32 input (docs/KERNELS.md r5): h1+h2+h3 == d for arbitrary
    f32 values, including pathological rounding cases. This is the host
    half of the exactness argument; the on-chip x-grad pin
    (benchmarks/pallas_check.py) is the device half."""
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        (rng.normal(size=4096) * 10.0 ** rng.integers(-20, 20, 4096)
         ).astype(np.float32),
        # mantissa-dense values near power-of-two boundaries (carry cases)
        np.nextafter(np.float32(1.0), np.float32(2.0)) * np.float32(1.0)
        + np.linspace(0, 1e-6, 64, dtype=np.float32),
        np.float32(2.0) - np.linspace(0, 1e-6, 64, dtype=np.float32),
    ])
    d = jnp.asarray(vals)
    h1 = d.astype(jnp.bfloat16)
    r1 = d - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    # the EXACT order (what _exact_sel_dot uses): h2+h3 = r1 exactly,
    # then h1 + r1 = d exactly
    recon = h1.astype(jnp.float32) + (h2.astype(jnp.float32)
                                      + h3.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(recon), vals)


def test_dense_xla_fallback_matches(monkeypatch):
    """_dense_xla_hoisted_max (the RADARGNN_FUSED_DENSE_XLA_MAX_WIDTH
    narrow-layer fallback, measured -31% and default-off) must stay in
    parity with the XLA formulation — forward and gradients — so the
    env knob cannot silently corrupt results if the slot-layout contract
    ever changes."""
    import dataclasses

    import jax

    from radargnn_tpu.data.synthetic import make_samples, DEFAULT_GRAPH_CONFIG
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.layers import (
        _dense_xla_hoisted_max,
    )
    from radargnn_tpu.ops.segment import hoisted_segment_max

    k = 5
    cfg = dataclasses.replace(
        DEFAULT_GRAPH_CONFIG, graph_construction_settings={"k": k, "r": 1.0})
    cfg.__post_init__()
    samples = make_samples(num_frames=2, num_points=90, seed=3,
                           graph_config=cfg)
    dense = {"mode": "dense", "node_block": 32, "r_tile": 16, "k": k + 3,
             "window_blocks": 2, "ovf_frac": 0.4}
    batch = stack_samples(samples, max_nodes=96, bg_index=5,
                          max_edges=96 * k, csr_tiling=dense)
    tiling = batch.flat_tiling()
    assert tiling is not None and tiling.dense is not None
    r_tile, kk = tiling.dense
    g, n = batch.node_mask.shape
    num_nodes = g * n
    d, h = batch.node_feat.shape[-1], 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, d)).astype(np.float32))
    w_s = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.4)
    de = batch.edge_feat.shape[-1]
    w_e = jnp.asarray(rng.normal(size=(de, h)).astype(np.float32) * 0.4)
    offset = jnp.asarray(rng.normal(size=(num_nodes, h)).astype(np.float32))

    def f_fb(x_, w_s_, w_e_, off_):
        return _dense_xla_hoisted_max(num_nodes, x_, w_s_, w_e_, off_,
                                      tiling, r_tile, kk)

    def f_xla(x_, w_s_, w_e_, off_):
        senders = batch.flat_senders()
        receivers = batch.flat_receivers()
        op = (x_ @ w_s_)[senders] + batch.flat_edges() @ w_e_
        return hoisted_segment_max(op, receivers, num_nodes,
                                   batch.edge_mask.reshape(-1), False, off_)

    args = (x, w_s, w_e, offset)
    np.testing.assert_allclose(np.asarray(f_fb(*args)),
                               np.asarray(f_xla(*args)),
                               rtol=1e-4, atol=1e-4)
    g_f = jax.grad(lambda *a: (f_fb(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(
        *args)
    g_x = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(
        *args)
    for nm, a, b in zip(("x", "w_s", "w_e", "offset"), g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)
