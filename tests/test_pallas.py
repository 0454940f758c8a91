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
