"""Activation parity: DetNet vs. a direct torch re-implementation of the
reference `DetNetBasic` (gnn_models.py + mpnn_layers.py semantics, without
PyG), sharing identical weights.

Covers BASELINE.md config 1 (single-frame, no-invariance, CPU-runnable) and
the flagship translation-invariant architecture: per-layer activations and
final heads must agree to float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from radargnn_tpu.configs import GNNArchitectureConfig
from radargnn_tpu.models.detnet import DetNet


# ----------------------------------------------------------------------
# torch mirror of the reference semantics
# ----------------------------------------------------------------------

def t_linear(p, x):
    return x @ torch.tensor(np.asarray(p["kernel"])) \
        + torch.tensor(np.asarray(p["bias"]))


def t_linear_relu_stack(p, x):
    names = sorted(p.keys(), key=lambda s: int(s.split("_")[1]))
    for i, nm in enumerate(names):
        if i > 0:
            x = torch.relu(x)
        x = t_linear(p[nm], x)
    return x


def t_mlp(p, x, batch_norm=False):
    """get_mlp semantics: lin_0 · ([BN] · ReLU · lin_i)*; our param naming."""
    lin_names = sorted([k for k in p if k.startswith("lin")],
                       key=lambda s: int(s.split("_")[1]))
    bn_names = sorted([k for k in p if k.startswith("bn")],
                      key=lambda s: int(s.split("_")[1]))
    x = t_linear(p[lin_names[0]], x)
    for i, nm in enumerate(lin_names[1:]):
        if batch_norm:
            x = t_batchnorm(p[bn_names[i]], x)
        x = torch.relu(x)
        x = t_linear(p[nm], x)
    return x


def t_batchnorm(p, x, eps=1e-5):
    mean = x.mean(0)
    var = x.var(0, unbiased=False)
    xn = (x - mean) / torch.sqrt(var + eps)
    return xn * torch.tensor(np.asarray(p["scale"])) \
        + torch.tensor(np.asarray(p["bias"]))


def t_scatter_max(m, receivers, n):
    out = torch.zeros((n, m.shape[1]), dtype=m.dtype)
    has = torch.zeros(n, dtype=torch.bool)
    filled = torch.full((n, m.shape[1]), -torch.inf, dtype=m.dtype)
    for i, r in enumerate(receivers):
        filled[r] = torch.maximum(filled[r], m[i])
        has[r] = True
    out[has] = filled[has]
    return out


def t_mpnn_conv(p, x, senders, receivers, e, use_edge_encoder=False):
    if use_edge_encoder:
        e = t_linear(p["edge_encoder"], e)
    m_in = torch.cat([x[receivers], x[senders], e], dim=-1)
    m = t_linear_relu_stack(p["pre_mlp"], m_in)
    agg = t_scatter_max(m, receivers, x.shape[0])
    return t_linear_relu_stack(p["post_mlp"], torch.cat([x, agg], dim=-1))


def t_radar_point_gnn_conv(p, x, senders, receivers, e):
    m_in = torch.cat([x[senders], e], dim=-1)
    m = t_linear_relu_stack(p["pre_mlp"], m_in)
    agg = t_scatter_max(m, receivers, x.shape[0])
    h = t_linear_relu_stack(p["post_mlp"], torch.cat([x, agg], dim=-1))
    return h + x


def t_detnet(params, cfg: GNNArchitectureConfig, x, senders, receivers, e,
             collect=None):
    x = torch.tensor(x)
    e = torch.tensor(e)
    if cfg.initial_node_feature_embedding:
        x = t_mlp(params["node_emb_mlp"], x, cfg.batch_norm_in_mlps)
    if cfg.initial_edge_feature_embedding:
        e = t_mlp(params["edge_emb_mlp"], e, cfg.batch_norm_in_mlps)
    for i in range(len(cfg.conv_layer_dimensions)):
        if cfg.conv_layer_type == "MPNNConv":
            x = t_mpnn_conv(params[f"conv_{i}"], x, senders, receivers, e,
                            cfg.conv_use_edge_encoder)
        else:
            x = t_radar_point_gnn_conv(params[f"conv_{i}"], x, senders,
                                       receivers, e)
        x = t_batchnorm(params[f"bn_{i}"], x)
        x = torch.relu(x)
        if collect is not None:
            collect.append(x.clone())
    cls = t_mlp(params["classification_head"], x, cfg.batch_norm_in_mlps)
    bb = t_mlp(params["regression_head"], x, cfg.batch_norm_in_mlps)
    return cls, bb


# ----------------------------------------------------------------------

def _random_graph(rng, n, k, node_dim, edge_dim):
    from radargnn_tpu.ops import knn_graph
    pos = rng.normal(size=(n, 2)).astype(np.float32) * 10
    s, r, m = knn_graph(jnp.asarray(pos), k)
    x = rng.normal(size=(n, node_dim)).astype(np.float32)
    e = rng.normal(size=(s.shape[0], edge_dim)).astype(np.float32)
    return x, np.asarray(s), np.asarray(r), e


def _run_parity(cfg, n=30, k=4, tol=2e-4):
    rng = np.random.default_rng(0)
    x, s, r, e = _random_graph(rng, n, k, cfg.node_feature_dimension,
                               cfg.edge_feature_dimension)
    model = DetNet(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(e),
                           jnp.asarray(s), jnp.asarray(r), train=False)
    (cls_j, bb_j), _ = model.apply(variables, jnp.asarray(x), jnp.asarray(e),
                                   jnp.asarray(s), jnp.asarray(r),
                                   train=True, mutable=["batch_stats"])
    cls_t, bb_t = t_detnet(variables["params"], cfg, x, s, r, e)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(bb_j), bb_t.numpy(),
                               rtol=tol, atol=tol)


def test_parity_baseline_config1_segmentation():
    """Single-frame no-invariance segmentation model (test_gnn-style config)."""
    cfg = GNNArchitectureConfig(
        node_feature_dimension=4, edge_feature_dimension=2,
        conv_layer_dimensions=[32, 16],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[4],
        batch_norm_in_mlps=False)
    _run_parity(cfg)


def test_parity_flagship_translation_invariant():
    """configuration_radarscenes.yml architecture."""
    cfg = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[224, 224, 128, 64, 32],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[16, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[32, 64, 128, 224],
        edge_feature_embedding_layer_dimensions=[4, 8, 16],
        conv_layer_type="MPNNConv", batch_norm_in_mlps=False)
    _run_parity(cfg, n=60, k=8, tol=1e-3)


def test_parity_radar_point_gnn_conv_model():
    cfg = GNNArchitectureConfig(
        node_feature_dimension=8, edge_feature_dimension=3,
        conv_layer_dimensions=[8, 8],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5],
        conv_layer_type="RadarPointGNNConv", batch_norm_in_mlps=False)
    _run_parity(cfg)


def test_parity_with_batchnorm_in_mlps():
    cfg = GNNArchitectureConfig(
        node_feature_dimension=4, edge_feature_dimension=2,
        conv_layer_dimensions=[16],
        classification_head_layer_dimensions=[8, 6],
        regression_head_layer_dimensions=[8, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[8, 8, 16],
        edge_feature_embedding_layer_dimensions=[4, 4],
        batch_norm_in_mlps=True)
    _run_parity(cfg)


def test_parity_per_layer_activations():
    """Per-layer (post BN+ReLU) activation allclose — the BASELINE.md check."""
    cfg = GNNArchitectureConfig(
        node_feature_dimension=4, edge_feature_dimension=2,
        conv_layer_dimensions=[16, 16, 8],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5],
        batch_norm_in_mlps=False)
    rng = np.random.default_rng(1)
    x, s, r, e = _random_graph(rng, 25, 3, 4, 2)

    model = DetNet(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(e),
                           jnp.asarray(s), jnp.asarray(r), train=False)

    # capture intermediate activations from our model via flax capture
    _, mods = model.apply(variables, jnp.asarray(x), jnp.asarray(e),
                          jnp.asarray(s), jnp.asarray(r), train=True,
                          mutable=["batch_stats", "intermediates"],
                          capture_intermediates=True)

    acts_t = []
    t_detnet(variables["params"], cfg, x, s, r, e, collect=acts_t)

    inter = mods["intermediates"]
    for i in range(len(cfg.conv_layer_dimensions)):
        ours_bn = np.asarray(inter[f"bn_{i}"]["__call__"][0])
        ours = np.maximum(ours_bn, 0)          # BN output + ReLU
        np.testing.assert_allclose(ours, acts_t[i].numpy(),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"layer {i}")
