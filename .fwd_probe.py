import time, os, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
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
    initial_node_feature_embedding=True, initial_edge_feature_embedding=True,
    node_feature_embedding_layer_dimensions=[32, 64, 128, 224],
    edge_feature_embedding_layer_dimensions=[4, 8, 16],
    conv_layer_type="MPNNConv", batch_norm_in_mlps=False,
    compute_dtype="bfloat16", assume_sorted_edges=True)
tcfg = TrainingConfig(dataset="radarscenes", learning_rate=1e-3, epochs=1,
    batch_size=8, shuffle=False, bg_index=5, bb_loss_weight=0.5,
    adapt_orientation_angle=True)
samples = make_samples(num_frames=8, num_points=2816, seed=0)
batch = stack_samples(samples, max_nodes=2816, bg_index=5, max_edges=2816*20)
model, variables = create_detnet_state(arch, jax.random.key(0), batch)
trainer = Trainer(tcfg, model, variables)
steps = 16
noise = jnp.asarray(np.random.default_rng(1).normal(
    size=(steps, 1, 1, batch.node_feat.shape[-1])).astype(np.float32)*0.01)

@jax.jit
def fwd_scan(state, batch, noise):
    def body(carry, eps):
        b = batch.replace(node_feat=batch.node_feat + eps)
        (logits, bb), _ = trainer._forward(state.params, state.batch_stats, b, True)
        total, l_cls, l_bb = trainer._loss_terms(logits, bb, b, trainer._weights)
        return carry + total, total
    return jax.lax.scan(body, jnp.float32(0), noise)

_, outs = fwd_scan(trainer.state, batch, noise); jax.device_get(outs)
t0 = time.perf_counter()
_, outs = fwd_scan(trainer.state, batch, noise); jax.device_get(outs)
dt = (time.perf_counter()-t0)/steps
print(json.dumps({"metric": "fwd_only_ms", "value": round(dt*1000,1)}))
