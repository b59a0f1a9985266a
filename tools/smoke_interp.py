"""Dev smoke: interpreter logits vs per-arch executor (predict_packed + darts.Network)."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.models.shape_encoder import tables_for
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.predict import build_plan, forward_embeddings, predict_packed

cfg = GHNConfig(hid=32, heads=4, layers=2, max_shape=(16, 16, 8, 8), num_classes=10)
params = init_ghn_params(jax.random.PRNGKey(0), cfg)

geno = Genotype(
    normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1), ('conv_5x5', 0), ('skip_connect', 2)],
    normal_concat=[2, 3],
    reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1), ('skip_connect', 0), ('none', 2)],
    reduce_concat=[2, 3])

net_args = dict(genotype=geno, C=16, n_cells=4, ks=3, preproc=True, C_mult=2,
                fc_layers=1, fc_dim=0, stem_type=0, stem_pool=False, norm='bn',
                glob_avg=True, imagenet_stride=4)

net = Network(num_classes=10, is_imagenet_input=False, **net_args)
graph = net.graph_def()
graph.net_args = dict(net_args)
batch = GraphBatch.from_graphs([graph])
tables = [net.param_table()]

rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(4, 3, 32, 32)).astype(np.float32))

# reference path
packed = predict_packed(params, cfg, batch, tables, sanity_check=True)
logits_ref = net(packed[0], images, training=True)

# interpreter path
bucket, arch = itp.encode_arch(graph, num_classes=10, is_imagenet_input=False, cfg=cfg)
plan = build_plan(batch, tables, cfg)
si = np.tile(np.array(tables_for(cfg).dummy_index, np.int32), (batch.n_pad, 1))
si[:graph.n_nodes] = arch['shape_ind']
assert np.array_equal(si, plan.shape_ind[0]), \
    (np.nonzero((si != plan.shape_ind[0]).any(-1)), si[:8], plan.shape_ind[0][:8])
print('shape_ind matches')

x = forward_embeddings(params, cfg, batch, plan.shape_ind)
x0 = x.reshape(len(batch), batch.n_pad, -1)[0]
arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
logits_int, predwd = itp.interpret_forward(params, cfg, bucket, x0, arch_j, images)

print('ref ', np.asarray(logits_ref)[0, :5])
print('int ', np.asarray(logits_int)[0, :5])
d = float(jnp.abs(logits_ref - logits_int).max())
print('max abs diff:', d)
assert d < 1e-4, d
print('predwd:', float(predwd))
print('OK')
