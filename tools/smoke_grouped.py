"""Dev smoke: grouped executor logits/predwd vs the scan-path interpreter."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.nets import grouped as grp
from ghn3_tpu.parallel.meta_executor import build_interp_batch
from ghn3_tpu.predict import forward_embeddings

cfg = GHNConfig(hid=32, heads=4, layers=2, max_shape=(16, 16, 8, 8), num_classes=10)
params = init_ghn_params(jax.random.PRNGKey(0), cfg)

genos = [
    Genotype(normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1),
                     ('conv_5x5', 0), ('skip_connect', 2)],
             normal_concat=[2, 3],
             reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1),
                     ('skip_connect', 0), ('none', 2)],
             reduce_concat=[2, 3]),
    Genotype(normal=[('conv_3x3', 0), ('sep_conv_5x5', 1),
                     ('dil_conv_5x5', 1), ('avg_pool_3x3', 0)],
             normal_concat=[2, 3],
             reduce=[('skip_connect', 1), ('max_pool_3x3', 0),
                     ('conv_1x1', 2), ('sep_conv_3x3', 1)],
             reduce_concat=[2, 3]),
    Genotype(normal=[('cse', 0), ('conv2_5x5', 1),
                     ('skip_connect', 1), ('conv_3x3', 0)],
             normal_concat=[2, 3],
             reduce=[('conv_5x5', 0), ('none', 1),
                     ('dil_conv_3x3', 2), ('avg_pool_3x3', 0)],
             reduce_concat=[2, 3]),
]
widths = [16, 24, 32]

graphs = []
for geno, c in zip(genos, widths):
    net_args = dict(genotype=geno, C=c, n_cells=4, ks=3, preproc=True, C_mult=2,
                    fc_layers=1, fc_dim=0, stem_type=0, stem_pool=False,
                    norm='bn', glob_avg=True, imagenet_stride=4)
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    g = net.graph_def()
    g.net_args = dict(net_args)
    graphs.append(g)

vocab = itp.vocab_from_genotypes(genos)
print('vocab:', vocab)
ib = build_interp_batch(cfg, graphs, num_classes=10, is_imagenet_input=False,
                        vocab=vocab)
print('bucket:', ib.bucket)
assert grp.grouped_supported(ib.bucket)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(4, 3, 32, 32)).astype(np.float32))

x = forward_embeddings(params, cfg, ib.batch, ib.shape_ind)
x = x.reshape(len(ib.batch), ib.batch.n_pad, -1)
arch_j = jax.tree.map(jnp.asarray, ib.arch)

# oracle: scan-path interpreter per net
logits_ref, pw_ref = [], []
for i in range(len(graphs)):
    a_i = jax.tree.map(lambda v: v[i], arch_j)
    lg, pw = itp.interpret_forward(params, cfg, ib.bucket, x[i], a_i, images)
    logits_ref.append(lg)
    pw_ref.append(pw)
logits_ref = jnp.stack(logits_ref)
pw_ref = jnp.stack(pw_ref)

logits_g, pw_g = grp.grouped_forward(params, cfg, ib.bucket, x, arch_j, images)

d = float(jnp.abs(logits_ref - logits_g).max())
dp = float(jnp.abs(pw_ref - pw_g).max())
rel = float((jnp.abs(pw_ref - pw_g) / jnp.abs(pw_ref)).max())
print('logits max abs diff:', d)
print('predwd max abs diff:', dp, 'rel:', rel)
print('ref[0,0,:5]:', np.asarray(logits_ref)[0, 0, :5])
print('grp[0,0,:5]:', np.asarray(logits_g)[0, 0, :5])
assert d < 1e-4, d
assert rel < 1e-5, (dp, rel)
print('OK')
