import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
from xrdslam_tpu.common.camera import Camera

cam = Camera(fx=300., fy=300., cx=300., cy=170., height=340, width=600)
bb = np.array([[-3.,3.]]*3, np.float32)
model = JointEncoding(JointEncodingConfig(encoding="triplane"), cam, bb)
params = model.init_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
N_RAYS = 4096
rays_o = jnp.asarray(rng.uniform(-1,1,(N_RAYS,3)).astype(np.float32))
d = rng.normal(size=(N_RAYS,3)).astype(np.float32)
rays_d = jnp.asarray(d/np.linalg.norm(d,axis=-1,keepdims=True))
td = jnp.asarray(rng.uniform(0.5,3.,(N_RAYS,1)).astype(np.float32))
ts = jnp.asarray(rng.uniform(0,1,(N_RAYS,3)).astype(np.float32))
rm = jnp.ones((N_RAYS,), jnp.float32)

@jax.jit
def step(p, k):
    def lf(pp):
        l, _ = model.get_loss(pp, k, rays_o, rays_d, ts, td, rm, True, False)
        return l
    return jax.grad(lf)(p)

r = step(params, jax.random.PRNGKey(0))
jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
jax.profiler.start_trace("/tmp/jax_trace_map")
for _ in range(3):
    r = step(params, jax.random.PRNGKey(0))
_ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
jax.profiler.stop_trace()
print("trace done", flush=True)
