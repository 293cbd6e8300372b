import os, sys, time, glob, gzip, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
from xrdslam_tpu.common.camera import Camera

cam = Camera(fx=300., fy=300., cx=300., cy=170., height=340, width=600)
bb = np.array([[-3.,3.]]*3, np.float32)
model = JointEncoding(JointEncodingConfig(encoding="triplane"), cam, bb)
params = model.init_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
n_r = 1024
rays_o = jnp.asarray(rng.uniform(-1,1,(n_r,3)).astype(np.float32))
d = rng.normal(size=(n_r,3)).astype(np.float32)
rays_d = jnp.asarray(d/np.linalg.norm(d,axis=-1,keepdims=True))
td = jnp.asarray(rng.uniform(0.5,3.,(n_r,1)).astype(np.float32))
ts = jnp.asarray(rng.uniform(0,1,(n_r,3)).astype(np.float32))
rm = jnp.ones((n_r,), jnp.float32)

@jax.jit
def track10(ro, k):
    def body(c, kk):
        def lf(x):
            l, _ = model.get_loss(params, kk, x, rays_d, ts, td, rm, False, False)
            return l
        g = jax.grad(lf)(c)
        return c - 1e-4*g, 0.
    out, _ = jax.lax.scan(body, ro, jax.random.split(k, 10))
    return out

r = track10(rays_o, jax.random.PRNGKey(0)); r.block_until_ready()
t0=time.perf_counter()
for _ in range(5): r = track10(rays_o, jax.random.PRNGKey(0))
_ = float(jnp.sum(r))
print(f"track10 scan: {(time.perf_counter()-t0)/5*1e3:.1f} ms (/10 iters)", flush=True)

jax.profiler.start_trace("/tmp/jax_trace")
r = track10(rays_o, jax.random.PRNGKey(0))
_ = float(jnp.sum(r))
jax.profiler.stop_trace()
print("trace done", flush=True)
