import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
from xrdslam_tpu.ops.triplane import triplane_encode
from xrdslam_tpu.common.camera import Camera

N_RAYS, N_SAMP = 4096, 43
N = N_RAYS * N_SAMP

def timeit(f, *args, n=20):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n * 1e3

cam = Camera(fx=300.0, fy=300.0, cx=300.0, cy=170.0, height=340, width=600)
bb = np.array([[-3.0, 3.0]] * 3, np.float32)
cfg = JointEncodingConfig(encoding="triplane")
model = JointEncoding(cfg, cam, bb)
params = model.init_params(jax.random.PRNGKey(0))
spec = model.tp_spec
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32))
tab = params["embed_fn"]["table"]

@jax.jit
def fwd(t, p):
    return triplane_encode(t, p, spec)
print(f"TP encode fwd:     {timeit(fwd, tab, pts):8.2f} ms", flush=True)

@jax.jit
def bwd(t, p):
    return jax.grad(lambda tt: jnp.sum(triplane_encode(tt, p, spec) ** 2))(t)
print(f"TP encode fwd+bwd: {timeit(bwd, tab, pts):8.2f} ms", flush=True)

rays_o = jnp.asarray(rng.uniform(-1, 1, (N_RAYS, 3)).astype(np.float32))
d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
target_d = jnp.asarray(rng.uniform(0.5, 3.0, (N_RAYS, 1)).astype(np.float32))
target_s = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
ray_mask = jnp.ones((N_RAYS,), jnp.float32)

@jax.jit
def full(p, k):
    def loss_fn(pp):
        loss, _ = model.get_loss(pp, k, rays_o, rays_d, target_s, target_d, ray_mask, True, False)
        return loss
    return jax.grad(loss_fn)(p)
print(f"TP full map iter:  {timeit(full, params, jax.random.PRNGKey(0), n=10):8.2f} ms", flush=True)

# tracking-style: grads to ray origins only
@jax.jit
def track(ro, k):
    def loss_fn(r):
        loss, _ = model.get_loss(params, k, r[:1024], rays_d[:1024], target_s[:1024], target_d[:1024], ray_mask[:1024], False, False)
        return loss
    return jax.grad(loss_fn)(ro)
print(f"TP track iter(1k): {timeit(track, rays_o, jax.random.PRNGKey(0), n=10):8.2f} ms", flush=True)
