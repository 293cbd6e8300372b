import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
from xrdslam_tpu.ops.triplane import triplane_encode
from xrdslam_tpu.common.camera import Camera

def timeit(f, *args, n=20):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x,"block_until_ready") else x, r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter()-t0)/n*1e3

cam = Camera(fx=300., fy=300., cx=300., cy=170., height=340, width=600)
bb = np.array([[-3.,3.]]*3, np.float32)
model = JointEncoding(JointEncodingConfig(encoding="triplane"), cam, bb)
params = model.init_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)

for n_r in (1024, 4096):
    rays_o = jnp.asarray(rng.uniform(-1,1,(n_r,3)).astype(np.float32))
    d = rng.normal(size=(n_r,3)).astype(np.float32)
    rays_d = jnp.asarray(d/np.linalg.norm(d,axis=-1,keepdims=True))
    td = jnp.asarray(rng.uniform(0.5,3.,(n_r,1)).astype(np.float32))
    ts = jnp.asarray(rng.uniform(0,1,(n_r,3)).astype(np.float32))
    rm = jnp.ones((n_r,), jnp.float32)

    @jax.jit
    def lossf(p, k, ro=rays_o, rd=rays_d, t1=ts, t2=td, r=rm):
        l, _ = model.get_loss(p, k, ro, rd, t1, t2, r, False, False)
        return l
    print(f"loss fwd {n_r}:   {timeit(lossf, params, jax.random.PRNGKey(0)):7.2f} ms", flush=True)

    @jax.jit
    def trackg(ro, k, rd=rays_d, t1=ts, t2=td, r=rm):
        def lf(x):
            l, _ = model.get_loss(params, k, x, rd, t1, t2, r, False, False)
            return l
        return jax.grad(lf)(ro)
    print(f"track grad {n_r}: {timeit(trackg, rays_o, jax.random.PRNGKey(0)):7.2f} ms", flush=True)

# raw encode at 44k
pts = jnp.asarray(rng.uniform(0.05,0.95,(1024*43,3)).astype(np.float32))
tab = params["embed_fn"]["table"]
@jax.jit
def enc(t, p): return triplane_encode(t, p, model.tp_spec)
print(f"encode 44k:      {timeit(enc, tab, pts):7.2f} ms", flush=True)
