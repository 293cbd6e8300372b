import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
from xrdslam_tpu.models.joint_encoding import JointEncodingConfig
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
from xrdslam_tpu.common.camera import Camera

opts = {
    "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2), "scheduler": None},
    "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2), "scheduler": None},
    "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
    "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
    "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
    "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
}
cam = Camera(fx=300., fy=300., cx=300., cy=170., height=340, width=600)
cfg = CoSLAMConfig(separate_LR=True, rot_rep="axis_angle", tracking_n_iters=10,
                   mapping_n_iters=10, mapping_sample=2048, tracking_sample=1024,
                   tracking_Wedge=20, tracking_Hedge=20,
                   mapping_bound=[[-3,3]]*3, marching_cubes_bound=[[-3,3]]*3,
                   model=JointEncodingConfig(encoding="triplane"), optimizers=opts)
algo = cfg.setup(camera=cam)
params = algo.model_params
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.uniform(0,1,(340,600,3)).astype(np.float32))
depth = jnp.asarray(rng.uniform(0.5,3,(340,600)).astype(np.float32))
t0 = jnp.zeros(3); r0 = jnp.zeros(3)
k = jax.random.PRNGKey(0)

f = algo._track_step
r = f(params, rgb, depth, t0, r0, k)
jax.block_until_ready(r)
tt = time.perf_counter()
for _ in range(10): r = f(params, rgb, depth, t0, r0, k)
_ = float(r[2])
print(f"real track_step (10 iters): {(time.perf_counter()-tt)/10*1e3:.1f} ms", flush=True)
