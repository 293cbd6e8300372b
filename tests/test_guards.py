"""Non-finite-gradient guard + in-scan tracking lr decay (round 5).

The reference has no equivalent of either: torch Adam silently propagates a
NaN grad into the moment state (reference optimizer surface:
slam/engine/optimizers.py:40-74), which is exactly the failure mode the
200-frame protocol exposed here (one bad sample batch poisons the grids for
the rest of the run). These tests pin the two defensive layers:

  * ``Algorithm._finite_guard`` zeroes the WHOLE grad tree when the loss or
    any grad leaf is non-finite, and is the identity otherwise.
  * ``tracking_lr_decay`` builds a schedule that holds the configured lr for
    the first half of the per-frame scan and decays exponentially to
    lr*decay at the last iteration (endpoint-jitter control).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrdslam_tpu.algorithms.base import Algorithm


def _tree():
    return {"a": jnp.ones((3, 2)), "b": {"c": jnp.full((4,), 2.0)}}


class TestFiniteGuard:
    def test_identity_on_clean_grads(self):
        g = _tree()
        out = Algorithm._finite_guard(jnp.float32(0.5), g)
        for l0, l1 in zip(jax.tree_util.tree_leaves(g),
                          jax.tree_util.tree_leaves(out)):
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def test_zeroes_on_nonfinite_loss(self):
        for bad in (jnp.nan, jnp.inf, -jnp.inf):
            out = Algorithm._finite_guard(jnp.float32(bad), _tree())
            for leaf in jax.tree_util.tree_leaves(out):
                assert float(jnp.abs(leaf).sum()) == 0.0

    def test_zeroes_on_nonfinite_grad_leaf_even_with_finite_loss(self):
        # the round-5 NICE-SLAM failure mode: loss finite, grads NaN
        # (0/0 branches inside fused VJPs)
        g = _tree()
        g["b"]["c"] = g["b"]["c"].at[1].set(jnp.nan)
        out = Algorithm._finite_guard(jnp.float32(0.1), g)
        for leaf in jax.tree_util.tree_leaves(out):
            assert float(jnp.abs(jnp.nan_to_num(leaf)).sum()) == 0.0
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_jit_and_scan_safe(self):
        # the guard runs inside per-frame lax.scan bodies — must trace
        def body(carry, x):
            g = {"p": x}
            g = Algorithm._finite_guard(x.sum(), g)
            return carry + g["p"].sum(), None

        xs = jnp.stack([jnp.ones(3), jnp.full(3, jnp.nan), jnp.ones(3)])
        total, _ = jax.jit(lambda xs: jax.lax.scan(body, 0.0, xs))(xs)
        assert float(total) == 6.0  # NaN row contributed exactly 0


class TestTrackingLrDecay:
    def _schedule(self, lr0=1e-3, decay=0.05, n_iters=50):
        # mirrors the inline schedule in nice_slam.track_step /
        # voxfusion.track_step
        n = max(n_iters - 1, 1)

        def sched(step):
            frac = jnp.clip(2.0 * step / n - 1.0, 0.0, 1.0)
            return lr0 * decay ** frac

        return sched

    def test_full_lr_first_half(self):
        s = self._schedule()
        for step in (0, 10, 24):
            assert float(s(step)) == pytest.approx(1e-3)

    def test_endpoint_reaches_lr_times_decay(self):
        s = self._schedule()
        assert float(s(49)) == pytest.approx(1e-3 * 0.05, rel=1e-5)

    def test_monotone_decay_second_half(self):
        s = self._schedule()
        vals = [float(s(i)) for i in range(25, 50)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    def test_group_optimizer_applies_schedule(self):
        # GroupOptimizers(schedules=...) must actually shrink the step size
        from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig, GroupOptimizers

        lr0 = 1e-1
        sched = self._schedule(lr0=lr0, decay=1e-3, n_iters=2)
        opt_c = GroupOptimizers({"p": AdamOptimizerConfig(lr=lr0)})
        opt_s = GroupOptimizers({"p": AdamOptimizerConfig(lr=lr0)},
                                schedules={"p": sched})
        params = {"p": jnp.zeros(3)}
        g = {"p": jnp.ones(3)}
        st_c = opt_c.init(params)
        st_s = opt_s.init(params)
        # step 0: schedules agree (full lr)
        p_c, st_c = opt_c.update(g, st_c, params)
        p_s, st_s = opt_s.update(g, st_s, params)
        np.testing.assert_allclose(np.asarray(p_c["p"]), np.asarray(p_s["p"]),
                                   rtol=1e-6)
        # step 1: decayed schedule must take a much smaller step
        p_c2, _ = opt_c.update(g, st_c, p_c)
        p_s2, _ = opt_s.update(g, st_s, p_s)
        d_c = float(jnp.abs(p_c2["p"] - p_c["p"]).max())
        d_s = float(jnp.abs(p_s2["p"] - p_s["p"]).max())
        assert d_s < 0.1 * d_c
