"""Torch-checkpoint converters validated against crafted real checkpoints.

Round-2 item (VERDICT): utils/torch_convert.py had never seen an actual
torch file. torch (CPU) is in-env, so these tests build genuine
``torch.save`` checkpoints with the reference's layer names (DPVO:
slam/model_components/vonet_dpvo.py:18-187 via vo_net_model.py:39-50;
NICE decoders: slam/models/conv_onet.py:293-322) and assert a lossless
round-trip into our param trees.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xrdslam_tpu.utils.torch_convert import (load_dpvo_weights,  # noqa: E402
                                             load_nice_decoders)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


# ------------------------------------------------------------------ DPVO
def _encoder_to_torch(state, prefix, tree):
    def put_conv(name, p):
        state[name + ".weight"] = _t(p["w"])
        state[name + ".bias"] = _t(p["b"])

    put_conv(prefix + ".conv1", tree["conv1"])
    for li, layer in enumerate(("layer1", "layer2")):
        for bi, blk in enumerate(tree[layer]):
            base = f"{prefix}.{layer}.{bi}"
            put_conv(base + ".conv1", blk["conv1"])
            put_conv(base + ".conv2", blk["conv2"])
            if "down" in blk:
                put_conv(base + ".downsample.0", blk["down"])
    put_conv(prefix + ".conv2", tree["conv2"])


def _update_to_torch(state, tree):
    def put(name, p):
        state[name + ".weight"] = _t(p["w"])
        state[name + ".bias"] = _t(p["b"])

    put("update.c1.0", tree["c1"][0])
    put("update.c1.2", tree["c1"][1])
    put("update.c2.0", tree["c2"][0])
    put("update.c2.2", tree["c2"][1])
    put("update.norm", tree["norm"])
    for agg in ("agg_kk", "agg_ij"):
        for leaf in ("f", "g", "h"):
            put(f"update.{agg}.{leaf}", tree[agg][leaf])
    g = tree["gru"]
    put("update.gru.0", g["ln1"])
    put("update.gru.1.gate.0", g["gr1"]["gate"])
    put("update.gru.1.res.0", g["gr1"]["res1"])
    put("update.gru.1.res.2", g["gr1"]["res2"])
    put("update.gru.2", g["ln2"])
    put("update.gru.3.gate.0", g["gr2"]["gate"])
    put("update.gru.3.res.0", g["gr2"]["res1"])
    put("update.gru.3.res.2", g["gr2"]["res2"])
    put("update.corr.0", tree["corr"][0])
    put("update.corr.2", tree["corr"][1])
    put("update.corr.3", tree["corr"][2])
    put("update.corr.5", tree["corr"][3])
    put("update.d.1", tree["d"])
    put("update.w.1", tree["w"])


def test_dpvo_checkpoint_roundtrip(tmp_path):
    """A dpvo.pth-shaped checkpoint (module. prefixes, update.lmbda) loads
    into a tree identical to what VONet initialized."""
    from xrdslam_tpu.models.vonet import VONet, VONetConfig

    net = VONet(VONetConfig(), seed=3)
    state = {}
    _encoder_to_torch(state, "patchify.fnet", net.params["fnet"])
    _encoder_to_torch(state, "patchify.inet", net.params["inet"])
    _update_to_torch(state, net.params["update"])
    # reference checkpoint quirks the loader must absorb
    state = {"module." + k: v for k, v in state.items()}
    state["module.update.lmbda"] = torch.zeros(1)
    path = str(tmp_path / "dpvo.pth")
    torch.save(state, path)

    loaded = load_dpvo_weights(path)
    flat_a, tree_a = jax.tree_util.tree_flatten(net.params)
    flat_b, tree_b = jax.tree_util.tree_flatten(loaded)
    assert tree_a == tree_b, "converted tree structure differs from VONet's"
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_dpvo_converted_weights_drive_the_network(tmp_path):
    """Converted weights must run through the jitted feature extractor."""
    from xrdslam_tpu.models.vonet import VONet, VONetConfig

    net = VONet(VONetConfig(), seed=4)
    state = {}
    _encoder_to_torch(state, "patchify.fnet", net.params["fnet"])
    _encoder_to_torch(state, "patchify.inet", net.params["inet"])
    _update_to_torch(state, net.params["update"])
    path = str(tmp_path / "dpvo.pth")
    torch.save(state, path)
    loaded = load_dpvo_weights(path)

    img = jnp.asarray(np.random.default_rng(0).uniform(
        0.0, 1.0, (3, 64, 64)).astype(np.float32))
    fmap_a = net.extract_features(net.params, img)
    fmap_b = net.extract_features(loaded, img)
    for a, b in zip(jax.tree_util.tree_leaves(fmap_a),
                    jax.tree_util.tree_leaves(fmap_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------- NICE decoders
def _decoder_to_torch(state, prefix, params):
    """Emit torch Linear layout ([out, in]) + gaussian embedder matrix."""
    for i, (w, b) in enumerate(zip(params["pts_w"], params["pts_b"])):
        state[f"{prefix}.pts_linears.{i}.weight"] = _t(np.asarray(w).T)
        state[f"{prefix}.pts_linears.{i}.bias"] = _t(b)
    for i, (w, b) in enumerate(zip(params.get("fc_w", []), params.get("fc_b", []))):
        state[f"{prefix}.fc_c.{i}.weight"] = _t(np.asarray(w).T)
        state[f"{prefix}.fc_c.{i}.bias"] = _t(b)
    state[f"{prefix}.output_linear.weight"] = _t(np.asarray(params["out_w"]).T)
    state[f"{prefix}.output_linear.bias"] = _t(params["out_b"])
    if "B" in params:
        state[f"{prefix}.embedder._B"] = _t(params["B"])


def test_nice_decoder_checkpoint_roundtrip(tmp_path):
    """middle_fine.pt naming quirk: the middle decoder is stored under
    'coarse' (conv_onet.py:305-318). Round-trip + functional parity."""
    from xrdslam_tpu.models.conv_onet import (mlp_decoder_apply,
                                              mlp_decoder_init)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    middle = mlp_decoder_init(k1, c_dim=32)
    fine = mlp_decoder_init(k2, c_dim=32)
    coarse = mlp_decoder_init(k3, c_dim=32)

    state = {}
    _decoder_to_torch(state, "decoder.coarse", middle)   # quirk: middle as 'coarse'
    _decoder_to_torch(state, "decoder.fine", fine)
    state["encoder.ignored.weight"] = torch.zeros(2, 2)  # must be skipped
    mf_path = str(tmp_path / "middle_fine.pt")
    torch.save({"model": state}, mf_path)

    cstate = {}
    _decoder_to_torch(cstate, "decoder.mlp", coarse)
    c_path = str(tmp_path / "coarse.pt")
    torch.save({"model": cstate}, c_path)

    out = load_nice_decoders(mf_path, c_path)
    assert set(out) == {"middle", "fine", "coarse"}
    for name, ref in (("middle", middle), ("fine", fine), ("coarse", coarse)):
        got = out[name]
        for i in range(len(ref["pts_w"])):
            np.testing.assert_allclose(got["pts_w"][i], np.asarray(ref["pts_w"][i]), atol=1e-7)
        np.testing.assert_allclose(got["out_w"], np.asarray(ref["out_w"]), atol=1e-7)
        np.testing.assert_allclose(got["B"], np.asarray(ref["B"]), atol=1e-7)

    # functional parity through the real decoder apply
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    ya = mlp_decoder_apply(middle, p, c)
    yb = mlp_decoder_apply(jax.tree_util.tree_map(jnp.asarray, out["middle"]), p, c)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)
