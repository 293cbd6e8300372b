"""Torch checkpoint -> JAX pytree converters for pretrained decoders.

The reference ships pretrained ConvOnet decoders for NICE-SLAM and
Point-SLAM as torch checkpoints (reference: slam/models/conv_onet.py:293-322
load_pretrain; conv_onet_pointslam.py:228-246). These converters load them
with torch (CPU) and remap ``pts_linears/fc_c/output_linear/embedder._B``
weights into the layout used by models.conv_onet.mlp_decoder_apply
(torch Linear stores [out, in]; we store [in, out]).

Note the historical naming quirk the reference also handles: inside
middle_fine.pt the *middle* decoder is named ``coarse`` and the *fine*
decoder ``fine`` (original NICE-SLAM naming, conv_onet.py:305-318).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _convert_mlp(state: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference MLP decoder state-dict into our param layout."""
    out: Dict[str, Any] = {}
    pts_w, pts_b, fc_w, fc_b = {}, {}, {}, {}
    for k, v in state.items():
        arr = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v, np.float32)
        m = re.search(r"pts_linears\.(\d+)\.(weight|bias)$", k)
        if m:
            i = int(m.group(1))
            if m.group(2) == "weight":
                pts_w[i] = arr.T
            else:
                pts_b[i] = arr
            continue
        m = re.search(r"fc_c\.(\d+)\.(weight|bias)$", k)
        if m:
            i = int(m.group(1))
            if m.group(2) == "weight":
                fc_w[i] = arr.T
            else:
                fc_b[i] = arr
            continue
        if k.endswith("output_linear.weight"):
            out["out_w"] = arr.T
        elif k.endswith("output_linear.bias"):
            out["out_b"] = arr
        elif k.endswith("embedder._B"):
            out["B"] = arr
    n = len(pts_w)
    out["pts_w"] = [pts_w[i] for i in range(n)]
    out["pts_b"] = [pts_b[i] for i in range(n)]
    if fc_w:
        out["fc_w"] = [fc_w[i] for i in range(len(fc_w))]
        out["fc_b"] = [fc_b[i] for i in range(len(fc_b))]
    return out


def load_nice_decoders(middle_fine_path: str, coarse_path: Optional[str] = None) -> Dict[str, Any]:
    """Returns {'middle': ..., 'fine': ..., ('coarse': ...)} param trees."""
    ck = _torch_load(middle_fine_path)
    model = ck["model"] if "model" in ck else ck
    middle_state, fine_state = {}, {}
    for k, v in model.items():
        if "decoder" not in k or "encoder" in k:
            continue
        if "coarse" in k:  # middle decoder under its original name
            middle_state[k] = v
        elif "fine" in k:
            fine_state[k] = v
    out = {"middle": _convert_mlp(middle_state), "fine": _convert_mlp(fine_state)}
    if coarse_path:
        ck2 = _torch_load(coarse_path)
        model2 = ck2["model"] if "model" in ck2 else ck2
        coarse_state = {k: v for k, v in model2.items() if "decoder" in k and "encoder" not in k}
        out["coarse"] = _convert_mlp(coarse_state)
    return out


def load_dpvo_weights(path: str) -> Dict[str, Any]:
    """Convert a pretrained DPVO checkpoint (dpvo.pth) to the VONet param
    tree (models/vonet.py). Mirrors the reference loader (slam/models/
    vo_net_model.py:39-50: strips ``module.`` prefixes and drops
    ``update.lmbda``).

    Mapping (torch name -> tree path):
      patchify.fnet.*  -> fnet.*    (convs stay OIHW; no transpose)
      patchify.inet.*  -> inet.*
      update.c1.{0,2}  -> update.c1[0,1]   (nn.Sequential indices)
      update.gru.{0..3} -> update.gru.{ln1,gr1,ln2,gr2}
      update.corr.{0,2,3,5} -> update.corr[0,1,2(LN),3]
      update.agg_kk/agg_ij .f/.g/.h -> SoftAgg linears
      update.d.1 / update.w.1 -> heads (GradientClip/Sigmoid have no params)

    Caveat: the 882-dim correlation feature order here is
    stack([corr_lvl1, corr_lvl2], -1).reshape(E, -1) with corr of shape
    [E, P, P, 7, 7]; if the reference CUDA kernel flattens in a different
    order, the first corr linear's input columns need the matching
    permutation. Verify against a torch forward before trusting converted
    weights.
    """
    state = _torch_load(path)
    state = {k.replace("module.", ""): v for k, v in state.items()
             if "update.lmbda" not in k}

    def arr(name):
        return jnp.asarray(np.asarray(state[name].detach().cpu().numpy(),
                                      np.float32))

    def conv(prefix):
        return {"w": arr(prefix + ".weight"), "b": arr(prefix + ".bias")}

    def linear(prefix):
        return {"w": arr(prefix + ".weight"), "b": arr(prefix + ".bias")}

    def ln(prefix):
        return {"w": arr(prefix + ".weight"), "b": arr(prefix + ".bias")}

    def resblock(prefix, has_down):
        p = {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2")}
        if has_down:
            p["down"] = conv(prefix + ".downsample.0")
        return p

    def encoder(prefix):
        return {
            "conv1": conv(prefix + ".conv1"),
            "layer1": [resblock(prefix + ".layer1.0", False),
                       resblock(prefix + ".layer1.1", False)],
            "layer2": [resblock(prefix + ".layer2.0", True),
                       resblock(prefix + ".layer2.1", False)],
            "conv2": conv(prefix + ".conv2"),
        }

    def softagg(prefix):
        return {"f": linear(prefix + ".f"), "g": linear(prefix + ".g"),
                "h": linear(prefix + ".h")}

    up = "update"
    return {
        "fnet": encoder("patchify.fnet"),
        "inet": encoder("patchify.inet"),
        "update": {
            "c1": [linear(f"{up}.c1.0"), linear(f"{up}.c1.2")],
            "c2": [linear(f"{up}.c2.0"), linear(f"{up}.c2.2")],
            "norm": ln(f"{up}.norm"),
            "agg_kk": softagg(f"{up}.agg_kk"),
            "agg_ij": softagg(f"{up}.agg_ij"),
            "gru": {
                "ln1": ln(f"{up}.gru.0"),
                "gr1": {"gate": linear(f"{up}.gru.1.gate.0"),
                        "res1": linear(f"{up}.gru.1.res.0"),
                        "res2": linear(f"{up}.gru.1.res.2")},
                "ln2": ln(f"{up}.gru.2"),
                "gr2": {"gate": linear(f"{up}.gru.3.gate.0"),
                        "res1": linear(f"{up}.gru.3.res.0"),
                        "res2": linear(f"{up}.gru.3.res.2")},
            },
            "corr": [linear(f"{up}.corr.0"), linear(f"{up}.corr.2"),
                     ln(f"{up}.corr.3"), linear(f"{up}.corr.5")],
            "d": linear(f"{up}.d.1"),
            "w": linear(f"{up}.w.1"),
        },
    }
