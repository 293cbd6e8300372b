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
