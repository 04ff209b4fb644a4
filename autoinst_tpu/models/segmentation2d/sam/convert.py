"""Released SAM checkpoint (sam_vit_h/l/b .pth, the original
`segment_anything` state-dict layout the reference loads via
`sam_model_registry["default"](checkpoint=...)`,
2D-VFMs/SAM/adapter.py:31) -> Flax params for sam.model.Sam.

Layout facts (oracle-verified against a hand-rolled torch twin of the
published modules in tests/test_sam.py):

  torch Linear weight [out, in]        -> kernel [in, out] (transpose)
  torch Conv2d weight [out, in, kh, kw] -> kernel [kh, kw, in, out]
  torch ConvTranspose2d [in, out, kh, kw] -> kernel [kh, kw, in, out]
    SPATIALLY FLIPPED: flax ConvTranspose (lax.conv_transpose,
    transpose_kernel=False) convolves the zero-dilated input with the
    un-mirrored kernel, while torch's ConvTranspose2d scatters the
    kernel as stored; verified numerically in tests/test_sam.py
  nn.Embedding weights keep their [num, dim] shape.
"""

from __future__ import annotations

import numpy as np


def _lin(state, key):
    return {"kernel": np.ascontiguousarray(state[f"{key}.weight"].T),
            "bias": np.asarray(state[f"{key}.bias"])}


def _ln(state, key):
    return {"scale": np.asarray(state[f"{key}.weight"]),
            "bias": np.asarray(state[f"{key}.bias"])}


def _conv(state, key, bias=True):
    out = {"kernel": np.ascontiguousarray(
        np.transpose(state[f"{key}.weight"], (2, 3, 1, 0)))}
    if bias:
        out["bias"] = np.asarray(state[f"{key}.bias"])
    return out


def _convT(state, key):
    kernel = np.transpose(state[f"{key}.weight"], (2, 3, 0, 1))
    return {"kernel": np.ascontiguousarray(kernel[::-1, ::-1]),
            "bias": np.asarray(state[f"{key}.bias"])}


def _attn(state, key):
    return {name: _lin(state, f"{key}.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def convert_sam_state_dict(state: dict, template: dict) -> dict:
    """state: torch state dict (tensors or ndarrays) in the original Meta
    layout. template: `Sam(cfg).init(...)` variables (structure + shape
    check). Returns {"params": ...}."""
    state = {k: np.asarray(v) for k, v in state.items()}
    p = {"encoder": {}, "prompt": {}, "decoder": {}}

    # ---- image encoder
    enc = p["encoder"]
    enc["patch_embed"] = _conv(state, "image_encoder.patch_embed.proj")
    enc["pos_embed"] = state["image_encoder.pos_embed"]
    i = 0
    while f"image_encoder.blocks.{i}.norm1.weight" in state:
        b = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(state, f"{b}.norm1"),
            "norm2": _ln(state, f"{b}.norm2"),
            "attn": {
                "qkv": _lin(state, f"{b}.attn.qkv"),
                "proj": _lin(state, f"{b}.attn.proj"),
                "rel_pos_h": state[f"{b}.attn.rel_pos_h"],
                "rel_pos_w": state[f"{b}.attn.rel_pos_w"],
            },
            "mlp_lin1": _lin(state, f"{b}.mlp.lin1"),
            "mlp_lin2": _lin(state, f"{b}.mlp.lin2"),
        }
        i += 1
    enc["neck_conv1"] = _conv(state, "image_encoder.neck.0", bias=False)
    enc["neck_ln1"] = _ln(state, "image_encoder.neck.1")
    enc["neck_conv2"] = _conv(state, "image_encoder.neck.2", bias=False)
    enc["neck_ln2"] = _ln(state, "image_encoder.neck.3")

    # ---- prompt encoder
    pr = p["prompt"]
    pr["pe_gaussian"] = state[
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    pr["point_embed"] = np.concatenate(
        [state[f"prompt_encoder.point_embeddings.{j}.weight"]
         for j in range(4)], axis=0)
    pr["not_a_point"] = state["prompt_encoder.not_a_point_embed.weight"][0]
    pr["no_mask"] = state["prompt_encoder.no_mask_embed.weight"][0]
    pr["mask_conv1"] = _conv(state, "prompt_encoder.mask_downscaling.0")
    pr["mask_ln1"] = _ln(state, "prompt_encoder.mask_downscaling.1")
    pr["mask_conv2"] = _conv(state, "prompt_encoder.mask_downscaling.3")
    pr["mask_ln2"] = _ln(state, "prompt_encoder.mask_downscaling.4")
    pr["mask_conv3"] = _conv(state, "prompt_encoder.mask_downscaling.6")

    # ---- mask decoder
    de = p["decoder"]
    de["iou_token"] = state["mask_decoder.iou_token.weight"]
    de["mask_tokens"] = state["mask_decoder.mask_tokens.weight"]
    i = 0
    while f"mask_decoder.transformer.layers.{i}.norm1.weight" in state:
        t = f"mask_decoder.transformer.layers.{i}"
        de[f"block{i}"] = {
            "self_attn": _attn(state, f"{t}.self_attn"),
            "cross_t2i": _attn(state, f"{t}.cross_attn_token_to_image"),
            "cross_i2t": _attn(state, f"{t}.cross_attn_image_to_token"),
            "norm1": _ln(state, f"{t}.norm1"),
            "norm2": _ln(state, f"{t}.norm2"),
            "norm3": _ln(state, f"{t}.norm3"),
            "norm4": _ln(state, f"{t}.norm4"),
            "mlp_lin1": _lin(state, f"{t}.mlp.lin1"),
            "mlp_lin2": _lin(state, f"{t}.mlp.lin2"),
        }
        i += 1
    de["final_attn"] = _attn(
        state, "mask_decoder.transformer.final_attn_token_to_image")
    de["norm_final"] = _ln(state, "mask_decoder.transformer.norm_final_attn")
    de["upscale_conv1"] = _convT(state, "mask_decoder.output_upscaling.0")
    de["upscale_ln"] = _ln(state, "mask_decoder.output_upscaling.1")
    de["upscale_conv2"] = _convT(state, "mask_decoder.output_upscaling.3")
    nm = state["mask_decoder.mask_tokens.weight"].shape[0]
    for j in range(nm):
        h = f"mask_decoder.output_hypernetworks_mlps.{j}"
        for layer in range(3):
            de[f"hyper{j}_lin{layer}"] = _lin(state,
                                              f"{h}.layers.{layer}")
    for layer in range(3):
        de[f"iou_lin{layer}"] = _lin(
            state, f"mask_decoder.iou_prediction_head.layers.{layer}")

    _check_tree(template["params"], p, "params")
    return {"params": p}


def _check_tree(template, built, path):
    t_keys = set(template)
    b_keys = set(built)
    if t_keys != b_keys:
        raise ValueError(f"{path}: keys differ; missing={t_keys - b_keys} "
                         f"extra={b_keys - t_keys}")
    for k in t_keys:
        t, b = template[k], built[k]
        if isinstance(t, dict):
            _check_tree(t, b, f"{path}.{k}")
        elif tuple(np.shape(t)) != tuple(np.shape(b)):
            raise ValueError(
                f"{path}.{k}: shape {np.shape(b)} != {np.shape(t)}")


def load_torch_checkpoint(path: str, template: dict) -> dict:
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_sam_state_dict(
        {k: v.numpy() for k, v in state.items()}, template)
