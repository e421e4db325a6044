"""torch checkpoint -> flax variables conversion.

The reference distributes pretrained weights as torch state dicts wrapped in
``{"model_state_dict": ...}`` with optional ``module.`` prefixes
(rmvd/models/helpers.py:132-154). This module converts such checkpoints to
the flax parameter tree of :class:`RobustMVDModule`:

torch name                              -> flax path
encoder.conv1.0.{weight,bias}           -> encoder/conv1/conv/{kernel,bias}
context_encoder.conv_redir.0.*          -> context_encoder/conv_redir/conv/*
fusion_block.corr_to_view_weight.0.*    -> fusion_block/corr_to_view_weight/conv0/*
fusion_block.corr_to_view_weight.2.*    -> fusion_block/corr_to_view_weight/conv1/*
fusion_enc_block.convX[_Y].0.*          -> fusion_enc_block/convX[_Y]/conv/*
decoder.{pred,deconv,rfeat}*.0.*        -> decoder/.../conv/*

Conv weights (O, I, kh, kw) transpose to (kh, kw, I, O); ConvTranspose
weights (I, O, kh, kw) transpose to (kh, kw, O, I) (flax
``transpose_kernel=True`` convention, validated against torch in
tests/test_torch_parity.py).
"""

from __future__ import annotations

import numpy as np


def convert_torch_checkpoint(path):
    """Load a reference ``.pt`` checkpoint and return flax variables."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in state:
        state = state["model_state_dict"]
    state = {k.replace("module.", ""): v for k, v in state.items()}
    return convert_torch_state_dict({k: v.numpy() for k, v in state.items()})


def convert_torch_state_dict(state: dict) -> dict:
    """Convert a {torch_name: np.ndarray} dict to flax variables."""
    params: dict = {}

    seq_renames = {
        "corr_to_view_weight.0": "corr_to_view_weight_conv0",
        "corr_to_view_weight.2": "corr_to_view_weight_conv1",
    }

    for name, w in state.items():
        if name.endswith("num_batches_tracked"):
            continue
        for old, new in seq_renames.items():
            if old in name:
                name = name.replace(old, new)
        parts = name.split(".")
        leaf = parts[-1]
        # torch Sequential index ("0") -> the flax submodule is named "conv"
        parts = ["conv" if p.isdigit() else p for p in parts[:-1]]

        is_deconv = any(p.startswith("deconv") for p in parts)
        if leaf == "weight":
            if w.ndim == 4:
                if is_deconv:
                    # ConvTranspose2d (I,O,kh,kw) -> spatially-flipped HWIO
                    # (kh,kw,I,O) for the dilated-correlation formulation.
                    w = w.transpose(2, 3, 0, 1)[::-1, ::-1]
                else:
                    w = w.transpose(2, 3, 1, 0)  # (O,I,kh,kw) -> (kh,kw,I,O)
                leaf = "kernel"
            elif w.ndim == 5:
                # Conv3d (O,I,kd,kh,kw) -> (kd,kh,kw,I,O)
                w = w.transpose(2, 3, 4, 1, 0)
                leaf = "kernel"
            else:
                leaf = "scale"  # norm weight
        elif leaf in ("running_mean",):
            leaf = "mean"
        elif leaf in ("running_var",):
            leaf = "var"

        node = params
        for p in parts:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(w)

    return {"params": params}


def convert_vis_mvsnet_torch_state_dict(state: dict) -> dict:
    """Convert a reference VisMvsnet state_dict to this framework's tree.

    Handles the UNet registry naming (rmvd/models/blocks/
    vis_mvsnet_unet_modular.py builds "enc_blocks.<tag>_<i>" /
    "dec_blocks.<tag>_<i>.{0: deconv, 1: post-conv, 2: residual blocks}")
    -> the flax module names (blocks/vis_mvsnet.py: "enc_<i>.block<j>",
    "dec_<i>_{deconv,post,res}"), splits BatchNorm statistics into the
    ``batch_stats`` collection, and converts ConvTranspose2d/3d weights
    (I, O, k...) to the spatially-flipped HWIO/DHWIO layout of the
    dilated-correlation formulation (TorchDeconv).
    """
    import re

    def rename(name):
        name = re.sub(
            r"unet\.enc_blocks\.[^.]*_(\d+)\.(\d+)\.", r"unet.enc_\1.block\2.", name
        )
        name = re.sub(
            r"unet\.dec_blocks\.[^.]*_(\d+)\.0\.", r"unet.dec_\1_deconv.", name
        )
        name = re.sub(
            r"unet\.dec_blocks\.[^.]*_(\d+)\.1\.", r"unet.dec_\1_post.", name
        )
        name = re.sub(
            r"unet\.dec_blocks\.[^.]*_(\d+)\.2\.(\d+)\.",
            r"unet.dec_\1_res.block\2.",
            name,
        )
        name = name.replace("downsample.0.", "downsample_conv.")
        name = name.replace("downsample.1.", "downsample_bn.")
        name = name.replace("init_conv.0.", "init_conv.")
        name = name.replace("init_conv.1.", "init_bn.")
        name = re.sub(r"uncert_net\.conv(\d)\.0\.", r"uncert_net.conv\1_conv.", name)
        name = re.sub(r"uncert_net\.conv(\d)\.1\.", r"uncert_net.conv\1_bn.", name)
        name = re.sub(r"uncert_net\.head_convs\.(\d+)\.", r"uncert_net.head_\1.", name)
        return name

    params: dict = {}
    batch_stats: dict = {}

    for name, w in state.items():
        if name.endswith("num_batches_tracked"):
            continue
        name = rename(name)
        parts = name.split(".")
        leaf = parts[-1]
        parts = parts[:-1]
        is_deconv = any("deconv" in p for p in parts)

        coll = params
        if leaf == "weight":
            if w.ndim == 4:
                if is_deconv:
                    w = w.transpose(2, 3, 0, 1)[::-1, ::-1]
                else:
                    w = w.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif w.ndim == 5:
                if is_deconv:
                    # ConvTranspose3d (I,O,kd,kh,kw) -> flipped DHWIO
                    w = w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]
                else:
                    # Conv3d (O,I,kd,kh,kw) -> DHWIO
                    w = w.transpose(2, 3, 4, 1, 0)
                leaf = "kernel"
            else:
                leaf = "scale"
        elif leaf == "running_mean":
            leaf, coll = "mean", batch_stats
        elif leaf == "running_var":
            leaf, coll = "var", batch_stats

        node = coll
        for p in parts:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(w)

    return {"params": params, "batch_stats": batch_stats}
