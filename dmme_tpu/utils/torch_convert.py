"""Torch → flax weight conversion for the reference UNets.

Shared by the parity tests (tests/test_torch_parity.py — exact forward/
gradient equality with copied weights) and the user-facing checkpoint
migration tool (scripts/convert_torch_ckpt.py): users of the reference
framework can bring their trained Lightning checkpoints across.

Conventions handled (reference src/dmme/models/{ddpm,iddpm}.py):

* conv kernels OIHW → HWIO; linear (O,I) → (I,O)
* GroupNorm weight/bias → scale/bias
* the IDDPM MultiHeadAttention's fused-qkv channel order: reference packs
  (head, 3·c′) while this framework packs (3, head, c′) — the projection's
  output channels are permuted accordingly
* layer naming: down_i / middle_i / up_i + input_conv / output_conv /
  time_embed, mirrored 1:1 by dmme_tpu.models.unet.build_topology

torch is imported lazily — the module is importable without it.
"""

from __future__ import annotations

import importlib.util
from typing import Any

import jax.numpy as jnp

REFERENCE_MODELS = "/root/reference/src/dmme/models"


def load_reference_model_module(name: str, base: str = REFERENCE_MODELS):
    """Load a reference model file (ddpm.py / iddpm.py) under a synthetic
    package so iddpm's relative import of ddpm resolves — without importing
    the reference package __init__ (which needs pytorch_lightning)."""
    import sys
    import types

    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [base]
        sys.modules["refmodels"] = pkg
    full = f"refmodels.{name}"
    if full in sys.modules:
        return sys.modules[full]
    if name == "iddpm":
        load_reference_model_module("ddpm", base)
    spec = importlib.util.spec_from_file_location(full, f"{base}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def conv_w(w) -> jnp.ndarray:  # OIHW -> HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def lin_w(w) -> jnp.ndarray:  # (O, I) -> (I, O)
    return jnp.asarray(w.detach().numpy().T)


def arr(t) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy())


def copy_conv(dst, conv) -> None:
    dst["kernel"] = conv_w(conv.weight)
    if conv.bias is not None:
        dst["bias"] = arr(conv.bias)


def copy_gn(dst, gn) -> None:
    dst["scale"] = arr(gn.weight)
    dst["bias"] = arr(gn.bias)


def copy_attention(dst, attn, heads: int) -> None:
    copy_gn(dst["GroupNorm_0"], attn.norm)
    if heads == 1:
        copy_conv(dst["qkv_proj"], attn.qkv_proj)
    else:
        # reference MHA splits channels (head, 3c'); ours (3, head, c').
        # permute output channels of the qkv projection accordingly.
        w = attn.qkv_proj.weight.detach().numpy()  # (3D, I, 1, 1)
        b = attn.qkv_proj.bias.detach().numpy()
        three_d = w.shape[0]
        d = three_d // 3
        cp = d // heads  # per-head dim
        perm = [
            h * (3 * cp) + part * cp + j
            for part in range(3)
            for h in range(heads)
            for j in range(cp)
        ]
        wp = w[perm]
        dst["qkv_proj"]["kernel"] = jnp.asarray(wp.transpose(2, 3, 1, 0))
        dst["qkv_proj"]["bias"] = jnp.asarray(b[perm])
    copy_conv(dst["proj"], attn.proj)


def copy_resblock(dst, rb, film: bool, heads: int) -> None:
    import torch

    # conv1 = Sequential(norm, act, conv)
    copy_gn(dst["norm1"], rb.conv1[0])
    copy_conv(dst["conv1"], rb.conv1[2])
    dst["condition"]["kernel"] = lin_w(rb.condition[0].weight)
    dst["condition"]["bias"] = arr(rb.condition[0].bias)
    if film:
        copy_gn(dst["norm2"], rb.norm)
        conv2 = rb.conv2[-1]  # Sequential(act[, drop], conv)
    else:
        copy_gn(dst["norm2"], rb.conv2[0])
        conv2 = rb.conv2[-1]
    copy_conv(dst["conv2"], conv2)
    if not isinstance(rb.residual, torch.nn.Identity):
        copy_conv(dst["residual"], rb.residual)
    if not isinstance(rb.attention, torch.nn.Identity):
        copy_attention(dst["attention"], rb.attention, heads)


def copy_unet(params: Any, net, film: bool, heads: int) -> Any:
    """Copy a live reference-torch UNet's weights into flax ``params``
    (the dict returned by ``UNet.init``); mutates and returns it."""
    import torch

    p = params["params"]
    p["time_embed"]["Dense_0"]["kernel"] = lin_w(net.condition[1].weight)
    p["time_embed"]["Dense_0"]["bias"] = arr(net.condition[1].bias)
    p["time_embed"]["Dense_1"]["kernel"] = lin_w(net.condition[3].weight)
    p["time_embed"]["Dense_1"]["bias"] = arr(net.condition[3].bias)
    copy_conv(p["input_conv"], net.input_conv)

    for i, layer in enumerate(net.down_layers):
        if isinstance(layer, torch.nn.Conv2d):  # DownSample
            copy_conv(p[f"down_{i}"]["Conv_0"], layer)
        else:
            copy_resblock(p[f"down_{i}"], layer, film, heads)
    for i, layer in enumerate(net.middle_layers):
        copy_resblock(p[f"middle_{i}"], layer, film, heads)
    for i, layer in enumerate(net.up_layers):
        if layer.__class__.__name__ == "UpSample":
            copy_conv(p[f"up_{i}"]["Conv_0"], layer.conv)
        else:
            copy_resblock(p[f"up_{i}"], layer, film, heads)

    copy_gn(p["out_norm"], net.output_conv[0])
    copy_conv(p["output_conv"], net.output_conv[2])
    return params


def strip_state_dict_prefix(state_dict: dict) -> dict:
    """Peel Lightning wrapper prefixes off a reference checkpoint's
    state_dict. The real reference nesting is
    ``LitDDPM.diffusion_model = DDPM`` and ``DDPM.model = UNet``
    (/root/reference/src/dmme/lit_modules/ddpm.py:51-56,
    /root/reference/src/dmme/diffusion_models/ddpm.py:41), so a genuine
    Lightning ``.ckpt`` carries UNet keys as
    ``diffusion_model.model.input_conv.weight``. Also accepted:
    ``model.model.…`` (a Lit wrapper whose attribute is named ``model``),
    ``model.…`` (a bare DDPM state_dict), and unprefixed (a bare UNet).
    Detected by the UNet's ``input_conv.weight`` anchor key."""
    for prefix in ("diffusion_model.model.", "model.model.", "model.", ""):
        if any(k == prefix + "input_conv.weight" for k in state_dict):
            out = {
                k[len(prefix):]: v
                for k, v in state_dict.items()
                if k.startswith(prefix)
            }
            # schedule buffers (beta/alpha/alpha_bar/tau) are non-persistent
            # in the reference but may appear in hand-saved dicts; the UNet
            # load ignores them only if we drop them here
            return {
                k: v
                for k, v in out.items()
                if not k.startswith(("beta", "alpha", "alpha_bar", "tau"))
            }
    raise ValueError(
        "could not locate UNet weights in state_dict (no "
        "*input_conv.weight key; tried prefixes model.model./model./none)"
    )
