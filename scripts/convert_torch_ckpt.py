"""Migrate a reference (torch/Lightning) checkpoint into a dmme-tpu run dir.

Usage:
    python scripts/convert_torch_ckpt.py \
        --ckpt last.ckpt [--ema-ckpt last-EMA.ckpt] \
        --config configs/ddpm/cifar10.yaml \
        --out runs/ddpm_cifar10_migrated [--arch ddpm|iddpm]

Reads the torch checkpoint (a Lightning .ckpt with a ``state_dict``, or a
bare state_dict .pt), rebuilds the reference UNet module from
/root/reference source, loads the weights strictly, copies them into this
framework's flax UNet via the SAME conversion code the parity tests prove
exact (dmme_tpu.utils.torch_convert), and writes an Orbax checkpoint that
``dmme_tpu.trainer sample/test/fit --resume`` consumes directly.

The UNet architecture is taken from the dmme-tpu config's
model.init_args.model (or the framework defaults for --arch). EMA weights:
the reference stores them in the optimizer state of the main .ckpt
(callbacks/ema.py:339-372) or in a ``-EMA`` sidecar; pass --ema-ckpt to
use the sidecar, else EMA is initialized to the converted raw weights.
"""


from __future__ import annotations
if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import sys


def load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"], int(obj.get("global_step", 0))
    return obj, 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt / .pt")
    ap.add_argument("--ema-ckpt", default=None, help="-EMA sidecar checkpoint")
    ap.add_argument("--config", required=True, help="dmme-tpu config to match")
    ap.add_argument("--out", required=True, help="output run dir (Orbax)")
    ap.add_argument("--arch", default="ddpm", choices=["ddpm", "iddpm"])
    ap.add_argument("--img-size", type=int, default=32)
    args = ap.parse_args(argv)

    import jax

    from dmme_tpu.config import instantiate, load_config
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.torch_convert import (
        copy_unet,
        load_reference_model_module,
        strip_state_dict_prefix,
    )

    config = load_config(args.config)
    lit = instantiate(config["model"])
    film = bool(getattr(lit.model, "film", False))
    heads = int(getattr(lit.model, "num_heads", 1))

    # rebuild the reference torch UNet at the matching architecture
    ref_mod = load_reference_model_module(args.arch)
    net = ref_mod.UNet(
        in_channels=lit.model.in_channels,
        pos_dim=lit.model.pos_dim,
        emb_dim=lit.model.emb_dim,
        num_groups=lit.model.num_groups,
        dropout=lit.model.dropout,
        channels_per_depth=tuple(lit.model.channels_per_depth),
        num_blocks=lit.model.num_blocks,
        attention_depths=tuple(lit.model.attention_depths),
    )

    def converted_params(path):
        sd, gstep = load_torch_state_dict(path)
        missing = net.load_state_dict(strip_state_dict_prefix(sd), strict=True)
        del missing
        params = jax.jit(lit.model.init)(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, args.img_size, args.img_size, lit.model.in_channels)),
            jax.numpy.zeros((1,), jax.numpy.int32),
        )
        return copy_unet(params, net, film, heads), gstep

    params, gstep = converted_params(args.ckpt)
    if args.ema_ckpt:
        ema_params, _ = converted_params(args.ema_ckpt)
    else:
        ema_params = jax.tree.map(jax.numpy.copy, params)
        print("# no --ema-ckpt given: EMA initialized from raw weights",
              file=sys.stderr)

    state = lit.init_state(jax.random.PRNGKey(0), img_size=args.img_size)
    state = state.replace(
        step=jax.numpy.asarray(gstep, jax.numpy.int32),
        params=params,
        ema_params=ema_params,
    )
    mgr = CheckpointManager(args.out)
    mgr.save(gstep, state, force=True)
    mgr.wait()
    print(f"{args.out}: step {gstep} ({args.arch}, film={film}, heads={heads})")


if __name__ == "__main__":
    import os

    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
