"""One-time InceptionV3 weight conversion: torch state_dict → flax .npz.

Usage (on any box with the weights file; no TPU needed):

    python scripts/convert_inception.py pt_inception-2015-12-05-6726825d.pth \
        --out inception_fid.npz

Accepts either pytorch-fid's FID-standard weights
(``pt_inception-2015-12-05-6726825d.pth`` — the network behind every
published FID number and the reference's torchmetrics metric) or
torchvision's ``inception_v3_google-0cc3c7bd.pth``; the variant is
auto-detected from the fc shape. BatchNorm is folded into the convs during
conversion, so the .npz is inference-ready. Point evaluation at it:

    dmme_tpu.trainer test --config cfg.yaml --trainer.inception_weights inception_fid.npz
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import os
import sys

# CPU-only: conversion must never touch the (single-holder) TPU tunnel.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from dmme_tpu.eval import inception  # noqa: E402


def verify_filename_hash(path: str, check: bool = True) -> str:
    """torch.hub convention: ``<name>-<8hex>.pth`` embeds the first 8 hex
    chars of the file's sha256 (the integrity check torch itself applies on
    download: pt_inception-2015-12-05-6726825d.pth, inception_v3_google-
    0cc3c7bd.pth). Verify it when present (``check=False`` skips the
    comparison for renamed/date-stamped local files whose suffix merely
    looks hex-like); always return the full digest so the operator can
    pin it."""
    import hashlib
    import re

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    digest = h.hexdigest()
    m = re.search(r"-([0-9a-f]{8})\.pth?$", os.path.basename(path))
    if check and m and not digest.startswith(m.group(1)):
        raise SystemExit(
            f"sha256 mismatch: file digest {digest[:8]}… does not match the "
            f"hash embedded in the filename ({m.group(1)}) — corrupt or "
            "wrong download (--skip-hash-check for renamed local files)"
        )
    return digest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("weights", help="torch state_dict file (.pth/.pt)")
    p.add_argument("--out", default=None, help="output .npz (default: <weights>.npz)")
    p.add_argument(
        "--skip-hash-check", action="store_true",
        help="don't treat a trailing -<8hex> filename suffix as an embedded "
        "sha256 prefix (for renamed/date-stamped local files)",
    )
    args = p.parse_args(argv)

    digest = verify_filename_hash(args.weights, check=not args.skip_hash_check)
    print(f"sha256 {digest}  {os.path.basename(args.weights)}", file=sys.stderr)

    variant, n_cls = inception.detect_variant(args.weights)
    print(f"detected variant={variant} num_classes={n_cls}", file=sys.stderr)

    model = inception.InceptionV3(variant=variant, num_classes=n_cls)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32)
    )
    params = inception.load_torch_weights(params, args.weights)

    out = args.out or os.path.splitext(args.weights)[0] + ".npz"
    inception.save_npz(params, out)
    print(out)


if __name__ == "__main__":
    main()
